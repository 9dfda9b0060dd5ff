"""Per-round crawl checkpoints: frontier snapshot + bloom shard bits +
politeness bucket state, manifest-last for atomic visibility
(the parquet+manifest stand-in for Lance versioned datasets — the
``lance`` package is not available in this environment, so the store
is versioned parquet directories with a JSON manifest written last;
swap ``write_frontier``/``read_frontier`` for ``lance.write_dataset``
when it is).

Resume contract (tested in tests/test_crawl.py): kill after round r,
``crawl(..., resume=True)`` restores round r's frontier + actor state
and produces the same final state as an uninterrupted run.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional

import pyarrow as pa

from .storage import get_store


def _round_dir(ckpt_dir: str, round_id: int) -> str:
    return os.path.join(ckpt_dir, f"round={round_id}")


def save_checkpoint(
    ckpt_dir: str,
    round_id: int,
    frontier: Optional[pa.Table],
    bloom_snaps: List[Dict],
    politeness_snaps: List[Dict],
    *,
    frontier_dir: Optional[str] = None,
    frontier_rows: Optional[int] = None,
    out_dir: Optional[str] = None,
) -> None:
    """``frontier`` is the small driver-resident table, OR None with
    ``frontier_dir`` pointing at the bucketed on-storage frontier (the
    10^10-URL regime: the checkpoint then records a REFERENCE — the
    frontier is already durable parquet, re-writing it here would be a
    second full copy per round).

    When ``out_dir`` is given, ``frontier_dir`` is stored RELATIVE to
    it, so a checkpoint survives the output tree being moved or
    mounted at a different path on resume."""
    assert (frontier is None) != (frontier_dir is None)
    if frontier_dir is not None and out_dir is not None:
        frontier_dir = os.path.relpath(frontier_dir, out_dir)
    d = _round_dir(ckpt_dir, round_id)
    os.makedirs(d, exist_ok=True)
    if frontier is not None:
        store = get_store()
        store.write_table(frontier, os.path.join(d, "frontier" + store.suffix))
        frontier_rows = frontier.num_rows
    with open(os.path.join(d, "bloom.pkl"), "wb") as fh:
        pickle.dump(bloom_snaps, fh)
    with open(os.path.join(d, "politeness.json"), "w") as fh:
        json.dump(politeness_snaps, fh)
    # manifest written LAST, via temp+rename so a kill mid-write can
    # never leave a truncated manifest that latest_round() would count
    # as a complete round (rename is atomic on POSIX)
    tmp = os.path.join(d, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "round": round_id,
                "frontier_rows": frontier_rows,
                "frontier_dir": frontier_dir,
            },
            fh,
        )
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, os.path.join(d, "manifest.json"))


def latest_round(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("round="):
            r = int(name.split("=", 1)[1])
            path = os.path.join(ckpt_dir, name, "manifest.json")
            if not os.path.isfile(path):
                continue
            try:  # a manifest that doesn't parse is not a complete round
                with open(path) as fh:
                    json.load(fh)
            except (json.JSONDecodeError, OSError):
                continue
            best = r if best is None else max(best, r)
    return best


def load_checkpoint(
    ckpt_dir: str,
    round_id: Optional[int] = None,
    out_dir: Optional[str] = None,
) -> Dict:
    """Load a checkpoint.  A relative ``frontier_dir`` in the manifest
    is resolved against ``out_dir``; a referenced frontier dir that no
    longer exists (e.g. an earlier round whose frontier was consumed
    and deleted by the crawl loop) fails loudly here instead of
    resuming into an empty frontier."""
    if round_id is None:
        round_id = latest_round(ckpt_dir)
    assert round_id is not None, f"no complete checkpoint under {ckpt_dir}"
    d = _round_dir(ckpt_dir, round_id)
    with open(os.path.join(d, "manifest.json")) as fh:
        manifest = json.load(fh)
    frontier = None
    fdir = manifest.get("frontier_dir")
    if fdir is not None:
        if not os.path.isabs(fdir):
            if out_dir is None:
                # resolving against the process CWD would silently pick
                # a wrong path for relocated outputs; demand the anchor
                raise ValueError(
                    f"checkpoint round={round_id} has a relative "
                    f"frontier_dir {fdir!r}; pass out_dir= so it can be "
                    f"resolved against the crawl output root"
                )
            fdir = os.path.join(out_dir, fdir)
        # a COMPLETED crawl's final checkpoint records frontier_rows=0
        # with a next-round dir that was never created (nothing was
        # deferred) — resume is then a no-op, not an error
        if not os.path.isdir(fdir) and manifest.get("frontier_rows"):
            raise FileNotFoundError(
                f"checkpoint round={round_id} references frontier dir "
                f"{fdir!r} which does not exist — the crawl loop deletes "
                f"consumed frontier dirs, so only the LATEST checkpoint's "
                f"frontier is resumable; resume from latest_round() or "
                f"re-crawl"
            )
        manifest["frontier_dir"] = fdir
    else:
        store = get_store()
        frontier = store.read_table(os.path.join(d, "frontier" + store.suffix))
    with open(os.path.join(d, "bloom.pkl"), "rb") as fh:
        bloom = pickle.load(fh)
    with open(os.path.join(d, "politeness.json")) as fh:
        politeness = json.load(fh)
    return {
        "round": round_id,
        "frontier": frontier,
        "frontier_dir": manifest.get("frontier_dir"),
        "frontier_rows": manifest.get("frontier_rows"),
        "bloom": bloom,
        "politeness": politeness,
    }
