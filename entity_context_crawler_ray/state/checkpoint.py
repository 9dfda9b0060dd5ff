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
import pyarrow.parquet as pq


def _round_dir(ckpt_dir: str, round_id: int) -> str:
    return os.path.join(ckpt_dir, f"round={round_id}")


def save_checkpoint(
    ckpt_dir: str,
    round_id: int,
    frontier: pa.Table,
    bloom_snaps: List[Dict],
    politeness_snaps: List[Dict],
) -> None:
    d = _round_dir(ckpt_dir, round_id)
    os.makedirs(d, exist_ok=True)
    pq.write_table(frontier, os.path.join(d, "frontier.parquet"))
    with open(os.path.join(d, "bloom.pkl"), "wb") as fh:
        pickle.dump(bloom_snaps, fh)
    with open(os.path.join(d, "politeness.json"), "w") as fh:
        json.dump(politeness_snaps, fh)
    # manifest written LAST: its presence marks the round complete
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(
            {"round": round_id, "frontier_rows": frontier.num_rows}, fh
        )


def latest_round(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        if name.startswith("round="):
            r = int(name.split("=", 1)[1])
            if os.path.isfile(os.path.join(ckpt_dir, name, "manifest.json")):
                best = r if best is None else max(best, r)
    return best


def load_checkpoint(ckpt_dir: str, round_id: Optional[int] = None) -> Dict:
    if round_id is None:
        round_id = latest_round(ckpt_dir)
    assert round_id is not None, f"no complete checkpoint under {ckpt_dir}"
    d = _round_dir(ckpt_dir, round_id)
    frontier = pq.read_table(os.path.join(d, "frontier.parquet"))
    with open(os.path.join(d, "bloom.pkl"), "rb") as fh:
        bloom = pickle.load(fh)
    with open(os.path.join(d, "politeness.json")) as fh:
        politeness = json.load(fh)
    return {
        "round": round_id,
        "frontier": frontier,
        "bloom": bloom,
        "politeness": politeness,
    }
