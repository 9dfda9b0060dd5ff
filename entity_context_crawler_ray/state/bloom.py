"""Sharded bloom URL-seen filter (north_rule; no reference
counterpart — the reference's implicit seen-set is the pages PK,
dao/matches_db.py:42).

Shard ``hash(url) % num_shards`` holds a packed bitarray bloom filter
of the URLs it has seen.  Shards are deployed as Ray actors
(``BloomShardActor``); the pure-Python ``BloomShard`` class is shared
with the crawl-parity simulator and the unit tests.

Sizing: with m bits, k hashes and n inserted keys the FPR is
``(1 - e^(-kn/m))^k``; defaults (m = 2^22 bits/shard, k = 7) hold
~300k URLs/shard at < 1e-4 FPR.  At the 10^10-URL design point, scale
``num_shards`` with the cluster (shard count ∝ nodes) and ``num_bits``
to ~2^33 per shard (1 GiB) for the same FPR — the protocol below is
shard-count-agnostic because every client routes by the same stable
hash.

Idempotence: ``probe`` is read-only; ``set_seen`` is a pure
bit-OR, so re-applying a retried batch is a no-op — task retries
cannot double-mark or lose URLs (SURVEY.md §7.5(4)).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np
import ray

from ..functions.hashing import stable_hash64

DEFAULT_NUM_BITS = 1 << 22
DEFAULT_NUM_HASHES = 7


def _base_hashes(url: str) -> tuple[int, int]:
    d = hashlib.blake2b(url.encode("utf-8"), digest_size=16).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:], "big") | 1


class BloomShard:
    def __init__(self, num_bits: int = DEFAULT_NUM_BITS, num_hashes: int = DEFAULT_NUM_HASHES):
        self.num_bits = num_bits
        self.num_hashes = num_hashes
        self.bits = np.zeros(num_bits // 8, dtype=np.uint8)
        self.count = 0  # approximate insert count (for FPR monitoring)

    def _positions(self, urls: Sequence[str]) -> np.ndarray:
        """(n, k) bit positions via double hashing:
        position_i = (h1 + i*h2) mod m.  Hashing is per-url (blake2b),
        position arithmetic is one vectorized numpy expression."""
        n = len(urls)
        h1 = np.empty(n, dtype=np.uint64)
        h2 = np.empty(n, dtype=np.uint64)
        for j, url in enumerate(urls):
            a, b = _base_hashes(url)
            h1[j], h2[j] = a, b
        i = np.arange(self.num_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.num_bits)

    def probe(self, urls: Sequence[str]) -> List[bool]:
        """True = possibly seen; False = definitely new. Read-only."""
        if not urls:
            return []
        pos = self._positions(urls)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        hit = (self.bits[byte_idx] & masks) != 0
        return hit.all(axis=1).tolist()

    def set_seen(self, urls: Sequence[str]) -> int:
        """Mark URLs seen (idempotent bit-OR). Returns shard count."""
        if not urls:
            return self.count
        pos = self._positions(urls)
        byte_idx = (pos >> np.uint64(3)).astype(np.int64)
        masks = (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
        np.bitwise_or.at(self.bits, byte_idx.ravel(), masks.ravel())
        self.count += len(urls)
        return self.count

    # --- checkpoint -------------------------------------------------------

    def snapshot(self) -> Dict:
        return {
            "num_bits": self.num_bits,
            "num_hashes": self.num_hashes,
            "count": self.count,
            "bits": self.bits.tobytes(),
        }

    def restore(self, snap: Dict) -> None:
        assert snap["num_bits"] == self.num_bits and snap["num_hashes"] == self.num_hashes
        self.bits = np.frombuffer(snap["bits"], dtype=np.uint8).copy()
        self.count = snap["count"]


BloomShardActor = ray.remote(num_cpus=0)(BloomShard)


class ShardedSeenFilter:
    """Client over N bloom shard actors; routes by stable url hash.

    Batched fan-out: one actor call per touched shard per operation."""

    def __init__(self, handles: List):
        self.handles = handles
        self.n = len(handles)

    def _route(self, urls: Sequence[str]) -> Dict[int, List[int]]:
        by_shard: Dict[int, List[int]] = {}
        for i, url in enumerate(urls):
            by_shard.setdefault(stable_hash64("bloom-shard", url) % self.n, []).append(i)
        return by_shard

    def probe(self, urls: Sequence[str]) -> List[bool]:
        by_shard = self._route(urls)
        futs = {
            s: self.handles[s].probe.remote([urls[i] for i in idxs])
            for s, idxs in by_shard.items()
        }
        out = [False] * len(urls)
        for s, idxs in by_shard.items():
            for i, seen in zip(idxs, ray.get(futs[s])):
                out[i] = seen
        return out

    def set_seen(self, urls: Sequence[str]) -> None:
        by_shard = self._route(urls)
        ray.get(
            [
                self.handles[s].set_seen.remote([urls[i] for i in idxs])
                for s, idxs in by_shard.items()
            ]
        )

    def snapshot(self) -> List[Dict]:
        return ray.get([h.snapshot.remote() for h in self.handles])

    def restore(self, snaps: List[Dict]) -> None:
        ray.get(
            [h.restore.remote(s) for h, s in zip(self.handles, snaps)]
        )
