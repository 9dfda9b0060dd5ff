"""Cuckoo-filter URL-seen shard — the deletable alternative to the
bloom shard (north_rule: "sharded bloom/cuckoo URL-seen filter").

Standard (2,4)-cuckoo filter: 16-bit fingerprints, buckets of 4 slots,
two candidate buckets via partial-key cuckoo hashing
(i2 = i1 XOR hash(fingerprint)).  Unlike the bloom shard it supports
``delete`` (e.g. retracting a URL after a permanent fetch failure so a
corrected URL variant can be recrawled) at ~same space and FPR
(~2^-14 per probe at 4 slots).

Determinism: eviction victims are chosen by a stable hash of
(fingerprint, attempt) — no RNG state, so retries and replays
reproduce identical filter contents.  Drop-in for ``BloomShard``
behind ``ShardedSeenFilter`` (same probe/set_seen/snapshot/restore
surface) — select with ``CrawlConfig(seen_filter="cuckoo")``.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np
import ray

DEFAULT_NUM_BUCKETS = 1 << 18  # x4 slots ≈ 1M capacity/shard
SLOTS = 4
MAX_KICKS = 500


def _hash64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


class CuckooShard:
    def __init__(self, num_buckets: int = DEFAULT_NUM_BUCKETS):
        assert num_buckets & (num_buckets - 1) == 0, "power of two"
        self.num_buckets = num_buckets
        self.table = np.zeros((num_buckets, SLOTS), dtype=np.uint16)
        self.count = 0
        self.overflow: set = set()  # full-table fallback, never lossy

    def _fingerprint_and_index(self, url: str):
        h = _hash64(url.encode("utf-8"))
        fp = (h & 0xFFFF) or 1  # 0 marks an empty slot
        i1 = (h >> 16) % self.num_buckets
        return np.uint16(fp), i1

    def _alt_index(self, i: int, fp: int) -> int:
        return (i ^ _hash64(bytes(int(fp).to_bytes(2, "big")))) % self.num_buckets

    def _bucket_has(self, i: int, fp: np.uint16) -> bool:
        return bool((self.table[i] == fp).any())

    def _bucket_insert(self, i: int, fp: np.uint16) -> bool:
        empties = np.nonzero(self.table[i] == 0)[0]
        if empties.size:
            self.table[i, empties[0]] = fp
            return True
        return False

    def contains(self, url: str) -> bool:
        fp, i1 = self._fingerprint_and_index(url)
        if self._bucket_has(i1, fp) or self._bucket_has(self._alt_index(i1, fp), fp):
            return True
        return url in self.overflow

    def insert(self, url: str) -> None:
        fp, i1 = self._fingerprint_and_index(url)
        i2 = self._alt_index(i1, fp)
        if self._bucket_has(i1, fp) or self._bucket_has(i2, fp):
            return  # idempotent
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.count += 1
            return
        # deterministic eviction chain; record each swap so a failed
        # chain can be unwound (otherwise the final displaced victim —
        # a fingerprint of some PREVIOUSLY inserted url — would be
        # silently dropped, a false negative at saturation)
        i = i1
        cur = fp
        trail: List[tuple] = []  # (bucket, slot) of each swap, in order
        for attempt in range(MAX_KICKS):
            slot = _hash64(bytes(int(cur).to_bytes(2, "big")) + attempt.to_bytes(2, "big")) % SLOTS
            cur, self.table[i, slot] = self.table[i, slot], cur
            trail.append((i, slot))
            i = self._alt_index(i, cur)
            if self._bucket_insert(i, cur):
                self.count += 1
                return
        # chain exhausted: unwind every swap in reverse so all earlier
        # entries keep their table slots (and the new url's fp placed by
        # the first swap is removed — it must live in overflow ONLY,
        # else delete() could succeed twice and corrupt count), THEN
        # spill exactly the new url (no false negatives)
        for bi, bslot in reversed(trail):
            cur, self.table[bi, bslot] = self.table[bi, bslot], cur
        assert cur == fp
        self.overflow.add(url)
        self.count += 1

    def delete(self, url: str) -> bool:
        fp, i1 = self._fingerprint_and_index(url)
        for i in (i1, self._alt_index(i1, fp)):
            hits = np.nonzero(self.table[i] == fp)[0]
            if hits.size:
                self.table[i, hits[0]] = 0
                self.count -= 1
                return True
        if url in self.overflow:
            self.overflow.discard(url)
            self.count -= 1
            return True
        return False

    # --- ShardedSeenFilter surface ---------------------------------------

    def probe(self, urls: Sequence[str]) -> List[bool]:
        return [self.contains(u) for u in urls]

    def set_seen(self, urls: Sequence[str]) -> int:
        for u in urls:
            self.insert(u)
        return self.count

    def snapshot(self) -> Dict:
        return {
            "num_buckets": self.num_buckets,
            "count": self.count,
            "table": self.table.tobytes(),
            "overflow": sorted(self.overflow),
        }

    def restore(self, snap: Dict) -> None:
        assert snap["num_buckets"] == self.num_buckets
        self.table = (
            np.frombuffer(snap["table"], dtype=np.uint16)
            .reshape(self.num_buckets, SLOTS)
            .copy()
        )
        self.count = snap["count"]
        self.overflow = set(snap["overflow"])


CuckooShardActor = ray.remote(num_cpus=0)(CuckooShard)
