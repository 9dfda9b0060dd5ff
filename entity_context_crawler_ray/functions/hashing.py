"""Stable hashing utilities.

Everything here must be process-stable (no reliance on PYTHONHASHSEED)
because results cross task boundaries and seed deterministic sampling:
the reference threads ``--random-seed`` + PYTHONHASHSEED through a
serial loop (reference __main__.py:31-32,65-66;
cmd/build_contexts_db.py:188-212); the rebuild instead derives every
random decision from a stable per-key hash so results are independent
of partitioning and iteration order (SURVEY.md §4 determinism note).
"""

from __future__ import annotations

import hashlib
from typing import Iterable

import numpy as np

_MASK64 = (1 << 64) - 1


def stable_hash64(*parts: object) -> int:
    """64-bit stable hash of the '\\x1f'-joined string forms of parts."""
    key = "\x1f".join(str(p) for p in parts).encode("utf-8")
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


def stable_hash64_array(values: Iterable[str], salt: str = "") -> np.ndarray:
    """Vector of stable 64-bit hashes (uint64) for string values."""
    vals = values if hasattr(values, "__len__") else list(values)
    out = np.empty(len(vals), dtype=np.uint64)
    salt_b = salt.encode("utf-8") + b"\x1f"
    for i, v in enumerate(vals):
        h = hashlib.blake2b(salt_b + str(v).encode("utf-8"), digest_size=8)
        out[i] = int.from_bytes(h.digest(), "big")
    return out


def shard_of(key: str, num_shards: int, salt: str = "shard") -> int:
    return stable_hash64(salt, key) % num_shards


# --- MinHash --------------------------------------------------------------

# fixed odd multipliers derived from blake2b of the permutation index —
# deterministic across processes, no RNG state involved
def minhash_params(num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    a = np.array(
        [stable_hash64("minhash-a", i) | 1 for i in range(num_perm)], dtype=np.uint64
    )
    b = np.array(
        [stable_hash64("minhash-b", i) for i in range(num_perm)], dtype=np.uint64
    )
    return a, b


def minhash_signature(
    shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signature (uint64[num_perm]) from uint64 shingle hashes
    via the standard (a*x+b) mod 2^64 permutation family."""
    if shingle_hashes.size == 0:
        return np.full(a.shape, _MASK64, dtype=np.uint64)
    # broadcast: (num_perm, n_shingles)
    with np.errstate(over="ignore"):
        perms = (a[:, None] * shingle_hashes[None, :] + b[:, None])
    return perms.min(axis=1)
