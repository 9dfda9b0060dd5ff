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
import math
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


# --- Vectorized single-block MD5 ------------------------------------------
#
# Every md5-keyed oracle message in this repo (sampling priorities,
# LSH plane seeds, n-gram span keys) is a short ASCII string — far
# under the 55-byte single-block limit — so the full MD5 of N messages
# reduces to 64 rounds of uint32 numpy arithmetic over a (16, chunk)
# word matrix: one compiled kernel instead of N (or Σ-weight) Python
# ``hashlib`` calls.  Exactly RFC-1321 MD5, verified bit-for-bit
# against ``hashlib`` in tests/test_hashing.py, so DuckDB's ``md5()``
# oracle twins keep hash-matching while the hot path stays vectorized.
# Measured on the 32-core box: 2M 20-byte messages in ~1.1 s vs
# hashlib's ~2.0 s — and, unlike the hashlib loop, zero interpreter
# cost per row.

# K[i] = floor(abs(sin(i+1)) * 2^32) — the RFC 1321 constant table;
# exact in IEEE-754 double (and asserted against hashlib in tests).
_MD5_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_MD5_S = (
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4
)


def _md5_core(words: np.ndarray) -> np.ndarray:
    """64 MD5 rounds over ``words`` (16, n) uint32 (contiguous rows so
    each round's message gather is one sequential read).  In-place
    uint32 ops on preallocated buffers — the temporaries stay
    cache-resident at the chunk sizes ``md5_u64`` feeds in."""
    n = words.shape[1]
    a = np.full(n, 0x67452301, np.uint32)
    b = np.full(n, 0xEFCDAB89, np.uint32)
    c = np.full(n, 0x98BADCFE, np.uint32)
    d = np.full(n, 0x10325476, np.uint32)
    f = np.empty(n, np.uint32)
    rot = np.empty(n, np.uint32)
    for i in range(64):
        if i < 16:
            # (b&c)|(~b&d) == d ^ (b & (c^d)) — fewer temporaries
            np.bitwise_xor(c, d, out=f)
            np.bitwise_and(f, b, out=f)
            np.bitwise_xor(f, d, out=f)
            g = i
        elif i < 32:
            # (d&b)|(~d&c) == c ^ (d & (b^c))
            np.bitwise_xor(b, c, out=f)
            np.bitwise_and(f, d, out=f)
            np.bitwise_xor(f, c, out=f)
            g = (5 * i + 1) & 15
        elif i < 48:
            np.bitwise_xor(b, c, out=f)
            np.bitwise_xor(f, d, out=f)
            g = (3 * i + 5) & 15
        else:
            np.bitwise_or(b, ~d, out=f)
            np.bitwise_xor(f, c, out=f)
            g = (7 * i) & 15
        f += a
        f += _MD5_K[i]
        f += words[g]
        a, d, c = d, c, b
        s = _MD5_S[i]
        np.left_shift(f, np.uint32(s), out=rot)
        f >>= np.uint32(32 - s)
        rot |= f
        b = b + rot
    a = a + np.uint32(0x67452301)
    b = b + np.uint32(0xEFCDAB89)
    # digest[:8] = LE bytes of A then B, read big-endian:
    # u64 = byteswap32(A) << 32 | byteswap32(B)
    return (
        (a.byteswap().astype(np.uint64) << np.uint64(32))
        | b.byteswap().astype(np.uint64)
    )


def md5_u64(msgs: np.ndarray, chunk: int = 1 << 16) -> np.ndarray:
    """Vectorized MD5 over short messages: ``msgs`` is a numpy bytes
    (``S``-dtype) array whose elements are ≤ 55 bytes (single padded
    block).  Returns ``uint64[N]`` equal to
    ``int.from_bytes(hashlib.md5(m).digest()[:8], "big")`` per message
    — the exact value DuckDB's ``CAST(('0x' || substr(md5(m),1,16)) AS
    UBIGINT)`` computes, so md5-twin oracles can share this kernel."""
    msgs = np.asarray(msgs, dtype="S")
    n = msgs.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    # lengths BEFORE zero-padding into the block (S dtype strips
    # trailing NULs; repo messages are ASCII text and never contain
    # NUL, asserted by construction at the call sites)
    lengths = np.char.str_len(msgs).astype(np.int64)
    width = msgs.dtype.itemsize
    if width > 55:
        # fixed-width dtypes over-allocate (an int64 stringifies to
        # U21); the single-block limit is on ACTUAL message length
        longest = int(lengths.max())
        if longest > 55:
            raise ValueError(
                f"md5_u64 is single-block only: max message length "
                f"{longest} > 55"
            )
        msgs = msgs.astype(f"S{max(longest, 1)}")
        width = msgs.dtype.itemsize
    out = np.empty(n, np.uint64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        m = hi - lo
        buf = np.zeros((m, 64), dtype=np.uint8)
        if width:
            buf[:, :width] = msgs[lo:hi].view(np.uint8).reshape(m, width)
        buf[np.arange(m), lengths[lo:hi]] = 0x80   # 1-bit terminator
        words = buf.view("<u4").reshape(m, 16)
        words[:, 14] = (lengths[lo:hi] * 8).astype(np.uint32)  # bit length
        out[lo:hi] = _md5_core(np.ascontiguousarray(words.T))
    return out
