"""Deduplication operators: exact, MinHash+LSH, SimHash banding,
n-gram Jaccard, embedding-cosine near-dup.

The reference only needs exact dedup (pages PK, mentions UNIQUE —
SURVEY.md §2.7); a 100 TB training-data pipeline needs near-dup too.
Shuffle discipline: every operator pre-aggregates inside
``map_batches`` (hash columns, signatures, band keys) before its one
``groupby`` — the shuffle moves fixed-width keys, never document text.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import minhash_params, minhash_signature, stable_hash64

_WORD_RE = re.compile(r"[A-Za-z0-9_]+")


def _text_hash(t: str) -> str:
    return hashlib.blake2b(t.encode("utf-8"), digest_size=16).hexdigest()


def exact_dedup_stats(
    documents: ray.data.Dataset, id_col: str = "doc_id", text_col: str = "text"
) -> ray.data.Dataset:
    """Group identical texts: (min_doc_id, n_dups, n_chars) per distinct
    content.  The shuffle key is a 128-bit content hash, not the text
    (collision probability negligible; the oracle groups by the text
    itself and agrees)."""
    from ray.data.aggregate import Count, Min

    def add_hash(t: pa.Table) -> pa.Table:
        hashes = pa.array([_text_hash(x) for x in t[text_col].to_pylist()])
        lens = pa.array([len(x) for x in t[text_col].to_pylist()], pa.int64())
        return pa.table(
            {"h": hashes, id_col: t[id_col], "n_chars": lens}
        )

    hashed = documents.map_batches(add_hash, batch_format="pyarrow")
    agg = hashed.groupby("h").aggregate(
        Min(id_col, alias_name="min_doc_id"),
        Count(alias_name="n_dups"),
        Min("n_chars", alias_name="n_chars"),
    )
    return agg.drop_columns(["h"])


def exact_dedup_first(
    ds: ray.data.Dataset, text_col: str = "text", order_col: str = "doc_id"
) -> ray.data.Dataset:
    """Keep one row (min order_col) per distinct text — the
    hash-partition + per-group-first pattern."""

    def add_hash(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__h", pa.array([_text_hash(x) for x in t[text_col].to_pylist()])
        )

    return (
        ds.map_batches(add_hash, batch_format="pyarrow")
        .groupby("__h")
        .map_groups(
            lambda g: g.sort_values(order_col).head(1), batch_format="pandas"
        )
        .drop_columns(["__h"])
    )


# --- shingles + Jaccard ---------------------------------------------------


def word_shingles(text: str, n: int = 3) -> List[str]:
    ws = _WORD_RE.findall(text)
    if len(ws) < n:
        return [" ".join(ws)] if ws else []
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def ngram_jaccard_vs(
    documents: ray.data.Dataset,
    ref_text: str,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> ray.data.Dataset:
    """Jaccard similarity of every doc's distinct word n-gram set vs a
    reference text (broadcast scalar)."""
    ref = set(word_shingles(ref_text, n))

    def score(t: pa.Table) -> pa.Table:
        sims = pa.array(
            [
                jaccard(set(word_shingles(x, n)), ref)
                for x in t[text_col].to_pylist()
            ],
            pa.float64(),
        )
        return pa.table({id_col: t[id_col], "jaccard": sims})

    return documents.map_batches(score, batch_format="pyarrow")


# --- MinHash + LSH --------------------------------------------------------


class MinHashLSH:
    """map_batches stage: doc -> (band_id, band_hash) rows.

    num_perm permutations split into ``bands`` bands of r rows each;
    docs sharing any (band_id, band_hash) bucket are candidates.  The
    classic S-curve: P(candidate) = 1 - (1 - j^r)^bands."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_n: int = 3):
        assert num_perm % bands == 0
        self.a, self.b = minhash_params(num_perm)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text, self.shingle_n)
        hashes = np.array(
            [stable_hash64("shingle", s) for s in sh], dtype=np.uint64
        )
        return minhash_signature(hashes, self.a, self.b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                band_hashes.append(
                    int.from_bytes(
                        hashlib.blake2b(
                            chunk.tobytes(), digest_size=8
                        ).digest(),
                        "big",
                    )
                    - (1 << 63)
                )
        return pa.table(
            {
                "doc_id": pa.array(ids),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.int64()),
            }
        )


def minhash_candidates(
    documents: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    pair_dedup: str = "driver",
) -> ray.data.Dataset:
    """Candidate near-dup pairs via LSH banding: shingle→minhash→band
    rows (map_batches) → groupby(band) → within-bucket pairs, deduped
    globally on (a, b).

    ``pair_dedup``: candidates are a tiny fraction of the corpus by
    design, so the default dedups them on the driver (one pyarrow
    group_by — saves a whole distributed sort); pass "distributed"
    to keep the dedup as a Ray groupby when the candidate set itself
    is huge (pathological near-dup-heavy corpora)."""
    band_rows = documents.map_batches(
        MinHashLSH(num_perm, bands, shingle_n), batch_format="pyarrow"
    )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g["doc_id"].tolist())
        out = [
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
        ]
        return pd.DataFrame(out, columns=["a", "b"]) if out else pd.DataFrame(
            {"a": pd.Series(dtype=g["doc_id"].dtype), "b": pd.Series(dtype=g["doc_id"].dtype)}
        )

    pairs = band_rows.groupby(["band_id", "band_hash"]).map_groups(
        bucket_pairs, batch_format="pandas"
    )
    # a pair can surface from several bands: exact dedup on the pair key
    if pair_dedup == "distributed":
        return pairs.groupby(["a", "b"]).map_groups(
            lambda g: g.head(1), batch_format="pandas"
        )
    tbl = pa.concat_tables(
        ray.get(pairs.to_arrow_refs()), promote_options="default"
    )
    if tbl.num_rows:
        tbl = tbl.group_by(["a", "b"]).aggregate([]).select(["a", "b"])
    return ray.data.from_arrow(tbl)


def verify_jaccard_pairs(
    pairs: ray.data.Dataset,
    documents: ray.data.Dataset,
    threshold: float,
    shingle_n: int = 3,
) -> ray.data.Dataset:
    """Verify candidate pairs by true Jaccard.

    Only the docs that actually appear in a candidate pair are read
    back (vectorized ``is_in`` filter, column-pruned) — candidates
    after LSH are a tiny fraction of the corpus, so shingling happens
    on that fraction only.  At 100 TB the same shape becomes a
    co-group of pairs with the filtered docs, repartitioned by
    doc_id."""
    pair_tbl = pa.concat_tables(
        ray.get(pairs.to_arrow_refs()), promote_options="default"
    )
    if pair_tbl.num_rows == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([], pa.int64()),
                    "b": pa.array([], pa.int64()),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        )
    needed = pa.concat_arrays(
        [pair_tbl["a"].combine_chunks(), pair_tbl["b"].combine_chunks()]
    ).unique()

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t["doc_id"], value_set=needed))

    docs_tbl = pa.concat_tables(
        ray.get(
            documents.select_columns(["doc_id", "text"])
            .map_batches(filt, batch_format="pyarrow")
            .to_arrow_refs()
        ),
        promote_options="default",
    )
    shingles: Dict = {
        d: set(word_shingles(t, shingle_n))
        for d, t in zip(docs_tbl["doc_id"].to_pylist(), docs_tbl["text"].to_pylist())
    }
    a_ids = pair_tbl["a"].to_pylist()
    b_ids = pair_tbl["b"].to_pylist()
    sims = [jaccard(shingles[a], shingles[b]) for a, b in zip(a_ids, b_ids)]
    out = pa.table(
        {
            "a": pair_tbl["a"],
            "b": pair_tbl["b"],
            "jaccard": pa.array(sims, pa.float64()),
        }
    ).filter(pa.array([s >= threshold for s in sims]))
    return ray.data.from_arrow(out)


# --- embedding near-dup ---------------------------------------------------


def embedding_neardup_lsh(
    embeddings: ray.data.Dataset,
    threshold: float = 0.95,
    n_bits: int = 8,
    seed: int = 42,
) -> ray.data.Dataset:
    """Scale-path near-dup: sign-LSH bucket each vector (map_batches),
    co-locate buckets with one groupby, compute exact pairwise cosine
    WITHIN each bucket.  Approximate: a pair split across buckets is
    missed — for cosine ≥ t the collision probability per plane is
    1 − arccos(t)/π (≈0.9 at t=0.95), so recall ≈ 0.9^n_bits per
    band; raise recall with fewer bits or multiple seeds (union of
    passes), trade against bucket size."""
    import numpy as np

    from .similarity import SignLSH, _normalize

    state = {}

    def assign(batch: pa.Table) -> pa.Table:
        mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        if "lsh" not in state:
            state["lsh"] = SignLSH(mat.shape[1], n_bits, seed)
        buckets = state["lsh"].bucket(_normalize(mat))
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "bucket": pa.array(buckets.tolist(), pa.int64()),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(
                {"vec_id_a": pd.Series(dtype="int64"),
                 "vec_id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        ids = g["vec_id"].to_numpy()
        mat = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        sims = mat @ mat.T
        out = []
        n = len(ids)
        for i in range(n):
            for j in range(i + 1, n):
                if sims[i, j] >= threshold:
                    a, b = int(ids[i]), int(ids[j])
                    if a > b:
                        a, b = b, a
                    out.append((a, b, float(sims[i, j])))
        return pd.DataFrame(out, columns=["vec_id_a", "vec_id_b", "cosine"]) if out else pd.DataFrame(
            {"vec_id_a": pd.Series(dtype="int64"),
             "vec_id_b": pd.Series(dtype="int64"),
             "cosine": pd.Series(dtype="float64")}
        )

    return (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )


def embedding_neardup_pairs(
    embeddings: ray.data.Dataset, threshold: float = 0.95
) -> ray.data.Dataset:
    """All pairs (a < b) with cosine similarity ≥ threshold.

    Exact blocked computation: the L2-normalized matrix is broadcast
    once (ray.put), each batch computes a (batch × all) matmul and
    emits only pairs above threshold.  Scale path: LSH-bucket by
    sign-bit projections first (see similarity.lsh_buckets) so each
    bucket's pairwise work is local; the brute-force kernel below is
    then the within-bucket verifier."""
    tbl = embeddings.select_columns(["vec_id", "embedding"]).to_pandas()
    ids = tbl["vec_id"].to_numpy()
    mat = np.stack(tbl["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pairs(batch: pa.Table) -> pa.Table:
        all_ids, all_mat = ray.get(ref)
        b_ids = np.asarray(batch["vec_id"].to_pylist())
        b_mat = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        b_mat /= np.maximum(np.linalg.norm(b_mat, axis=1, keepdims=True), 1e-12)
        sims = b_mat @ all_mat.T  # (batch, N)
        rows_a, rows_b, rows_s = [], [], []
        for i in range(sims.shape[0]):
            mask = (sims[i] >= threshold) & (all_ids > b_ids[i])
            for j in np.nonzero(mask)[0]:
                rows_a.append(int(b_ids[i]))
                rows_b.append(int(all_ids[j]))
                rows_s.append(float(sims[i, j]))
        return pa.table(
            {
                "vec_id_a": pa.array(rows_a, pa.int64()),
                "vec_id_b": pa.array(rows_b, pa.int64()),
                "cosine": pa.array(rows_s, pa.float64()),
            }
        )

    return embeddings.map_batches(pairs, batch_format="pyarrow", batch_size=256)
