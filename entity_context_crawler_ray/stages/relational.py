"""Relational operator library: broadcast joins, explicit bucketed
hash join, semi-join, dedup-first, top-k, grouped windows.

These are the generic forms of the reference's joins/lookups
(SURVEY.md §2.4): J1/J3/J4 are broadcast probes, J2 is the shuffle
join.  The bucketed join is the portable explicit pattern (union two
tagged sides, groupby bucket, merge per group) used when
``Dataset.join`` isn't a fit; both are provided.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _bucket_ids(s: pd.Series, num_buckets: int):
    """Stable bucket ids for a key column.  Integer keys are widened
    to int64 FIRST: pandas hashes a small-width negative int (int32
    -5) differently from the int64 -5 (view-then-astype), so two join
    sides with mismatched key dtypes would land equal keys in
    different buckets and emit wrong join/anti-join results."""
    if pd.api.types.is_integer_dtype(s.dtype):
        s = s.astype("int64")
    return (
        pd.util.hash_pandas_object(s, index=False).to_numpy() % num_buckets
    ).astype("int32")


def broadcast_inner_join(
    ds: ray.data.Dataset,
    small: pa.Table,
    on: str,
    right_on: Optional[str] = None,
) -> ray.data.Dataset:
    """Inner join with a broadcast small side (ray.put once, pandas
    merge per batch) — no shuffle.  The reference's per-page
    links⋈entities probe (cmd/build_matches_db.py:252) generalized."""
    right_on = right_on or on
    ref = ray.put(small.to_pandas())

    def join(batch: pd.DataFrame) -> pd.DataFrame:
        rhs = ray.get(ref)
        return batch.merge(rhs, left_on=on, right_on=right_on, how="inner")

    return ds.map_batches(join, batch_format="pandas")


def broadcast_semi_join(
    ds: ray.data.Dataset, keys, on: str
) -> ray.data.Dataset:
    """Keep rows whose ``on`` value is in the broadcast key set."""
    key_set = set(keys)
    ref = ray.put(key_set)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pa.array([v in ks for v in batch[on].to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow")


def hash_join_bucketed(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    num_buckets: int = 16,
    right_on: Optional[str] = None,
    suffix: str = "_r",
    how: str = "inner",
) -> ray.data.Dataset:
    """Explicit partitioned hash join: tag each side, bucket by
    hash(key) % B, groupby(bucket), pandas merge per bucket.  Skewed
    keys: raise num_buckets or salt the hot key's bucket upstream.
    ``how``: 'inner' or 'left' (LEFT OUTER — unmatched left rows
    survive with nulls in the right columns)."""
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    right_on = right_on or on
    l_schema, r_schema = left.schema(), right.schema()
    l_names, r_names = list(l_schema.names), list(r_schema.names)

    def _arrow_type(typ) -> pa.DataType:
        # pandas-backed datasets report numpy dtypes / `object`
        if isinstance(typ, pa.DataType):
            return typ
        try:
            return pa.from_numpy_dtype(typ)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    # unified schema: union of both sides' columns by name + tag cols
    unified: list = []
    seen = {}
    for name, typ in list(zip(l_names, l_schema.types)) + list(
        zip(r_names, r_schema.types)
    ):
        if name not in seen:
            seen[name] = typ
            unified.append((name, _arrow_type(typ)))

    def tag(side: str, key: str, own: List[str]):
        def fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {}
            for name, typ in unified:
                cols[name] = t[name] if name in own else pa.nulls(n, typ)
            # vectorized stable bucket ids: hash_pandas_object is a C
            # kernel with a hardcoded key (process-stable), so both
            # sides of the join bucket identically with no Python loop
            cols["__bucket"] = pa.array(
                _bucket_ids(t[key].to_pandas(), num_buckets), pa.int32()
            )
            cols["__side"] = pa.array([side] * n)
            return pa.table(cols)

        return fn

    lt = left.map_batches(tag("l", on, l_names), batch_format="pyarrow")
    rt = right.map_batches(tag("r", right_on, r_names), batch_format="pyarrow")

    # the exact column list pandas merge emits, so every bucket —
    # including empty / rhs-empty fallbacks — shares ONE schema even
    # when the sides collide on non-key column names (collisions get
    # the right-side suffix; a shared key name merges to one column)
    merged_names = list(l_names)
    for name in r_names:
        if name == right_on and right_on == on:
            continue
        merged_names.append(name + suffix if name in l_names else name)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lhs = g[g["__side"] == "l"][l_names]
        rhs = g[g["__side"] == "r"][r_names]
        if lhs.empty or (rhs.empty and how == "inner"):
            return pd.DataFrame(columns=merged_names)
        if rhs.empty:  # left outer with no bucket matches
            out = lhs.copy()
            for name in merged_names:
                if name not in out.columns:
                    out[name] = pd.NA
            return out[merged_names]
        return lhs.merge(
            rhs, left_on=on, right_on=right_on, how=how, suffixes=("", suffix)
        )

    # union of tagged sides co-partitions both on the bucket key
    return lt.union(rt).groupby("__bucket").map_groups(
        merge, batch_format="pandas"
    )


def anti_join_bucketed(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    num_buckets: int = 16,
) -> ray.data.Dataset:
    """Left ANTI join (rows of ``left`` whose key has no match in
    ``right``) as an explicit partitioned exchange: the right side is
    projected to its key column only (the probe needs nothing else, so
    the shuffle moves keys, not rows), both sides bucket on
    hash(key) % B, and each bucket group emits the left rows whose key
    is absent from the bucket's right-key set.  Scale-honest — neither
    side is broadcast, so this works when BOTH sides are corpus-sized
    (the broadcast variant ``broadcast_semi_join`` with a negated mask
    is the small-right shortcut)."""
    right_on = right_on or on
    l_schema = left.schema()
    l_names = list(l_schema.names)

    def _arrow_type(typ) -> pa.DataType:
        if isinstance(typ, pa.DataType):
            return typ
        try:
            return pa.from_numpy_dtype(typ)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()

    l_types = {n: _arrow_type(t) for n, t in zip(l_names, l_schema.types)}

    def tag_left(t: pa.Table) -> pa.Table:
        key = t[on]
        bucket = pa.array(_bucket_ids(key.to_pandas(), num_buckets), pa.int32())
        return t.append_column("__bucket", bucket).append_column(
            "__side", pa.array(["l"] * t.num_rows)
        )

    def tag_right(t: pa.Table) -> pa.Table:
        # key column only, renamed to the left key, null-padded schema
        key = t[right_on]
        n = t.num_rows
        cols = {}
        for name in l_names:
            cols[name] = key if name == on else pa.nulls(n, l_types[name])
        cols["__bucket"] = pa.array(_bucket_ids(key.to_pandas(), num_buckets),
                                    pa.int32())
        cols["__side"] = pa.array(["r"] * n)
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        rhs_keys = set(g.loc[g["__side"] == "r", on])
        lhs = g[g["__side"] == "l"]
        return lhs.loc[~lhs[on].isin(rhs_keys), l_names]

    return lt.union(rt).groupby("__bucket").map_groups(anti, batch_format="pandas")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Distributed hash join via the native ``Dataset.join``
    (hash-partitioned on the key) — the production path; the explicit
    ``hash_join_bucketed`` above is the portable pattern for engines
    without a native join and documents the exchange.  Partition
    count defaults to ~cluster CPUs / 8 (each partition is an
    aggregator actor; 4 beat 16 by ~20%% on the 32-CPU box)."""
    if num_partitions is None:
        from .dedup import _default_partitions

        num_partitions = _default_partitions(8, 2)
    return left.join(
        right,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on,),
        right_on=((right_on or on),),
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_value: str,
) -> ray.data.Dataset:
    """As-of join (backward): for each left row, the right row of the
    same key with the greatest ``right_time`` <= ``left_time``; ties
    on ``right_time`` resolve to the max ``right_value``
    (deterministic).  Left rows with no earlier right row drop
    (inner semantics).

    Ray-Data shape: tagged union of both sides co-partitions by key in
    ONE exchange; each per-key group sorts the right side once and
    answers every left row with a vectorized ``np.searchsorted`` —
    the distributed sort-merge as-of, not a cross join.
    Partitioning assumption: one key's rows fit a worker (same as any
    per-key group op; salt hot keys upstream if not)."""
    import numpy as np

    lcols = [on, left_time]
    extra = [c for c in left.schema().names if c not in lcols]

    def tag_left(t: pa.Table) -> pa.Table:
        cols = {"__key": t[on], "__t": t[left_time], "__side": pa.array(["l"] * t.num_rows)}
        cols["__rv"] = pa.nulls(t.num_rows, right.schema().types[right.schema().names.index(right_value)])
        for c in extra:
            cols[c] = t[c]
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        cols = {"__key": t[right_on], "__t": t[right_time], "__side": pa.array(["r"] * t.num_rows)}
        cols["__rv"] = t[right_value]
        for c in extra:
            cols[c] = pa.nulls(t.num_rows, left.schema().types[left.schema().names.index(c)])
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.select_columns([right_on, right_time, right_value]).map_batches(
        tag_right, batch_format="pyarrow"
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        ls = g[g["__side"] == "l"]
        rs = g[g["__side"] == "r"].sort_values(["__t", "__rv"])
        if ls.empty or rs.empty:
            return pd.DataFrame(
                columns=[on, left_time, *extra, "asof_time", "asof_value"]
            )
        rtimes = rs["__t"].to_numpy()
        rvals = rs["__rv"].to_numpy()
        idx = np.searchsorted(rtimes, ls["__t"].to_numpy(), side="right") - 1
        ok = idx >= 0
        ls = ls[ok]
        idx = idx[ok]
        if ls.empty:
            return pd.DataFrame(
                columns=[on, left_time, *extra, "asof_time", "asof_value"]
            )
        # tie-break: last row of the matched __t run = max __rv (sorted)
        last = np.searchsorted(rtimes, rtimes[idx], side="right") - 1
        out = pd.DataFrame(
            {
                on: ls["__key"].to_numpy(),
                left_time: ls["__t"].to_numpy(),
                **{c: ls[c].to_numpy() for c in extra},
                "asof_time": rtimes[last],
                "asof_value": rvals[last],
            }
        )
        return out

    return lt.union(rt).groupby("__key").map_groups(merge, batch_format="pandas")


def dedup_first(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    ascending: bool = True,
) -> ray.data.Dataset:
    """One row per key group: the first by ``order_by`` — the
    INSERT-OR-IGNORE pattern (reference dao/matches_db.py:51-62)
    made deterministic."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(list(order_by), ascending=ascending).head(1)

    return ds.groupby(list(keys)).map_groups(first, batch_format="pandas")


def top_k(
    ds: ray.data.Dataset,
    by: Sequence[str],
    k: int,
    descending: Sequence[bool],
) -> ray.data.Dataset:
    """Global top-k via distributed sort + limit."""
    return ds.sort(list(by), descending=list(descending)).limit(k)


def grouped_top_k(
    ds: ray.data.Dataset,
    group_key: str,
    by: Sequence[str],
    k: int,
    descending: Sequence[bool],
) -> ray.data.Dataset:
    """Top-k rows PER group (the window-function
    ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k`` shape).

    Map-side combiner: every batch is pre-truncated to its own per-key
    top-k (exact — the global per-key top-k is a subset of the union
    of per-batch per-key top-ks), so the one groupby exchange moves at
    most k rows per (key, batch) instead of every row."""
    order = list(by)
    asc = [not d for d in descending]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(order, ascending=asc)
            .groupby(group_key, group_keys=False)
            .head(k)
        )

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(order, ascending=asc).head(k)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(group_key)
        .map_groups(final, batch_format="pandas")
    )


def salted_group_sum(
    ds: ray.data.Dataset,
    key_col: str,
    value_col: str,
    num_salts: int = 16,
) -> ray.data.Dataset:
    """Hot-key-safe grouped sum + count (exact integer cents): the
    skew pattern from the brief ("salt hot keys") made first-class.

    Phase 0 (map-side): each batch pre-aggregates to one row per
    (key, salt), salt = row-position % num_salts — so the first
    exchange moves ≤ num_salts rows per (key, batch) no matter how
    hot the key.  Phase 1: groupby (key, salt) sums the partials
    across batches; a key with 10^9 rows lands on num_salts reducers
    instead of one.  Phase 2: groupby key over ≤ num_salts rows per
    key.  The result is identical to a plain GROUP BY (addition is
    associative); only the exchange layout changes."""
    import numpy as np
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch[value_col], pa.float64()),
                                 pa.scalar(100.0))),
            pa.int64(),
        )
        salt = pa.array(
            np.arange(batch.num_rows, dtype=np.int64) % num_salts, pa.int64()
        )
        t = pa.table({key_col: batch[key_col], "__salt": salt, "cents": cents})
        agg = t.group_by([key_col, "__salt"]).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table(
            {
                key_col: agg[key_col],
                "__salt": agg["__salt"],
                "ps": pc.cast(agg["cents_sum"], pa.int64()),
                "pn": pc.cast(agg["cents_count"], pa.int64()),
            }
        )

    salted = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby([key_col, "__salt"])
        .aggregate(Sum("ps", alias_name="s"), Sum("pn", alias_name="n"))
    )
    return salted.groupby(key_col).aggregate(
        Sum("s", alias_name="sum_cents"), Sum("n", alias_name="n_rows")
    )


def _finest_sum_cents(
    ds: ray.data.Dataset, keys: List[str], value_col: str
) -> pa.Table:
    """The finest-grain (all keys) exact cents-sum + row-count
    aggregate shared by ROLLUP and CUBE: one map-side Arrow group_by
    partial per batch, ONE keyed exchange, result bounded by
    key-combination cardinality.  Key columns must be string-typed —
    coarser levels fill dropped slots with a string label, and a
    non-string key would make that concat raise (or, worse, a genuine
    key value could collide with the label if we compared sentinels;
    see cube_sum_cents, which avoids sentinel comparison entirely)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    schema = ds.schema()
    for k in keys:
        typ = schema.types[schema.names.index(k)]
        if isinstance(typ, pa.DataType) and not (
            pa.types.is_string(typ) or pa.types.is_large_string(typ)
        ):
            raise TypeError(
                f"rollup/cube key column {k!r} must be string-typed, "
                f"got {typ} — cast it upstream"
            )

    def partial(batch: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.round(pc.multiply(pc.cast(batch[value_col], pa.float64()),
                                 pa.scalar(100.0))),
            pa.int64(),
        )
        t = pa.table(
            {**{k: batch[k] for k in keys}, "cents": cents}
        )
        agg = t.group_by(keys).aggregate(
            [("cents", "sum"), ("cents", "count")]
        )
        return pa.table(
            {
                **{k: agg[k] for k in keys},
                "ps": pc.cast(agg["cents_sum"], pa.int64()),
                "pn": pc.cast(agg["cents_count"], pa.int64()),
            }
        )

    finest = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Sum("ps", alias_name="sum_cents"),
                   Sum("pn", alias_name="n_rows"))
    )
    return pa.Table.from_pandas(finest.to_pandas(), preserve_index=False)


def rollup_sum_cents(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    value_col: str,
    all_label: str = "*ALL*",
) -> pa.Table:
    """SQL ``GROUP BY ROLLUP(key_cols)`` over an exact cents sum +
    row count: the finest level plus every prefix subtotal up to the
    grand total, subtotal key slots carrying ``all_label``.

    Scale shape: ONE map-side partial per batch (Arrow group_by on
    the finest key) and ONE keyed exchange at the finest granularity;
    every coarser level is re-aggregated from the finest AGGREGATE
    (bounded by key-combination cardinality, not corpus size), never
    from the raw rows — the classic rollup-from-cube trick.

    Edge semantics: an EMPTY input still yields the grand-total row
    (0 cents / 0 rows), where SQL's GROUP BY ROLLUP yields no rows —
    callers comparing against SQL on possibly-empty inputs should
    drop that row."""
    keys = list(key_cols)
    base = _finest_sum_cents(ds, keys, value_col)
    subsets = [tuple(keys[:lvl]) for lvl in range(len(keys) - 1, -1, -1)]
    return pa.concat_tables(
        [base] + _reaggregate_levels(base, keys, subsets, all_label)
    )


def _reaggregate_levels(
    base: pa.Table,
    keys: List[str],
    kept_sets,
    all_label: str,
) -> List[pa.Table]:
    """Build one coarser level per kept-key subset by re-aggregating
    the finest AGGREGATE (never the raw rows); dropped key slots carry
    ``all_label``."""
    import pyarrow.compute as pc

    levels = []
    for kept in kept_sets:
        kept = list(kept)
        if kept:
            agg = base.group_by(kept).aggregate(
                [("sum_cents", "sum"), ("n_rows", "sum")]
            )
            cols = {k: agg[k] for k in kept}
            n = agg.num_rows
            s = pc.cast(agg["sum_cents_sum"], pa.int64())
            c = pc.cast(agg["n_rows_sum"], pa.int64())
        else:
            n = 1
            s = pa.array([pc.sum(base["sum_cents"]).as_py() or 0], pa.int64())
            c = pa.array([pc.sum(base["n_rows"]).as_py() or 0], pa.int64())
            cols = {}
        for k in keys:
            if k not in kept:
                cols[k] = pa.array([all_label] * n, pa.string())
        levels.append(
            pa.table({**{k: cols[k] for k in keys}, "sum_cents": s,
                      "n_rows": c})
        )
    return levels


def cube_sum_cents(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    value_col: str,
    all_label: str = "*ALL*",
) -> pa.Table:
    """SQL ``GROUP BY CUBE(key_cols)``: every key subset's aggregate
    in one result (2^k grouping sets), subtotal slots labeled
    ``all_label``.  Same scale shape as :func:`rollup_sum_cents` —
    one finest-grain exchange, every other grouping set re-aggregates
    the finest AGGREGATE driver-side (bounded by key-combination
    cardinality; k is small by construction).  The finest level is
    held directly (shared helper with rollup) rather than
    reconstructed by comparing key slots against ``all_label`` — a
    genuine key value equal to the label can therefore never be
    misclassified as a subtotal row."""
    from itertools import combinations

    keys = list(key_cols)
    base = _finest_sum_cents(ds, keys, value_col)
    # every grouping set except the full key set, coarsest-first to
    # match rollup's prefix order followed by the non-prefix subsets
    prefixes = [tuple(keys[:lvl]) for lvl in range(len(keys) - 1, -1, -1)]
    have = {tuple(keys)} | set(prefixes)
    missing = [
        tuple(k for k in keys if k in set(sub))
        for r in range(1, len(keys))
        for sub in combinations(keys, r)
        if tuple(k for k in keys if k in set(sub)) not in have
    ]
    return pa.concat_tables(
        [base]
        + _reaggregate_levels(base, keys, prefixes + missing, all_label)
    )


def set_compare(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_col: str,
) -> ray.data.Dataset:
    """Distinct-key set comparison — INTERSECT / EXCEPT / reverse
    EXCEPT in one pass: returns (key, op) with op in
    {'both', 'left_only', 'right_only'}.

    Scale shape: each side is tagged with presence flags and
    per-batch deduplicated map-side, so the single keyed exchange
    moves DISTINCT keys only; one groupby-max then a vectorized
    classify.  No sort, no join — the flags are the join."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    def tag(a: int, b: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = batch[key_col].combine_chunks().unique()
            n = len(keys)
            return pa.table(
                {
                    key_col: keys,
                    "in_a": pa.array([a] * n, pa.int64()),
                    "in_b": pa.array([b] * n, pa.int64()),
                }
            )

        return fn

    tagged = left.select_columns([key_col]).map_batches(
        tag(1, 0), batch_format="pyarrow"
    ).union(
        right.select_columns([key_col]).map_batches(
            tag(0, 1), batch_format="pyarrow"
        )
    )
    flags = tagged.groupby(key_col).aggregate(
        Max("in_a", alias_name="a"), Max("in_b", alias_name="b")
    )

    def classify(batch: pa.Table) -> pa.Table:
        a = batch["a"]
        b = batch["b"]
        both = pc.and_(pc.equal(a, 1), pc.equal(b, 1))
        op = pc.if_else(
            both,
            pa.scalar("both"),
            pc.if_else(pc.equal(a, 1), pa.scalar("left_only"),
                       pa.scalar("right_only")),
        )
        return pa.table({key_col: batch[key_col], "op": op})

    return flags.map_batches(classify, batch_format="pyarrow")
