"""Stream-shaped operators over the ``events`` log: tumbling windows
and gap sessionization.

The reference has no windows/watermarks (SURVEY.md §2.9); these are
the batch formulations a training-data pipeline needs.  The input is
treated as an ordered, partitioned log: the window key is computed
vectorized in ``map_batches`` (no shuffle), then one grouped
aggregate; sessionization sorts each key's group by ts inside
``map_groups``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def tumbling_window_agg(
    events: ray.data.Dataset,
    window_s: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per (key, window) counts + exact min/max of value.

    window_id = floor(epoch_micros / (window_s * 1e6)) — an integer,
    so results hash-match the SQL oracle exactly."""
    from ray.data.aggregate import Count, Max, Min

    us = window_s * 1_000_000

    def add_window(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[ts_col], pa.int64())
        win = pc.divide(micros, pa.scalar(us, pa.int64()))
        return pa.table(
            {
                key_col: t[key_col],
                "window_id": win,
                value_col: t[value_col],
            }
        )

    return (
        events.map_batches(add_window, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(
            Count(alias_name="n_events"),
            Min(value_col, alias_name="min_value"),
            Max(value_col, alias_name="max_value"),
        )
    )


def sessionize(
    events: ray.data.Dataset,
    gap_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> ray.data.Dataset:
    """Per-key session stats with a ``gap_s`` inactivity threshold:
    a new session starts when ts - prev_ts > gap.  Returns
    (key, n_sessions, n_events, max_session_len)."""
    gap_ns = gap_s * 1_000_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        # normalize to int64 nanoseconds regardless of the unit the
        # arrow->pandas round-trip picked
        ts = pd.to_datetime(g[ts_col]).sort_values().astype("datetime64[ns]").astype("int64")
        d = ts.diff()
        new_session = d.isna() | (d > gap_ns)
        session_ids = new_session.cumsum()
        sizes = session_ids.value_counts()
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "n_sessions": [int(session_ids.max())],
                "n_events": [len(g)],
                "max_session_len": [int(sizes.max())],
            }
        )

    return events.select_columns([key_col, ts_col]).groupby(key_col).map_groups(
        per_key, batch_format="pandas"
    )


def sliding_range_agg(
    events: ray.data.Dataset,
    window_s: int,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per-EVENT sliding range window (SQL ``RANGE BETWEEN INTERVAL
    window_s SECOND PRECEDING AND CURRENT ROW``): for every event, the
    count and value-sum (in cents, so the sum is exact integer math)
    of the same key's events with ts in ``[t - window_s, t]``,
    boundary inclusive.

    One key-partitioned exchange; inside each group the window is two
    vectorized ``searchsorted`` probes over the sorted ts array plus a
    prefix-sum — O(n log n) per key, no per-event Python loop.  Output
    is defined per (key, ts) VALUE, not row order, so ties in ts are
    deterministic (all peers get the full peer-inclusive window, the
    same semantics as SQL RANGE windows)."""
    import numpy as np

    win_us = window_s * 1_000_000

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(
            pd.to_datetime(g[ts_col]).astype("datetime64[us]").astype("int64").to_numpy(),
            kind="stable",
        )
        ts = (
            pd.to_datetime(g[ts_col])
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()[order]
        )
        ids = g[id_col].to_numpy()[order]
        cents = np.rint(g[value_col].to_numpy()[order] * 100).astype(np.int64)
        lo = np.searchsorted(ts, ts - win_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame(
            {
                id_col: ids,
                key_col: g[key_col].iloc[0],
                "n_win": (hi - lo).astype(np.int64),
                "sum_cents_win": csum[hi] - csum[lo],
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col, value_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def cumulative_agg(
    events: ray.data.Dataset,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Per-event running aggregate (SQL ``ROWS BETWEEN UNBOUNDED
    PRECEDING AND CURRENT ROW``): count + exact cents-sum of the
    key's events up to and including this one, ordered by
    ``(ts, id)`` so ties in ts are deterministic.

    One key-partitioned exchange; per group a lexsort + one cumsum —
    no per-event Python loop."""
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = (
            pd.to_datetime(g[ts_col])
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, ts))
        cents = np.rint(g[value_col].to_numpy()[order] * 100).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids[order],
                key_col: g[key_col].iloc[0],
                "n_cum": np.arange(1, len(ids) + 1, dtype=np.int64),
                "sum_cents_cum": np.cumsum(cents),
            }
        )

    return (
        events.select_columns([id_col, key_col, ts_col, value_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def ranked_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col_cents: str,
    id_col: str,
    k: int = 3,
) -> ray.data.Dataset:
    """SQL ranking-window triple per key — ``row_number`` /
    ``rank`` / ``dense_rank`` over (value DESC, id ASC) — keeping
    rows with row_number <= k.

    ``order_col_cents`` is a float money column ranked on its exact
    integer cents so ties are well-defined.  One key-partitioned
    exchange; per group a lexsort + two vectorized scans (no
    per-row Python).  row_number tie-breaks by id; rank/dense_rank
    depend on the value alone, so all three are
    partition/order-independent."""
    import numpy as np

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(g[order_col_cents].to_numpy() * 100).astype(np.int64)
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, -cents))
        sc = cents[order]
        n = len(sc)
        new_val = np.r_[True, sc[1:] != sc[:-1]]
        rn = np.arange(1, n + 1, dtype=np.int64)
        rank = np.maximum.accumulate(np.where(new_val, rn, 0))
        dense = np.cumsum(new_val).astype(np.int64)
        keep = rn <= k
        return pd.DataFrame(
            {
                key_col: g[key_col].iloc[0],
                id_col: ids[order][keep],
                "cents": sc[keep],
                "rn": rn[keep],
                "rnk": rank[keep],
                "dense_rnk": dense[keep],
            }
        )

    return (
        ds.select_columns([key_col, id_col, order_col_cents])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def funnel_stages(
    events: ray.data.Dataset,
    stages,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> ray.data.Dataset:
    """Ordered funnel (sequence-pattern) analysis — the
    MATCH_RECOGNIZE shape: for every key, the furthest prefix of
    ``stages`` completed IN ORDER with STRICTLY increasing
    timestamps (greedy earliest-match, which is optimal for
    subsequence containment).  Returns (key, funnel_stage) with
    funnel_stage in [0, len(stages)].

    One key-partitioned exchange; per group a chained searchsorted —
    per STAGE (a small constant), the min ts of that stage's events
    strictly after the previous stage's matched ts, exactly the SQL
    chained-min formulation (t_k = min ts of stage k events strictly
    after t_{k-1}); no per-event Python loop."""
    import numpy as np

    stage_list = list(stages)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = (
            pd.to_datetime(g[ts_col])
            .astype("datetime64[us]")
            .astype("int64")
            .to_numpy()
        )
        types = g[type_col].to_numpy()
        reached = 0
        last_t = np.iinfo(np.int64).min
        for stage in stage_list:
            stage_ts = np.sort(ts[types == stage])
            i = np.searchsorted(stage_ts, last_t, side="right")
            if i >= len(stage_ts):
                break
            last_t = stage_ts[i]
            reached += 1
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "funnel_stage": [np.int64(reached)],
            }
        )

    return (
        events.select_columns([key_col, ts_col, type_col])
        .groupby(key_col)
        .map_groups(per_key, batch_format="pandas")
    )


def hopping_window_agg(
    events: ray.data.Dataset,
    window_s: int,
    hop_s: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> ray.data.Dataset:
    """Hopping (overlapping) windows: length ``window_s``, advancing
    every ``hop_s`` — each event belongs to ``window_s // hop_s``
    windows.  ``window_s`` must be a multiple of ``hop_s`` so
    membership is pure integer arithmetic (window_id = the window's
    start hop index: hop_of(ts) - i for i in [0, m)), hash-exact in
    SQL.  Map-side explode (m small copies of (key, window, cents),
    never the event row) + ONE (key, window)-keyed exchange — the
    same shape as tumbling with an m-fold pre-aggregated fan-out."""
    from ray.data.aggregate import Count, Sum

    if window_s % hop_s != 0:
        raise ValueError("window_s must be a multiple of hop_s")
    m = window_s // hop_s
    hop_us = hop_s * 1_000_000

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return pa.table(
                {
                    key_col: t[key_col],
                    "window_id": pa.array([], pa.int64()),
                    "cents": pa.array([], pa.int64()),
                }
            )
        micros = pc.cast(t[ts_col], pa.int64()).to_numpy()
        hop = micros // hop_us
        cents = (
            pc.cast(
                pc.round(
                    pc.multiply(
                        pc.cast(t[value_col], pa.float64()),
                        pa.scalar(100.0),
                    )
                ),
                pa.int64(),
            ).to_numpy()
        )
        keys = t[key_col].to_numpy(zero_copy_only=False)
        win = np.repeat(hop, m) - np.tile(
            np.arange(m, dtype=np.int64), n
        )
        return pa.table(
            {
                key_col: pa.array(np.repeat(keys, m)),
                "window_id": pa.array(win, pa.int64()),
                "cents": pa.array(np.repeat(cents, m), pa.int64()),
            }
        )

    return (
        events.map_batches(explode, batch_format="pyarrow")
        .groupby([key_col, "window_id"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
        )
    )
