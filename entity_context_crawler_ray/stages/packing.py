"""Sequence packing for LLM training-data preparation: assign every
document to a fixed-capacity token bin along a deterministic global
order, using a DISTRIBUTED PREFIX SCAN — no global sort materializes
and no stage ever holds more than one rank-partition of rows.

The pattern (two-pass exclusive prefix sum) is the classic scan
decomposition: partition the key space by the TOP BITS of a
deterministic md5 rank (so partitions are ordered by construction),
reduce each partition to one (partition, sum) row, cumsum those ≤
``num_parts`` rows on the driver into per-partition exclusive
offsets, then finish each partition independently with its offset.
At 100 TB the only driver-side state is ``num_parts`` scalars and the
only exchange is the partition-keyed groupby.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .stats import _sample_u64_vec


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    count_col: str,
    capacity: int,
    salt: str = "pack",
    num_parts: int = 256,
) -> ray.data.Dataset:
    """Assign each row a ``bin`` = which fixed-``capacity`` training
    sequence it lands in when documents are laid out end-to-end in
    the deterministic global order ``(md5_rank(id), id)``: bin =
    (exclusive running sum of ``count_col``) // capacity — i.e. SQL's
    ``(sum(count) OVER (ORDER BY rk, id ROWS UNBOUNDED PRECEDING) -
    count) // capacity``.

    Documents longer than ``capacity`` simply span bins (fixed-
    boundary packing); the order is partition- and block-layout-
    independent because rank derives from the id, not from position.
    """
    if num_parts < 1 or num_parts > 1 << 16:
        raise ValueError("num_parts must be in [1, 65536]")
    shift = 64 - max(1, (num_parts - 1).bit_length()) if num_parts > 1 else 64

    def rank(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        rk = _sample_u64_vec(ids, salt)
        part = (rk >> np.uint64(shift)).astype(np.int64) if num_parts > 1 else (
            np.zeros(len(ids), dtype=np.int64)
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pc.cast(batch[count_col], pa.int64()),
                "rk": pa.array(rk, pa.uint64()),
                "part": pa.array(part, pa.int64()),
            }
        )

    ranked = ds.map_batches(rank, batch_format="pyarrow")

    # Pass 1: one (part, sum) row per rank partition -> exclusive
    # offsets on the driver (<= num_parts rows, bounded by config).
    from ray.data.aggregate import Sum

    part_sums = (
        ranked.select_columns(["part", "n_tokens"])
        .groupby("part")
        .aggregate(Sum("n_tokens", alias_name="part_total"))
        .to_pandas()
        .sort_values("part")
    )
    offsets = dict(
        zip(
            part_sums["part"].tolist(),
            (
                part_sums["part_total"].cumsum() - part_sums["part_total"]
            ).astype("int64").tolist(),
        )
    )
    offsets_ref = ray.put(offsets)

    # Pass 2: each partition finishes independently with its offset.
    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(offsets_ref)[int(g["part"].iloc[0])]
        rk = g["rk"].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, rk))
        n = g["n_tokens"].to_numpy()[order].astype(np.int64)
        prev = off + np.cumsum(n) - n
        return pd.DataFrame(
            {
                id_col: ids[order],
                "n_tokens": n,
                "bin": prev // capacity,
            }
        )

    return ranked.groupby("part").map_groups(per_part, batch_format="pandas")
