"""Downstream read API over a written contexts store — the rebuild of
the reference's contexts-DB readers (dao/contexts_db.py:39-95).

The store is a parquet directory (``contexts.write_parquet(dir)``);
reads push the entity filter down to parquet row groups.
"""

from __future__ import annotations

from typing import Optional

import pyarrow.compute as pc
import pyarrow.dataset as pads
import ray.data


def select_contexts(store_dir: str, entity: int, limit: Optional[int] = None):
    """All context rows for one entity, optional LIMIT
    (reference select_contexts, dao/contexts_db.py:77-95)."""
    ds = ray.data.read_parquet(
        store_dir, filter=(pc.field("entity") == entity)
    )
    if limit:
        ds = ds.limit(limit)
    return ds


def select_distinct_entities(store_dir: str):
    """SELECT DISTINCT entity (reference dao/contexts_db.py:39-50) —
    column-pruned read + distinct."""
    return sorted(
        ray.data.read_parquet(store_dir, columns=["entity"]).unique("entity")
    )


def count_contexts(store_dir: str) -> int:
    """Row count from parquet metadata (no data read)."""
    return pads.dataset(store_dir, format="parquet").count_rows()
