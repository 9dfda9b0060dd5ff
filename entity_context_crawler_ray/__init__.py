"""entity_context_crawler_ray — a Ray-Data-native rebuild of the
query/data-processing capabilities of TobiasUhmann/entity-context-crawler.

Architecture (see /root/repo/SURVEY.md):

- Every logical table is a ``ray.data.Dataset``; stage boundaries are
  ``map_batches`` over zero-copy Arrow batches.
- Stateful stages (matchers, bloom seen-filters, politeness budgets)
  are actor pools / named actors; everything else is stateless tasks.
- Text semantics (tokenizer, sentencizer, cleaner, crop, mask,
  windowing) follow a deterministic pure-Python spec
  (``functions/text.py``) that reproduces the reference's behavior
  (reference: entity_context_crawler/cmd/build_matches_db.py,
  cmd/build_contexts_db.py) without the spaCy model dependency, and is
  deliberately RE2-compatible so the same rules are expressible as
  DuckDB oracle SQL.

No module in this package calls ``ray.init()``/``ray.shutdown()`` —
sessions are owned by bench.py / the test fixture / the driver.
"""

__version__ = "0.1.0"

import logging as _logging


class _SchemaHashNoise(_logging.Filter):
    """Suppress one known-cosmetic Ray Data warning: its schema-dedup
    fast path hashes pa.Schema objects, which raises for any schema
    carrying parquet/pandas key-value metadata in this pyarrow build
    ("Failed to hash the schemas ... unhashable type: 'dict'").  The
    slow unify path then runs correctly — the warning is pure noise on
    every read of metadata-bearing parquet.  Installed here (workers
    import this package to run the stage callables) so both driver and
    worker logs stay clean; everything else from that logger passes."""

    def filter(self, record: _logging.LogRecord) -> bool:  # noqa: A003
        return "Failed to hash the schemas" not in record.getMessage()


_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).addFilter(_SchemaHashNoise())
