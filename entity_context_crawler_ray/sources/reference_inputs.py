"""Loaders for the reference's own input file formats, so a user of
the reference can point this engine at the exact same files.

- ``load_entities_json``: the Freebase/Wikidata catalog
  ``{MID: {"label": ..., "wikipedia": url-or-""}}``
  (reference README.md:11-22, loaded at cmd/build_matches_db.py:155-156)
  -> the ``entities`` table.  The wikipedia URL is percent-decoded,
  split on the last ``/`` and underscores become spaces — the M4
  normalizer (reference cmd/build_matches_db.py:225-234); an empty URL
  yields an empty ``page_title`` (the skip case,
  cmd/build_contexts_db.py:201-204).
- ``load_mid2rid_txt``: whitespace-separated ``MID RID`` pairs with the
  FIRST LINE SKIPPED AS HEADER (reference dao/mid2rid_txt.py:4-18,
  header skip at :14) -> the ``id_map`` table.
"""

from __future__ import annotations

import json
import urllib.parse
from typing import Dict

import pyarrow as pa


def normalize_page_url(page_url: str) -> str:
    """wikipedia URL -> page title (M4)."""
    if not page_url:
        return ""
    decoded = urllib.parse.unquote(page_url)
    return decoded.rsplit("/", 1)[-1].replace("_", " ")


def load_entities_json(path: str) -> pa.Table:
    with open(path, "r", encoding="utf-8") as fh:
        data: Dict[str, Dict] = json.load(fh)
    eids, labels, titles = [], [], []
    for mid, entity in data.items():
        eids.append(mid)
        labels.append(entity["label"])
        titles.append(normalize_page_url(entity.get("wikipedia", "")))
    return pa.table({"entity_id": eids, "label": labels, "page_title": titles})


def load_mid2rid_txt(path: str) -> pa.Table:
    eids, rids = [], []
    with open(path, encoding="utf-8") as fh:
        next(fh)  # header line
        for line in fh:
            if not line.strip():
                continue
            mid, rid = line.split()
            eids.append(mid)
            rids.append(int(rid))
    return pa.table({"entity_id": eids, "rid": pa.array(rids, pa.int64())})
