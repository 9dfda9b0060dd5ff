"""Streaming Wikipedia XML source -> docs table (input_hint shape).

Rebuild of the reference's ``Wikipedia`` iterator
(reference util/wikipedia.py:4-77) on stdlib ``iterparse``:
incremental ``end``-event parse of ``<page>`` elements with element
clearing (bounded memory, reference :30-32), drop pages with missing
title/text (counted, reference :49-64), skip the 30 non-article
namespaces (reference :66-75), optional ``limit_pages`` early stop
(reference :42-43).  Each surviving page's markup is converted to the
interleaved span sequence via the wikitext spec
(functions/wikitext.py): paragraphs -> text spans, wikilinks -> link
spans (target title, underscores normalized to spaces), File:/Image:
links -> media spans.

Distribution note: a single dump file parses as a driver-side stream
batched into Arrow blocks (``read_wikipedia_xml``).  Real enwiki dumps
ship as multistream bz2 with a stream index — at 100 TB the index's
byte offsets become one read task per stream feeding the same
``page_to_doc_row`` conversion; the per-page logic below is already
partition-agnostic.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, Iterator, List, Optional

import pyarrow as pa
import ray.data

from ..functions.wikitext import (
    MEDIA_PREFIXES,
    extract_wikilinks,
    plain_text,
)
from .docs import DOCS_SCHEMA

# reference util/wikipedia.py:66-75
SKIP_NAMESPACES = (
    "Talk:", "User:", "User talk:", "Wikipedia:", "Wikipedia talk:",
    "File:", "File talk:", "MediaWiki:", "MediaWiki talk:", "Template:",
    "Template talk:", "Help:", "Help talk:", "Category:", "Category talk:",
    "Portal:", "Portal talk:", "Book:", "Book talk:", "Draft:",
    "Draft talk:", "Education Program:", "Education Program talk:",
    "TimedText:", "TimedText talk:", "Module:", "Module talk:",
    "Gadget:", "Gadget talk:", "Gadget definition:",
    "Gadget definition talk:",
)


class WikipediaPages:
    """Iterator of {'title', 'redirect', 'text'} dicts from a dump."""

    def __init__(self, source, limit_pages: Optional[int] = None):
        self.source = source
        self.limit_pages = limit_pages
        self.missing_titles = 0
        self.missing_texts = 0
        self.skipped_special_pages = 0

    @staticmethod
    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    def __iter__(self) -> Iterator[Dict]:
        count = 0
        root = None
        for event, elem in ET.iterparse(self.source, events=("start", "end")):
            if event == "start":
                if root is None:
                    root = elem
                continue
            if self._local(elem.tag) != "page":
                continue
            if self.limit_pages is not None and count == self.limit_pages:
                break
            count += 1

            title = redirect = text = None
            for child in elem:
                name = self._local(child.tag)
                if name == "title":
                    title = child.text
                elif name == "redirect":
                    redirect = child.get("title")
                elif name == "revision":
                    for sub in child:
                        if self._local(sub.tag) == "text":
                            text = sub.text
            # bounded memory: clear processed subtree
            elem.clear()
            if root is not None:
                # drop earlier siblings accumulated under the root
                for done in list(root):
                    if done is not elem:
                        root.remove(done)

            if not title:
                self.missing_titles += 1
                continue
            if text is None:
                self.missing_texts += 1
                continue
            if title.startswith(SKIP_NAMESPACES):
                self.skipped_special_pages += 1
                continue
            yield {"title": title, "redirect": redirect, "text": text}


def page_to_doc_row(title: str, markup: str) -> dict:
    """One page -> one docs row (interleaved spans, offset-ordered)."""
    spans: List[dict] = []
    offset = 0

    def add(kind: str, stext: str, media_ref: str = "") -> None:
        nonlocal offset
        spans.append({"kind": kind, "text": stext, "media_ref": media_ref, "offset": offset})
        offset += 1

    for target, anchor in extract_wikilinks(markup):
        norm = target.replace("_", " ")
        if norm.startswith(MEDIA_PREFIXES):
            add("media", anchor, norm)
        else:
            add("link", anchor, norm)
    for paragraph in plain_text(markup).split("\n"):
        paragraph = paragraph.strip()
        if paragraph:
            add("text", paragraph)
    return {"doc_id": title, "spans": spans}


def read_wikipedia_xml(
    path: str, limit_pages: Optional[int] = None, batch_rows: int = 256
) -> ray.data.Dataset:
    """Dump file -> docs Dataset (streamed into Arrow blocks)."""
    tables: List[pa.Table] = []
    rows: List[dict] = []
    for page in WikipediaPages(path, limit_pages):
        rows.append(page_to_doc_row(page["title"], page["text"]))
        if len(rows) >= batch_rows:
            tables.append(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
            rows = []
    if rows:
        tables.append(pa.Table.from_pylist(rows, schema=DOCS_SCHEMA))
    if not tables:
        tables = [DOCS_SCHEMA.empty_table()]
    return ray.data.from_arrow(tables)
