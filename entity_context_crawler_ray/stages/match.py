"""Stage 1 — docs -> pages + matches + mentions.

Ray-Data-native rebuild of the reference's ``_process_page`` worker
(reference cmd/build_matches_db.py:237-320) as an actor-pool
``map_batches`` stage: the entity indexes are built ONCE per actor in
``__init__`` from a ``ray.put`` broadcast (the reference replicates
them per pool worker via the Pool initializer,
cmd/build_matches_db.py:215-222), and each ``__call__`` processes a
batch of docs.

Output is ONE combined row per doc carrying the page, its stats and
the nested matches/mentions lists — pages and their matches are
co-located by construction, which lets stage 2 window contexts
WITHOUT the pages⋈matches shuffle join the reference performs in SQL
(dao/matches_db.py:183-193): the join key (page title) is this row's
own ``title``, so the join is elided (SURVEY.md §2.4 J2 note).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa
import ray

from ..functions.matcher import PhraseMatcher
from ..functions.text import clean_up_text, tokenize

MATCH_ITEM = pa.struct(
    [
        ("entity_id", pa.string()),
        ("entity_label", pa.string()),
        ("mention", pa.string()),
        ("start_char", pa.int32()),
        ("end_char", pa.int32()),
        ("context", pa.string()),
    ]
)
MENTION_ITEM = pa.struct(
    [("entity_id", pa.string()), ("entity_label", pa.string()), ("mention", pa.string())]
)

COMBINED_SCHEMA = pa.schema(
    [
        ("title", pa.string()),
        ("clean_text", pa.string()),
        ("link_count", pa.int32()),
        ("entity_link_count", pa.int32()),
        ("mention_count", pa.int32()),
        ("unique_mention_count", pa.int32()),
        ("text_len", pa.int32()),
        ("clean_text_len", pa.int32()),
        ("match_count", pa.int32()),
        ("matches", pa.list_(MATCH_ITEM)),
        ("mentions", pa.list_(MENTION_ITEM)),
        ("error", pa.string()),
    ]
)

DEBUG_WINDOW = 20  # ±20-char debug snippet (reference cmd/build_matches_db.py:295-297)


def process_doc(
    title: str,
    spans: List[dict],
    title_to_eid: Dict[str, str],
    eid_to_label: Dict[str, str],
) -> dict:
    """Pure per-doc logic (reference _process_page,
    cmd/build_matches_db.py:241-317), over the interleaved-span schema:
    link spans play the role of wikilinks, text spans of plain text.
    Spans are processed in ``offset`` order (per-row invariant)."""
    spans = sorted(spans, key=lambda s: s["offset"])

    links = [s for s in spans if s["kind"] == "link"]
    entity_links = [l for l in links if l["media_ref"] in title_to_eid]

    # anchor text, falling back to the target title when empty
    # (reference cmd/build_matches_db.py:261)
    mention_to_eids: Dict[str, set] = {}
    for link in entity_links:
        mention = link["text"] if link["text"] else link["media_ref"]
        mention_to_eids.setdefault(mention, set()).add(title_to_eid[link["media_ref"]])

    # ambiguity dedup: mentions mapping to >1 entity dropped
    # (reference cmd/build_matches_db.py:265-266)
    mention_to_eid = {
        m: next(iter(eids)) for m, eids in mention_to_eids.items() if len(eids) == 1
    }

    db_mentions = sorted(
        (mention_to_eid[m], eid_to_label[mention_to_eid[m]], m)
        for m in mention_to_eid
    )

    # page text = text spans in document order, one paragraph per span
    page_text = "\n".join(s["text"] for s in spans if s["kind"] == "text")
    clean_text = clean_up_text(page_text)

    # phrase-match mentions over the cleaned text; per-page matcher is
    # cheap, built per doc like the reference (cmd/build_matches_db.py:273-274)
    matcher = PhraseMatcher(mention_to_eid.keys())
    toks = tokenize(clean_text)
    token_spans = matcher(toks)

    # pattern token-tuple -> eid: lookup via tokens; the mention column
    # records the ACTUAL document span text clean_text[start:end] (the
    # reference stores match_span.text, cmd/build_matches_db.py:287-289)
    # — for token-equal but byte-different spans (doubled whitespace)
    # the stored mention must equal the slice, not the pattern surface
    pat_lookup = {}
    for m, eid in mention_to_eid.items():
        pat_lookup[tuple(t[0] for t in tokenize(m))] = eid

    db_matches = []
    for ts, te in token_spans:
        start_char = toks[ts][1]
        end_char = toks[te - 1][2]
        key = tuple(t[0] for t in toks[ts:te])
        eid = pat_lookup[key]
        mention = clean_text[start_char:end_char]
        ctx_start = max(start_char - DEBUG_WINDOW, 0)
        ctx_end = min(end_char + DEBUG_WINDOW, len(clean_text))
        db_matches.append(
            {
                "entity_id": eid,
                "entity_label": eid_to_label[eid],
                "mention": mention,
                "start_char": start_char,
                "end_char": end_char,
                "context": clean_text[ctx_start:ctx_end],
            }
        )

    return {
        "title": title,
        "clean_text": clean_text,
        "link_count": len(links),
        "entity_link_count": len(entity_links),
        "mention_count": len(mention_to_eids),
        "unique_mention_count": len(mention_to_eid),
        "text_len": len(page_text),
        "clean_text_len": len(clean_text),
        "match_count": len(db_matches),
        "matches": db_matches,
        "mentions": [
            {"entity_id": e, "entity_label": l, "mention": m} for e, l, m in db_mentions
        ],
        "error": "",
    }


class PageProcessor:
    """Actor-pool callable: docs batch -> combined rows batch.

    ``entities_ref`` is a ``ray.put`` handle of the dict returned by
    ``sources.docs.entities_index`` (broadcast once, read per actor —
    never re-shipped per batch)."""

    def __init__(self, entities_ref):
        idx = ray.get(entities_ref) if isinstance(entities_ref, ray.ObjectRef) else entities_ref
        self.title_to_eid: Dict[str, str] = idx["title_to_eid"]
        self.eid_to_label: Dict[str, str] = idx["eid_to_label"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        titles = batch["doc_id"].to_pylist()
        spans_col = batch["spans"].to_pylist()
        for title, spans in zip(titles, spans_col):
            # poison-row guard (reference cmd/build_matches_db.py:319-320):
            # logic errors become error rows, not task failures — Ray
            # task retries would deterministically re-raise them.
            try:
                rows.append(process_doc(title, spans, self.title_to_eid, self.eid_to_label))
            except Exception as exc:  # noqa: BLE001
                rows.append(
                    {
                        "title": title,
                        "clean_text": "",
                        "link_count": 0,
                        "entity_link_count": 0,
                        "mention_count": 0,
                        "unique_mention_count": 0,
                        "text_len": 0,
                        "clean_text_len": 0,
                        "match_count": 0,
                        "matches": [],
                        "mentions": [],
                        "error": f"{type(exc).__name__}: {exc}",
                    }
                )
        return pa.Table.from_pylist(rows, schema=COMBINED_SCHEMA)
