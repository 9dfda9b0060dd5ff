"""Minimal deterministic wikitext spec: link extraction + plain text.

The reference delegates markup parsing to ``wikitextparser``
(reference cmd/build_matches_db.py:248: ``wtp.parse``,
``parsed.wikilinks`` at :251, ``parsed.plain_text()`` at :277).  That
package is not available here, so — per the same policy as the
tokenizer (SURVEY.md §7.5(1)) — the rebuild defines its own small,
deterministic spec covering the constructs the pipeline consumes:

- **wikilinks**: ``[[Target]]`` / ``[[Target|anchor]]``; the target is
  everything before the first ``|``; an empty anchor falls back to the
  target downstream (reference :261).  ``File:``/``Image:`` targets
  are classified as media links.
- **plain text**: templates ``{{..}}`` (innermost-out), tables
  ``{|..|}``, ``<ref>..</ref>`` bodies, html tags, heading markers
  ``==``, bold/italic quote runs are removed; wikilinks are replaced
  by their anchor (or target); whitespace is preserved line-wise so
  the cleaner's paragraph semantics (split on ``\\n``) still apply.
"""

from __future__ import annotations

import re
from typing import List, Tuple

WIKILINK_RE = re.compile(r"\[\[([^\[\]|]+)(?:\|([^\[\]]*))?\]\]")
_TEMPLATE_RE = re.compile(r"\{\{[^{}]*\}\}")
_TABLE_RE = re.compile(r"\{\|.*?\|\}", re.S)
_REF_RE = re.compile(r"<ref[^>/]*>.*?</ref>|<ref[^>]*/>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_HEADING_RE = re.compile(r"^=+\s*(.*?)\s*=+\s*$", re.M)
_QUOTES_RE = re.compile(r"'{2,}")

MEDIA_PREFIXES = ("File:", "Image:", "Media:")


def extract_wikilinks(markup: str) -> List[Tuple[str, str]]:
    """-> [(target, anchor)] in document order; anchor may be ''."""
    out = []
    for m in WIKILINK_RE.finditer(markup):
        target = m.group(1).strip()
        anchor = (m.group(2) or "").strip()
        out.append((target, anchor))
    return out


_MARK_RE = re.compile(r"\x01(\d+)\x02")


def interleaved_spans(markup: str) -> List[Tuple[str, str, str]]:
    """-> [(kind, text, target)] in DOCUMENT order: the input_hint's
    interleaved sequence.  ``("text", paragraph, "")`` for each
    non-empty cleaned paragraph; ``("link", anchor, target)`` /
    ``("media", anchor, target)`` emitted immediately BEFORE the
    paragraph they occur in (intra-paragraph position is collapsed to
    the paragraph boundary; ``offset`` downstream is document order).

    Mechanism: each wikilink is replaced by a positional marker
    (``\\x01<index>\\x02``) plus its inline text, then the cleanup
    passes run; markers that survive pin their link to a paragraph.
    Links whose markers are removed WITH their surrounding construct
    (inside templates / refs / tables) have no defined text position —
    they are appended after the last span, still in markup order, so
    the link SET always equals ``extract_wikilinks``'s."""
    links: List[Tuple[str, str]] = []

    def sub_link(m: re.Match) -> str:
        i = len(links)
        target = m.group(1).strip()
        anchor = (m.group(2) or "").strip()
        links.append((target, anchor))
        mark = f"\x01{i}\x02"
        if target.startswith(MEDIA_PREFIXES):
            return mark  # media links contribute no inline text
        return mark + (anchor if anchor else target)

    text = WIKILINK_RE.sub(sub_link, markup)
    for _ in range(10):
        new = _TEMPLATE_RE.sub("", text)
        if new == text:
            break
        text = new
    text = _TABLE_RE.sub("", text)
    text = _REF_RE.sub("", text)
    text = _HEADING_RE.sub(r"\1", text)
    text = _TAG_RE.sub("", text)
    text = _QUOTES_RE.sub("", text)

    def link_item(i: int) -> Tuple[str, str, str]:
        target, anchor = links[i]
        kind = "media" if target.startswith(MEDIA_PREFIXES) else "link"
        return (kind, anchor, target)

    out: List[Tuple[str, str, str]] = []
    placed = set()
    for paragraph in text.split("\n"):
        for m in _MARK_RE.finditer(paragraph):
            i = int(m.group(1))
            placed.add(i)
            out.append(link_item(i))
        cleaned = _MARK_RE.sub("", paragraph).strip()
        if cleaned:
            out.append(("text", cleaned, ""))
    for i in range(len(links)):  # position-lost links (markup order)
        if i not in placed:
            out.append(link_item(i))
    return out


def plain_text(markup: str) -> str:
    text = markup
    # innermost-out template removal (bounded passes for nesting)
    for _ in range(10):
        new = _TEMPLATE_RE.sub("", text)
        if new == text:
            break
        text = new
    text = _TABLE_RE.sub("", text)
    text = _REF_RE.sub("", text)
    # links -> anchor or target (media links drop entirely)
    def _link(m: re.Match) -> str:
        target = m.group(1).strip()
        if target.startswith(MEDIA_PREFIXES):
            return ""
        anchor = (m.group(2) or "").strip()
        return anchor if anchor else target

    text = WIKILINK_RE.sub(_link, text)
    text = _HEADING_RE.sub(r"\1", text)
    text = _TAG_RE.sub("", text)
    text = _QUOTES_RE.sub("", text)
    return text
