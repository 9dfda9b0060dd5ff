"""Deterministic text spec: tokenizer, sentencizer, cleaner, windowing,
crop and mask.

The reference delegates tokenization/sentence-splitting to spaCy
``en_core_web_lg`` (reference: cmd/build_matches_db.py:220,
cmd/build_contexts_db.py:183).  Per SURVEY.md §7.5(1) the rebuild
defines its own deterministic tokenizer/sentencizer spec so that
parity does not hinge on an 800 MB model version, and so the same
rules are expressible in RE2-based engines (DuckDB oracle SQL):

- **Token**: a maximal run of ``[A-Za-z0-9_]`` OR a single other
  non-space character.  (No lookarounds; ASCII word class = RE2 ``\\w``.)
- **Sentence boundary**: after a ``[.!?]`` that is followed by
  whitespace; the punctuation stays with the preceding sentence.
  Implemented as replace ``([.!?])\\s+`` -> ``\\1\\x1e`` then split on
  ``\\x1e`` — the exact same two operations DuckDB's ``regexp_replace``
  + ``string_split`` perform, so Python and SQL agree byte-for-byte.

All other rules (cleaner thresholds, crop first/last drops, strict
span containment, ``#`` masking, SQLite SUBSTR window clamping) mirror
the reference exactly; citations inline.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import numpy as np

# token = word-run or single punctuation char (spec above)
TOKEN_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# sentence boundary (spec above); \x1e = ASCII record separator
SENT_BOUNDARY_PATTERN = r"([.!?])\s+"
_SENT_BOUNDARY_RE = re.compile(SENT_BOUNDARY_PATTERN)
# hot-path twin of SENT_BOUNDARY_PATTERN: replacing the whitespace run
# AFTER a kept [.!?] (fixed-width lookbehind) produces byte-identical
# output to the exported pattern's backreference substitution, without
# re's per-match template expansion (~2x faster sub).  The exported
# pattern stays the spec the SQL oracles share.
_SENT_BOUNDARY_FAST_RE = re.compile(r"(?<=[.!?])\s+")
_SENT_SEP = "\x1e"

Token = Tuple[str, int, int]  # (text, start_char, end_char-exclusive)

# char-class lookup tables for the vectorized ASCII tokenizer, derived
# FROM the spec regexes so the two paths cannot drift
_WORD_TBL = np.zeros(128, bool)
_SPACE_TBL = np.zeros(128, bool)
for _b in range(128):
    _c = chr(_b)
    _WORD_TBL[_b] = bool(re.match(r"[A-Za-z0-9_]", _c))
    _SPACE_TBL[_b] = bool(re.match(r"\s", _c))
del _b, _c


def tokenize_arrays(text: str) -> Tuple[List[str], List[int], List[int]]:
    """Tokenize into parallel (texts, starts, ends) lists — the hot-path
    twin of ``tokenize`` (parity-tested).  ASCII text takes a numpy
    char-class path (~2× the finditer scan: word runs via a boolean
    edge diff, single-char punctuation via a mask); non-ASCII falls
    back to the spec regex."""
    if text.isascii():
        a = np.frombuffer(text.encode("ascii"), np.uint8)
        w = _WORD_TBL[a]
        d = np.diff(w.astype(np.int8), prepend=np.int8(0), append=np.int8(0))
        ws = np.nonzero(d == 1)[0]
        we = np.nonzero(d == -1)[0]
        p = np.nonzero(~w & ~_SPACE_TBL[a])[0]
        if p.size:
            starts = np.concatenate([ws, p])
            ends = np.concatenate([we, p + 1])
            order = np.argsort(starts, kind="stable")
            starts = starts[order]
            ends = ends[order]
        else:
            starts, ends = ws, we
        st = starts.tolist()
        en = ends.tolist()
    else:
        spans = [m.span() for m in _TOKEN_RE.finditer(text)]
        st = [s for s, _ in spans]
        en = [e for _, e in spans]
    return [text[s:e] for s, e in zip(st, en)], st, en


def tokenize(text: str) -> List[Token]:
    """Tokenize ``text`` into (text, start, end) triples, in order."""
    texts, st, en = tokenize_arrays(text)
    return list(zip(texts, st, en))


def token_texts(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def split_sentences(text: str) -> List[str]:
    """Split into sentences; terminal punctuation stays attached.

    ``split_sentences('A b. C d')  == ['A b.', 'C d']``.  Empty input
    yields ``[]`` (not ``['']``).
    """
    if not text:
        return []
    return _SENT_BOUNDARY_FAST_RE.sub(_SENT_SEP, text).split(_SENT_SEP)


# Sentence filter thresholds — reference cmd/build_matches_db.py:337-350
MIN_PARAGRAPH_LEN = 40
MIN_SENTENCE_LEN = 40
_BAD_SUBSTRINGS = ("|", "=", "http", "Category:")


def is_clean_sentence(sent: str) -> bool:
    """Keep-predicate of the cleaner (reference cmd/build_matches_db.py:344-350).

    Hot path: explicit ``in`` chain instead of ``any(genexpr)`` — the
    generator frame per sentence measured ~12% of cleaner time."""
    return (
        len(sent) >= MIN_SENTENCE_LEN
        and sent[:1].isupper()
        and "|" not in sent
        and "=" not in sent
        and "http" not in sent
        and "Category:" not in sent
    )


def clean_up_text(page_text: str) -> str:
    """Remove sentence fragments, leaving paragraphs of whole sentences.

    Mirrors reference ``clean_up_text`` (cmd/build_matches_db.py:323-359)
    with the deterministic sentencizer: split paragraphs on ``\\n``,
    skip paragraphs < 40 chars, keep sentences that are >= 40 chars AND
    start uppercase AND contain none of ``| = http Category:``, rejoin
    sentences with ``' '`` and paragraphs with ``'\\n\\n'``.
    """
    clean_paragraphs = []
    for paragraph in page_text.split("\n"):
        if len(paragraph) < MIN_PARAGRAPH_LEN:
            continue
        clean_sents = [s for s in split_sentences(paragraph) if is_clean_sentence(s)]
        clean_paragraph = " ".join(clean_sents)
        if clean_paragraph:
            clean_paragraphs.append(clean_paragraph)
    return "\n\n".join(clean_paragraphs)


def sql_window(text: str, start_char: int, end_char: int, size: int) -> str:
    """±``size``-char window around a match, with SQLite SUBSTR clamping.

    Byte-for-byte replica of the reference's SQL expression
    (dao/matches_db.py:186-188):

        SUBSTR(text,
               MAX(start_char + 1 - size, 1),
               MIN((start_char + 1 - MAX(start_char + 1 - size, 1))
                   + (end_char - start_char) + size,
                   length(text)))

    SQLite SUBSTR is 1-based and codepoint-based; Python slicing on
    ``str`` is codepoint-based too, and clamps the end for free.
    """
    a = max(start_char + 1 - size, 1)  # 1-based window start
    length = min((start_char + 1 - a) + (end_char - start_char) + size, len(text))
    return text[a - 1 : a - 1 + length]


def make_spacy_tokenizer(model: str = "en_core_web_sm"):
    """Optional conformance escape hatch (SURVEY.md §7.6.1): a
    tokenizer with the same ``tokenize`` signature backed by a REAL
    spaCy pipeline, for measuring the deterministic spec's divergence
    against the reference's actual tokenization (reference
    cmd/build_matches_db.py:220 loads ``en_core_web_lg``).  Raises
    ImportError when spaCy is not installed (this sandbox) — callers
    gate on that and the comparison tooling skips, it never fakes.

    Non-space tokens map to the spec's Token triples; offsets are
    spaCy's ``idx`` (codepoint-based, same coordinate system)."""
    import spacy  # noqa: F401 — ImportError is the gate

    try:
        nlp = spacy.load(model, disable=["parser", "ner", "lemmatizer", "tagger"])
    except OSError:  # model not downloaded — blank pipeline tokenizes fine
        nlp = spacy.blank("en")

    def spacy_tokenize(text: str) -> List[Token]:
        return [
            (t.text, t.idx, t.idx + len(t.text))
            for t in nlp.tokenizer(text)
            if not t.is_space
        ]

    return spacy_tokenize


def crop_tokens(context: str) -> str:
    """Token-mode crop: drop first and last token (possibly clipped),
    join the rest with a single space.

    Mirrors reference ``crop_contexts`` token branch
    (cmd/build_contexts_db.py:287-294): spaCy's non-space tokens map to
    this spec's tokens; ``.strip()`` there is a no-op for both.
    """
    toks = token_texts(context)[1:-1]
    return " ".join(toks)


def crop_sentences_mode(context: str, matcher) -> str:
    """Sentence-mode crop (reference cmd/build_contexts_db.py:258-285).

    Split into sentences, re-split each on ``\\n``, strip, drop empties,
    keep sentences starting uppercase, drop the last sentence (possibly
    incomplete), keep only sentences where ``matcher`` fires, join with
    ``'\\n'``.  ``matcher`` is a ``PhraseMatcher`` over this spec's
    tokens (functions/matcher.py).
    """
    raw_sents = split_sentences(context)
    flat_sents = [part for sent in raw_sents for part in sent.split("\n")]
    stripped = [s.strip() for s in flat_sents]
    non_empty = [s for s in stripped if s]
    upper_sents = [s for s in non_empty if s[0].isupper()]
    complete_sents = upper_sents[:-1]
    match_sents = [s for s in complete_sents if matcher(tokenize(s))]
    return "\n".join(match_sents)


def strict_contains(x: Tuple[int, int], y: Tuple[int, int]) -> bool:
    """True iff token-span x strictly contains y (proper containment).

    Reference ``contains`` (cmd/build_contexts_db.py:322-323).
    """
    return x[0] <= y[0] and x[1] >= y[1] and (x[0] != y[0] or x[1] != y[1])


def prune_contained_spans(spans: Sequence[Tuple[int, int]]) -> List[Tuple[int, int]]:
    """Keep only maximal spans: drop any span strictly contained in
    another (reference cmd/build_contexts_db.py:325-335).  Input spans
    are deduplicated first (the reference builds a ``set``).  The result
    is returned sorted by (start, end) — deterministic regardless of
    input order (equal spans cannot strictly contain each other).
    """
    span_set = set(spans)
    kept = [
        s
        for s in span_set
        if not any(strict_contains(o, s) for o in span_set if o != s)
    ]
    return sorted(kept)


def mask_context(context: str, matcher) -> str | None:
    """Mask every maximal matcher span with ``#`` chars; return None if
    no span fires (row dropped), mirroring reference ``mask_contexts``
    (cmd/build_contexts_db.py:303-354).
    """
    toks = tokenize(context)
    matches = matcher(toks)
    kept = prune_contained_spans(matches)
    if not kept:
        return None
    mutable = list(context)
    for tstart, tend in kept:
        start_char = toks[tstart][1]
        end_char = toks[tend - 1][2]
        for i in range(start_char, end_char):
            mutable[i] = "#"
    return "".join(mutable)
