"""PhraseMatcher-equivalent over the deterministic token spec.

The reference uses spaCy's ``PhraseMatcher`` with default (ORTH,
case-sensitive) attributes (reference cmd/build_matches_db.py:273-282,
cmd/build_contexts_db.py:217-218).  Semantics reproduced here:

- a pattern matches wherever its token sequence equals a contiguous
  token subsequence of the document (exact, case-sensitive);
- every occurrence of every pattern is reported — overlapping and
  contained spans included;
- spans are token-index ``(start, end)`` pairs, end exclusive.

This implementation indexes patterns by token length and probes a
set of tuples per document position — O(len(doc) × distinct pattern
lengths) per call, with no per-pattern scan.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple

from .text import Token, token_texts


class PhraseMatcher:
    """Build once per entity / per page; call per tokenized text.

    ``tokenizer`` (optional, ``tokenize``-shaped: text -> [(text,
    start, end), ...]) overrides the spec tokenizer for the PATTERNS —
    it must be the same tokenizer the caller applies to documents, or
    token sequences can never align (the spaCy escape hatch passes its
    pipeline here)."""

    def __init__(self, patterns: Iterable[str], tokenizer=None):
        self._by_len: Dict[int, Set[Tuple[str, ...]]] = {}
        for pattern in patterns:
            if tokenizer is None:
                toks = tuple(token_texts(pattern))
            else:
                toks = tuple(t[0] for t in tokenizer(pattern))
            if toks:
                self._by_len.setdefault(len(toks), set()).add(toks)

    def __call__(self, tokens: Sequence[Token]) -> List[Tuple[int, int]]:
        """Return all (start, end) token spans, sorted by (start, end)."""
        texts = [t[0] for t in tokens]
        n = len(texts)
        out: List[Tuple[int, int]] = []
        for length, pats in self._by_len.items():
            if length > n:
                continue
            for i in range(n - length + 1):
                if tuple(texts[i : i + length]) in pats:
                    out.append((i, i + length))
        out.sort()
        return out

    def __bool__(self) -> bool:
        return bool(self._by_len)
