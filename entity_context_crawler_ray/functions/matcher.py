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
        # first-token index: positions whose token is no pattern's
        # first token are skipped without any slice/tuple allocation —
        # the scan cost drops from O(n × distinct lengths) allocations
        # to O(candidate positions) (profiled hot in stage 1)
        self._first: Dict[str, List[Tuple[int, Set[Tuple[str, ...]]]]] = {}
        for pattern in patterns:
            if tokenizer is None:
                toks = tuple(token_texts(pattern))
            else:
                toks = tuple(t[0] for t in tokenizer(pattern))
            if toks:
                self._by_len.setdefault(len(toks), set()).add(toks)
        for length, pats in self._by_len.items():
            for p in pats:
                bucket = self._first.setdefault(p[0], [])
                for i, (blen, bpats) in enumerate(bucket):
                    if blen == length:
                        bpats.add(p)
                        break
                else:
                    bucket.append((length, {p}))

    def __call__(self, tokens: Sequence) -> List[Tuple[int, int]]:
        """Return all (start, end) token spans, sorted by (start, end).

        Accepts either Token triples or bare token-text strings (the
        hot path passes ``tokenize_arrays`` texts directly — no triple
        construction)."""
        if tokens and isinstance(tokens[0], str):
            texts = tokens
        else:
            texts = [t[0] for t in tokens]
        n = len(texts)
        first = self._first
        out: List[Tuple[int, int]] = []
        for i, tx in enumerate(texts):
            buckets = first.get(tx)
            if buckets is None:
                continue
            for length, pats in buckets:
                j = i + length
                if j <= n and tuple(texts[i:j]) in pats:
                    out.append((i, j))
        out.sort()
        return out

    def __bool__(self) -> bool:
        return bool(self._by_len)
