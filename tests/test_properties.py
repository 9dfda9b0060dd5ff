"""Property-based tests (hypothesis) for the deterministic specs.

The windowing property checks against REAL SQLite — the reference's
actual engine for M18 (dao/matches_db.py:186-188) — so the clamping
semantics are verified against the authoritative implementation, not
our reading of it."""

import sqlite3

from hypothesis import given, settings
from hypothesis import strategies as st

from entity_context_crawler_ray.functions.matcher import PhraseMatcher
from entity_context_crawler_ray.functions.text import (
    clean_up_text,
    mask_context,
    prune_contained_spans,
    split_sentences,
    sql_window,
    tokenize,
)
from entity_context_crawler_ray.state.bloom import BloomShard

_conn = sqlite3.connect(":memory:")

TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)


@settings(max_examples=200, deadline=None)
@given(
    text=TEXT,
    start=st.integers(0, 250),
    length=st.integers(0, 30),
    size=st.integers(0, 120),
)
def test_sql_window_matches_real_sqlite(text, start, length, size):
    end = start + length
    got = sql_window(text, start, end, size)
    (want,) = _conn.execute(
        "SELECT SUBSTR(?, MAX(? + 1 - ?, 1),"
        " MIN((? + 1 - MAX(? + 1 - ?, 1)) + (? - ?) + ?, length(?)))",
        (text, start, size, start, start, size, end, start, size, text),
    ).fetchone()
    assert got == (want or "")


@settings(max_examples=200, deadline=None)
@given(text=TEXT)
def test_tokenize_offsets_roundtrip(text):
    toks = tokenize(text)
    for t, s, e in toks:
        assert text[s:e] == t
    # offsets strictly increasing and non-overlapping
    for (_, _, e1), (_, s2, _) in zip(toks, toks[1:]):
        assert s2 >= e1


@settings(max_examples=200, deadline=None)
@given(text=TEXT)
def test_split_sentences_partition(text):
    import re

    sents = split_sentences(text)
    # exact reconstruction: the split consumes only the whitespace run
    # after a sentence-ending [.!?]
    assert "".join(sents) == re.sub(r"([.!?])\s+", r"\1", text)


@settings(max_examples=200, deadline=None)
@given(
    spans=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 20)).map(
            lambda p: (min(p), max(p) + 1)
        ),
        max_size=10,
    )
)
def test_prune_contained_spans_properties(spans):
    kept = prune_contained_spans(spans)
    kept_set = set(kept)
    span_set = set(spans)
    # kept ⊆ input, no kept span strictly contained in another input span
    assert kept_set <= span_set
    for a in kept:
        for b in span_set:
            if a != b:
                assert not (b[0] <= a[0] and b[1] >= a[1] and b != a) or (
                    b[0] == a[0] and b[1] == a[1]
                )
    # every dropped span is strictly contained in some input span
    for s in span_set - kept_set:
        assert any(
            o[0] <= s[0] and o[1] >= s[1] and o != s for o in span_set
        )


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcXY", min_size=1, max_size=4), min_size=1, max_size=12
    ),
    pat_idx=st.integers(0, 11),
)
def test_matcher_finds_planted_pattern(words, pat_idx):
    pat_idx = pat_idx % len(words)
    pattern = words[pat_idx]
    m = PhraseMatcher([pattern])
    toks = tokenize(" ".join(words))
    spans = m(toks)
    # the planted occurrence is found (maybe among others)
    assert any(
        toks[s][1] is not None and " ".join(t[0] for t in toks[s:e]) == pattern
        for s, e in spans
    )


@settings(max_examples=50, deadline=None)
@given(urls=st.lists(st.text(min_size=1, max_size=30), max_size=50, unique=True))
def test_bloom_no_false_negatives(urls):
    b = BloomShard(num_bits=1 << 14)
    half = urls[: len(urls) // 2]
    b.set_seen(half)
    assert b.probe(half) == [True] * len(half)


@settings(max_examples=100, deadline=None)
@given(text=TEXT)
def test_clean_text_only_keeps_clean_sentences(text):
    out = clean_up_text(text)
    for para in out.split("\n\n"):
        if not para:
            continue
        assert "|" not in para and "=" not in para
        assert "http" not in para and "Category:" not in para


@settings(max_examples=100, deadline=None)
@given(
    words=st.lists(st.sampled_from(["alpha", "beta", "gamma", "x"]), min_size=1, max_size=15)
)
def test_mask_preserves_length_and_nonspan_chars(words):
    ctx = " ".join(words)
    m = PhraseMatcher(["alpha", "beta gamma"])
    masked = mask_context(ctx, m)
    if masked is not None:
        assert len(masked) == len(ctx)
        assert all(a == b for a, b in zip(ctx, masked) if b != "#")


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=13),
    h=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_image_codec_roundtrip_property(w, h, seed):
    """encode->decode is the identity for every geometry — including
    BMP rows whose 4-byte stride padding is zero (w*3 % 4 == 0) and
    1-pixel edges — for RGB PPM, gray PGM, and 24-bpp BMP."""
    import numpy as np

    from entity_context_crawler_ray.stages import media

    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    for blob, c in [
        (media.encode_ppm(rgb), 3),
        (media.encode_bmp(rgb), 3),
        (media.encode_ppm(rgb[:, :, :1]), 1),
    ]:
        dw, dh, dc, pix = media.decode_image_bytes(blob)
        assert (dw, dh, dc) == (w, h, c)
        np.testing.assert_array_equal(pix, rgb[:, :, :c])
