"""Golden-value tests for the deterministic text spec
(functions/text.py), modeled on the reference's commented-out crop
test (reference tests/unit/cmd/test_build_contexts_db.py:1-30) and the
cleaner/window/mask semantics (cmd/build_matches_db.py:323-359,
dao/matches_db.py:176-200, cmd/build_contexts_db.py:239-354)."""

from entity_context_crawler_ray.functions.matcher import PhraseMatcher
from entity_context_crawler_ray.functions.text import (
    clean_up_text,
    crop_sentences_mode,
    crop_tokens,
    mask_context,
    prune_contained_spans,
    split_sentences,
    sql_window,
    token_texts,
    tokenize,
)


def test_tokenize_offsets():
    toks = tokenize("Hello, world! x2")
    assert [t[0] for t in toks] == ["Hello", ",", "world", "!", "x2"]
    text = "Hello, world! x2"
    for t, s, e in toks:
        assert text[s:e] == t


def test_split_sentences_keeps_punctuation():
    assert split_sentences("A b. C d! E?") == ["A b.", "C d!", "E?"]
    assert split_sentences("No terminal punct") == ["No terminal punct"]
    assert split_sentences("") == []
    # punctuation not followed by whitespace does not split
    assert split_sentences("e.g. 3.14 is pi") == ["e.g.", "3.14 is pi"]


def test_clean_up_text_rules():
    good = "This sentence is long enough to survive the cleaner filter."
    short_par = "Too short."
    lower = (
        "this sentence is long enough but starts lowercase so it is dropped here."
    )
    markup = "This sentence is long enough but has a | pipe char inside it."
    http = "This sentence is long enough but mentions http somewhere inside."
    cat = "This sentence is long enough but contains Category:Stuff inside."
    eq = "This sentence is long enough but has an = equals sign inside."
    page = "\n".join(
        [short_par, f"{good} {lower} {markup} {http} {cat} {eq} {good}"]
    )
    assert clean_up_text(page) == f"{good} {good}"
    # two surviving paragraphs joined with blank line
    page2 = f"{good} {good}\n{short_par}\n{good}"
    assert clean_up_text(page2) == f"{good} {good}\n\n{good}"


def test_sql_window_clamps_like_sqlite():
    text = "abcdefghij"  # len 10
    # interior: start=5,end=7,size=2 -> a=4, L=min(2+2+2,10)=6 -> text[3:9]
    assert sql_window(text, 5, 7, 2) == "defghi"
    # left edge clamp: start=1,end=2,size=5 -> a=1, L=min(1+1+5,10)=7
    assert sql_window(text, 1, 2, 5) == "abcdefg"
    # right edge: start=8,end=10,size=5 -> a=4, L=min(5+2+5,10)=10 -> text[3:13]->clamped
    assert sql_window(text, 8, 10, 5) == "defghij"
    # degenerate start=0
    assert sql_window(text, 0, 1, 3) == "abcd"


def test_crop_tokens_drops_first_and_last():
    assert crop_tokens("ny is a country in Euro") == "is a country in"
    assert crop_tokens("one two") == ""
    assert crop_tokens("one") == ""


def test_crop_sentences_golden():
    # Resurrection of the reference's commented-out golden test
    # (tests/unit/cmd/test_build_contexts_db.py): a clipped first
    # sentence (lowercase start) is dropped, the last sentence is
    # dropped as possibly incomplete, matcher-less sentences drop.
    ragged = (
        "rmany is a big country. About 80 million people live in Germany. "
        "The capital of Germany is Berlin. Germany borders Fra"
    )
    matcher = PhraseMatcher(["Germany"])
    out = crop_sentences_mode(ragged, matcher)
    assert out == (
        "About 80 million people live in Germany.\n"
        "The capital of Germany is Berlin."
    )
    # without any matcher hit, everything drops
    assert crop_sentences_mode(ragged, PhraseMatcher(["Mars"])) == ""


def test_prune_contained_spans_strict():
    # (1,4) strictly contains (2,3) and (1,3); equal spans dedup; partial
    # overlap (3,5) survives
    spans = [(2, 3), (1, 4), (1, 3), (3, 5), (1, 4)]
    assert prune_contained_spans(spans) == [(1, 4), (3, 5)]
    # equal-only spans: kept (no strict containment)
    assert prune_contained_spans([(0, 2), (0, 2)]) == [(0, 2)]


def test_mask_context_hashes_maximal_spans():
    matcher = PhraseMatcher(["New York", "New York City", "Berlin"])
    ctx = "I love New York City and Berlin a lot"
    masked = mask_context(ctx, matcher)
    assert masked == "I love ############# and ###### a lot"
    assert mask_context("no hits here", matcher) is None


def test_phrase_matcher_overlaps_and_case():
    m = PhraseMatcher(["a b", "b c", "x"])
    toks = tokenize("a b c x A")
    assert m(toks) == [(0, 2), (1, 3), (3, 4)]  # case-sensitive: no 'A'
    assert PhraseMatcher([])(toks) == []
    assert token_texts("don't stop") == ["don", "'", "t", "stop"]


def test_phrase_matcher_custom_tokenizer_alignment():
    """PhraseMatcher(patterns, tokenizer) must tokenize patterns with
    the SAME tokenizer the caller applies to documents — otherwise
    token sequences can never align (the spaCy escape-hatch bug)."""
    from entity_context_crawler_ray.functions.matcher import PhraseMatcher

    # a toy 'spacy-like' tokenizer that keeps apostrophes inside words
    # ("don't" is ONE token; the spec splits it into don + ' + t)
    def tok(text):
        out = []
        for m in __import__("re").finditer(r"[A-Za-z0-9_']+|[^A-Za-z0-9_'\s]", text):
            s, e = m.span()
            out.append((text[s:e], s, e))
        return out

    doc = tok("I don't like it")
    assert [t[0] for t in doc] == ["I", "don't", "like", "it"]
    # aligned: pattern tokenized with the SAME tokenizer -> 1 token,
    # matches; spec-tokenized pattern (3 tokens) can never align
    m_aligned = PhraseMatcher(["don't"], tok)
    assert m_aligned(doc) == [(1, 2)]
    m_spec = PhraseMatcher(["don't"])
    assert m_spec(doc) == []
