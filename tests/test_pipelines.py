"""End-to-end tests for the matches + contexts pipelines on sf0.001.

Parity checks follow SURVEY.md §5: table-level, order-insensitive
(the reference's own output order is nondeterministic via
imap_unordered, reference cmd/build_matches_db.py:163)."""

import pandas as pd
import pytest

from entity_context_crawler_ray.pipelines.build_contexts import build_contexts
from entity_context_crawler_ray.pipelines.build_matches import (
    build_matches,
    matches_view,
    mentions_view,
    pages_view,
)
from entity_context_crawler_ray.sources.docs import (
    entity_catalog,
    id_map_table,
    read_docs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def combined():
    docs = read_docs(SF)
    ents = entity_catalog(SF)
    return build_matches(docs, ents).materialize()


@pytest.fixture(scope="module")
def ents():
    return entity_catalog(SF)


@pytest.fixture(scope="module")
def idmap():
    return id_map_table(SF)


@pytest.fixture(scope="module")
def mentions_by_entity(combined):
    # the Dataset form — exercises the distributed co-group path
    # (the legacy dict form is covered by test_parity.py)
    return mentions_view(combined).select_columns(["entity_id", "mention"])


def test_pages_nonempty_and_no_errors(combined):
    df = pages_view(combined).to_pandas()
    assert len(df) == 500  # one page per source document
    assert (combined.to_pandas()["error"] == "").all()
    # stats invariants
    assert (df["entity_link_count"] <= df["link_count"]).all()
    assert (df["unique_mention_count"] <= df["mention_count"]).all()
    # cleaner drops content but joins paragraphs with '\n\n' where the
    # source used '\n' (reference cmd/build_matches_db.py:352-357), so
    # allow one extra char per paragraph boundary
    assert (df["clean_text_len"] <= 2 * df["text_len"]).all()


def test_matches_pk_unique_and_offsets_valid(combined):
    m = matches_view(combined).to_pandas()
    pages = pages_view(combined).to_pandas().set_index("title")["clean_text"]
    assert len(m) > 0
    # PK (entity_id, page, start_char, mention) — reference dao/matches_db.py:92
    assert not m.duplicated(["entity_id", "page", "start_char", "mention"]).any()
    # offsets index into the cleaned page text and the slice equals the mention
    for _, r in m.sample(min(len(m), 50), random_state=0).iterrows():
        text = pages[r["page"]]
        assert text[r["start_char"] : r["end_char"]] == r["mention"]


def test_mentions_unique(combined):
    me = mentions_view(combined).to_pandas()
    assert len(me) > 0
    assert not me.duplicated(["entity_id", "mention"]).any()


def test_contexts_token_mode(combined, ents, idmap, mentions_by_entity):
    df = build_contexts(
        combined, ents, idmap, mentions_by_entity, context_size=100
    ).to_pandas()
    assert len(df) > 0
    # masked_context is the same length with at least one '#' run
    assert (df["masked_context"].str.len() == df["context"].str.len()).all()
    assert df["masked_context"].str.contains("#", regex=False).all()
    # unmasked chars agree
    for _, r in df.head(20).iterrows():
        assert all(
            a == b for a, b in zip(r["context"], r["masked_context"]) if b != "#"
        )
    # entity rids come from id_map (odd by construction)
    assert (df["entity"] % 2 == 1).all()


def test_contexts_deterministic_and_limited(combined, ents, idmap, mentions_by_entity):
    kw = dict(context_size=80, limit_contexts=3, seed=7)
    a = (
        build_contexts(combined, ents, idmap, mentions_by_entity, **kw)
        .to_pandas()
        .sort_values(list(pd.Index(["entity", "page_title", "context"])))
        .reset_index(drop=True)
    )
    b = (
        build_contexts(combined, ents, idmap, mentions_by_entity, **kw)
        .to_pandas()
        .sort_values(list(pd.Index(["entity", "page_title", "context"])))
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert a.groupby("entity").size().max() <= 3


def test_md5_rank_twin_same_chain(combined, ents, idmap, mentions_by_entity):
    """rank_hash='md5' changes ONLY the sampling hash family: with no
    cap the outputs are identical, with a cap the per-entity ≤K bound
    holds and both runs of the md5 path are deterministic."""
    import pytest as _pytest

    kw = dict(context_size=80, seed=7)
    a = (
        build_contexts(combined, ents, idmap, mentions_by_entity, **kw)
        .to_pandas()
        .sort_values(["entity", "page_title", "context"])
        .reset_index(drop=True)
    )
    b = (
        build_contexts(
            combined, ents, idmap, mentions_by_entity, rank_hash="md5", **kw
        )
        .to_pandas()
        .sort_values(["entity", "page_title", "context"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)

    capped = build_contexts(
        combined,
        ents,
        idmap,
        mentions_by_entity,
        limit_contexts=3,
        rank_hash="md5",
        **kw,
    ).to_pandas()
    assert capped.groupby("entity").size().max() <= 3

    with _pytest.raises(ValueError, match="rank_hash"):
        build_contexts(
            combined, ents, idmap, mentions_by_entity, rank_hash="sha1", **kw
        ).to_pandas()


def test_limit_entities(combined, ents, idmap, mentions_by_entity):
    df = build_contexts(
        combined, ents, idmap, mentions_by_entity, limit_entities=5
    ).to_pandas()
    assert df["entity"].nunique() <= 5


def test_sentence_mode_masks_whole_sentences(combined, ents, idmap, mentions_by_entity):
    df = build_contexts(
        combined,
        ents,
        idmap,
        mentions_by_entity,
        context_size=150,
        crop_sentences=True,
    ).to_pandas()
    assert len(df) > 0
    # every kept sentence starts uppercase and fired the matcher
    for ctx in df["context"].head(20):
        for sent in ctx.split("\n"):
            assert sent and sent[0].isupper()
