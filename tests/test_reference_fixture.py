"""Parity against the reference's REAL integration fixture: the
100-page enwiki dump + 1,000-entity catalog it ships
(/root/reference/tests/integration/data/, suite at
tests/integration/test_suite.py:30-117).  This exercises the
deterministic wikitext spec on genuine wiki markup — nested templates,
refs inside templates, tables, pipe links — and asserts the reference
suite's invariants (non-empty pages/matches/mentions/contexts) plus
stronger ones the reference can't check cheaply (match offsets valid
against the cleaned text, span-sequence well-formedness)."""

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

REF_DATA = "/root/reference/tests/integration/data"
BASE = "/tmp/ecc_test_reffixture"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixture not present"
)


@pytest.fixture(scope="module")
def matches_store():
    from entity_context_crawler_ray.__main__ import main

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE, exist_ok=True)
    rc = main(
        [
            "build-matches-db",
            f"{REF_DATA}/wikipedia.xml",
            f"{REF_DATA}/entities.json",
            f"{BASE}/matches",
        ]
    )
    assert rc == 0
    return f"{BASE}/matches"


def test_real_dump_spans_well_formed():
    """Every page of the real dump parses into a valid interleaved
    span sequence: strictly increasing offsets, known kinds, link
    spans carrying a target."""
    from entity_context_crawler_ray.sources.wikipedia_xml import read_wikipedia_xml

    ds = read_wikipedia_xml(f"{REF_DATA}/wikipedia.xml")
    rows = ds.take_all()
    assert len(rows) >= 100
    kinds = {"text", "link", "media"}
    n_links = n_text = 0
    for r in rows:
        offsets = [s["offset"] for s in r["spans"]]
        assert offsets == sorted(set(offsets)), r["doc_id"]
        for s in r["spans"]:
            assert s["kind"] in kinds
            if s["kind"] in ("link", "media"):
                assert s["media_ref"], (r["doc_id"], s)
                n_links += 1
            else:
                n_text += 1
    assert n_links > 1000 and n_text > 1000  # real dump is link-dense


def test_distributed_xml_read_equals_serial():
    """Byte-range split read (one Ray task per range) produces exactly
    the serial reader's rows on the REAL dump, through >= 2 ranges."""
    from entity_context_crawler_ray.sources.wikipedia_xml import (
        _page_split_offsets,
        read_wikipedia_xml,
        read_wikipedia_xml_distributed,
    )

    path = f"{REF_DATA}/wikipedia.xml"
    ranges = _page_split_offsets(path, 8)
    assert len(ranges) >= 2
    # contiguous, gap-free coverage of the page region
    assert all(a[1] == b[0] for a, b in zip(ranges, ranges[1:]))

    def key(rows):
        return sorted(
            (
                r["doc_id"],
                tuple(
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in r["spans"]
                ),
            )
            for r in rows
        )

    serial = key(read_wikipedia_xml(path).take_all())
    dist = key(read_wikipedia_xml_distributed(path, num_tasks=8).take_all())
    assert serial == dist and len(serial) >= 100


def test_multistream_bz2_read():
    """A 2-stream multistream.bz2 + index (the real enwiki layout)
    reads through >= 2 tasks with rows identical to the serial reader
    over the equivalent plain XML."""
    import bz2

    from entity_context_crawler_ray.sources.wikipedia_xml import (
        read_wikipedia_multistream,
        read_wikipedia_xml,
    )

    os.makedirs(BASE, exist_ok=True)
    page = (
        "<page><title>{t}</title><revision><text>"
        "Body of {t} links [[Other {t}]] here.</text></revision></page>"
    )
    s1 = "".join(page.format(t=f"A{i}") for i in range(3)).encode()
    s2 = "".join(page.format(t=f"B{i}") for i in range(2)).encode()
    header = bz2.compress(b"<mediawiki><siteinfo/>")
    blob1, blob2 = bz2.compress(s1), bz2.compress(s2)
    footer = bz2.compress(b"</mediawiki>")
    dump = f"{BASE}/multi.xml.bz2"
    with open(dump, "wb") as fh:
        fh.write(header + blob1 + blob2 + footer)
    off1, off2 = len(header), len(header) + len(blob1)
    with open(f"{BASE}/multi-index.txt", "w") as fh:
        for i in range(3):
            fh.write(f"{off1}:{i}:A{i}\n")
        for i in range(2):
            fh.write(f"{off2}:{10+i}:B{i}\n")

    plain = f"{BASE}/multi-plain.xml"
    with open(plain, "wb") as fh:
        fh.write(b"<mediawiki>" + s1 + s2 + b"</mediawiki>")

    ds = read_wikipedia_multistream(dump, f"{BASE}/multi-index.txt", num_tasks=2)
    got = sorted(r["doc_id"] for r in ds.take_all())
    want = sorted(r["doc_id"] for r in read_wikipedia_xml(plain).take_all())
    assert got == want == [f"A{i}" for i in range(3)] + ["B0", "B1"]


def test_real_fixture_matches_db_invariants(matches_store):
    """Reference suite invariants (test_suite.py:119-129) + offsets,
    plus GOLDEN counts pinned on the immutable fixture so semantic
    drift in the wikitext/cleaner/matcher specs is caught exactly."""
    t = pq.read_table(matches_store)
    assert t.num_rows == 102  # pages (golden)
    assert pc.sum(t["match_count"]).as_py() == 41  # matches (golden)
    assert pc.sum(pc.list_value_length(t["mentions"])).as_py() == 11  # golden
    assert pc.sum(t["link_count"]).as_py() == 13370  # golden
    assert pc.sum(t["entity_link_count"]).as_py() == 23  # golden
    # zero per-page processing errors on real markup
    assert pc.sum(pc.cast(pc.not_equal(t["error"], ""), pa.int64())).as_py() == 0
    # the stored mention is exactly the document span it points at
    checked = 0
    for row in t.to_pylist():
        ct = row["clean_text"]
        for m in row["matches"]:
            assert ct[m["start_char"] : m["end_char"]] == m["mention"]
            checked += 1
    assert checked > 0


def test_real_fixture_contexts_db_invariants(matches_store):
    """build-contexts-db with the reference suite's exact flags
    (test_suite.py:94-102): non-empty contexts + CSV stats."""
    from entity_context_crawler_ray.__main__ import main

    rc = main(
        [
            "build-contexts-db",
            f"{REF_DATA}/entities.json",
            f"{REF_DATA}/irt-ids.txt",
            matches_store,
            f"{BASE}/contexts",
            "--context-size",
            "500",
            "--crop-sentences",
            "--csv-file",
            f"{BASE}/contexts.csv",
            "--limit-contexts",
            "100",
        ]
    )
    assert rc == 0
    t = pq.read_table(f"{BASE}/contexts")
    assert t.num_rows == 29  # golden on the immutable fixture
    assert set(t.schema.names) == {
        "entity",
        "entity_label",
        "mention",
        "page_title",
        "context",
        "masked_context",
    }
    # masking replaced the mention with '#' runs (M23)
    masked = t["masked_context"].to_pylist()
    assert any("#" in m for m in masked)
    with open(f"{BASE}/contexts.csv") as fh:
        lines = [l for l in fh.read().splitlines() if l]
    assert len(lines) > 0 and all("," in l for l in lines)


def test_reference_shuffle_selection_bit_parity():
    """reference_shuffle_selection reproduces the reference's exact
    --limit-entities mechanics (random.seed(str) + shuffle + skip /
    equality-stop quirks), simulated here straight from
    cmd/build_contexts_db.py:188-204 / __main__.py:65-66."""
    import json
    import random

    from entity_context_crawler_ray.pipelines.build_contexts import (
        reference_shuffle_selection,
    )
    from entity_context_crawler_ray.sources.reference_inputs import (
        load_entities_json,
        load_mid2rid_txt,
    )

    with open(f"{REF_DATA}/entities.json") as fh:
        freebase_data = json.load(fh)
    mid2rid = set(load_mid2rid_txt(f"{REF_DATA}/irt-ids.txt")["entity_id"].to_pylist())

    # faithful simulation of the reference loop
    def simulate(limit_entities, seed_str):
        random.seed(seed_str)
        freebase_items = list(freebase_data.items())
        random.shuffle(freebase_items)
        processed = set()
        for entity_count, (mid, entity_data) in enumerate(freebase_items):
            if mid not in mid2rid:
                continue
            if limit_entities and entity_count == limit_entities:
                break
            if not entity_data["wikipedia"]:
                continue
            processed.add(mid)
        return processed

    ents = load_entities_json(f"{REF_DATA}/entities.json")
    ids = ents["entity_id"].to_pylist()
    has_page = {
        e for e, t in zip(ids, ents["page_title"].to_pylist()) if t and e in mid2rid
    }
    for limit, seed in [(50, 42), (200, 7), (5, 42)]:
        got = reference_shuffle_selection(ids, mid2rid, has_page, limit, seed)
        assert got == simulate(limit, str(seed)), (limit, seed)


def test_reference_shuffle_mode_cli(matches_store):
    """--order-mode reference-shuffle end-to-end on the real fixture:
    every produced entity is inside the bit-compatible selection."""
    import json

    from entity_context_crawler_ray.__main__ import main
    from entity_context_crawler_ray.pipelines.build_contexts import (
        reference_shuffle_selection,
    )
    from entity_context_crawler_ray.sources.reference_inputs import (
        load_entities_json,
        load_mid2rid_txt,
    )

    out = f"{BASE}/contexts_refshuffle"
    shutil.rmtree(out, ignore_errors=True)
    rc = main(
        [
            "--random-seed",
            "42",
            "build-contexts-db",
            f"{REF_DATA}/entities.json",
            f"{REF_DATA}/irt-ids.txt",
            matches_store,
            out,
            "--context-size",
            "500",
            "--limit-entities",
            "400",
            "--order-mode",
            "reference-shuffle",
        ]
    )
    assert rc == 0
    ents = load_entities_json(f"{REF_DATA}/entities.json")
    mid2rid = set(load_mid2rid_txt(f"{REF_DATA}/irt-ids.txt")["entity_id"].to_pylist())
    ids = ents["entity_id"].to_pylist()
    has_page = {
        e for e, t in zip(ids, ents["page_title"].to_pylist()) if t and e in mid2rid
    }
    allowed = reference_shuffle_selection(ids, mid2rid, has_page, 400, 42)
    # the contexts 'entity' column stores the RID (reference contexts
    # schema, dao/contexts_db.py) — map the allowed MIDs to rids
    id_map_tbl = load_mid2rid_txt(f"{REF_DATA}/irt-ids.txt")
    rid_of = dict(
        zip(id_map_tbl["entity_id"].to_pylist(), id_map_tbl["rid"].to_pylist())
    )
    allowed_rids = {rid_of[e] for e in allowed}
    got = set(pq.read_table(out)["entity"].to_pylist()) if os.listdir(out) else set()
    assert got and got <= allowed_rids
