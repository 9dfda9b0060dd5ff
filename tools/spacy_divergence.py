"""Quantify the deterministic tokenizer spec's divergence from a real
spaCy pipeline on the reference's 100-page integration fixture
(reference tests/integration/data/; the reference loads
``en_core_web_lg`` at cmd/build_matches_db.py:220).

Runs stage 1 twice — ``tokenizer='spec'`` vs ``tokenizer='spacy'`` —
over the same dump + entity catalog and reports set differences of the
(page, entity_id, mention, start_char, end_char) match tuples and the
(entity_id, mention) mention pairs.  Append the table to NOTES.md.

Requires the ``spacy`` package (not installed in this sandbox — the
script exits with a clear message; it never fakes the comparison).

Usage: python tools/spacy_divergence.py [dump.xml entities.json]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_DATA = "/root/reference/tests/integration/data"


def main() -> int:
    try:
        import spacy  # noqa: F401
    except ImportError:
        print(
            "spacy is not installed — the conformance comparison needs the "
            "real pipeline (pip install spacy; python -m spacy download "
            "en_core_web_sm).  The deterministic spec remains the tested "
            "default (tests/test_reference_fixture.py)."
        )
        return 2

    dump = sys.argv[1] if len(sys.argv) > 1 else f"{REF_DATA}/wikipedia.xml"
    ents = sys.argv[2] if len(sys.argv) > 2 else f"{REF_DATA}/entities.json"

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from entity_context_crawler_ray.pipelines.build_matches import (
        build_matches,
        matches_view,
        mentions_view,
    )
    from entity_context_crawler_ray.sources.reference_inputs import load_entities_json
    from entity_context_crawler_ray.sources.wikipedia_xml import read_wikipedia_xml

    docs = read_wikipedia_xml(dump).materialize()
    catalog = load_entities_json(ents)

    def run(tokenizer: str):
        combined = build_matches(docs, catalog, tokenizer=tokenizer).materialize()
        m = matches_view(combined).to_pandas()
        matches = set(
            map(
                tuple,
                m[["page", "entity_id", "mention", "start_char", "end_char"]]
                .itertuples(index=False),
            )
        )
        mm = mentions_view(combined).to_pandas()
        mentions = set(map(tuple, mm[["entity_id", "mention"]].itertuples(index=False)))
        return matches, mentions

    spec_matches, spec_mentions = run("spec")
    spacy_matches, spacy_mentions = run("spacy")

    both = len(spec_matches & spacy_matches)
    print("| set | spec only | spacy only | both | agreement |")
    print("| --- | --- | --- | --- | --- |")
    for name, a, b in (
        ("matches", spec_matches, spacy_matches),
        ("mentions", spec_mentions, spacy_mentions),
    ):
        inter = len(a & b)
        union = len(a | b) or 1
        print(
            f"| {name} | {len(a - b)} | {len(b - a)} | {inter} "
            f"| {inter / union:.4f} |"
        )
    for t in sorted(spec_matches ^ spacy_matches)[:10]:
        side = "spec" if t in spec_matches else "spacy"
        print(f"  diff[{side}]: {t}")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
