"""Entity span linking (T14): candidate spans, alias matching, overlap
resolution, the exact-golden world gate, and spans flowing through the ER
stack — mirroring the reference's Entity contract and golden fixture
(``/root/reference/wsd/word_sense_disambiguation.py:45-52,357-372``,
``wsd/test_server.py:162-170``)."""

from __future__ import annotations

import pyspark.sql.functions as F

from word_sense_disambiguation_spark.operators.entities import (
    candidate_spans,
    entity_mentions,
    linked_entities,
)

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
INV_DDL = (
    "entity_id long, name string, description string, url string, "
    "aliases array<string>"
)


def _pages(spark, texts):
    return spark.createDataFrame(
        [(f"u{i}", None, None, t, "en") for i, t in enumerate(texts)],
        schema=PAGES_DDL,
    )


def test_candidate_spans_respect_sentences(spark):
    df = spark.createDataFrame([(1, "alpha beta. gamma")], "id long, text string")
    got = {
        (r.start_token, r.end_token, r.span_key)
        for r in candidate_spans(df, "id", "text", max_span=3).collect()
    }
    # tokens: alpha(0) beta(1) .(2) gamma(3); '.' belongs to sentence 0,
    # gamma to sentence 1 — no span may bridge them.
    assert (0, 1, "alpha beta") in got
    assert (0, 2, "alpha beta .") in got  # '.' is still sentence 0
    assert (3, 3, "gamma") in got
    assert not any(s <= 2 and e >= 3 for s, e, _ in got)


def test_reference_golden_entity_fixture(spark):
    """Exact-value mirror of the reference server test: an alias span links
    to the KB record and reports the CANONICAL label + description + url."""
    pages = _pages(spark, ["Apple unveiled a new device in Cupertino today."])
    inv = spark.createDataFrame(
        [
            (
                312,
                "Apple Inc.",
                "American producer of hardware, software, and services, "
                "based in Cupertino, California",
                "https://www.wikidata.org/wiki/Q312",
                ["Apple"],
            ),
            (44, "Cupertino", "city in California", "https://www.wikidata.org/wiki/Q44", []),
        ],
        schema=INV_DDL,
    )
    rows = sorted(
        linked_entities(pages, inv).collect(), key=lambda r: r.start_token
    )
    assert len(rows) == 2
    first = rows[0].asDict()
    assert first == {
        "url": "u0",
        "entity_id": 312,
        "start_token": 0,
        "end_token": 0,
        "text": "Apple Inc.",
        "span_text": "Apple",
        "description": "American producer of hardware, software, and "
        "services, based in Cupertino, California",
        "entity_url": "https://www.wikidata.org/wiki/Q312",
    }
    assert rows[1].entity_id == 44 and rows[1].start_token == 6


def test_overlap_resolution_longest_then_leftmost(spark):
    inv = spark.createDataFrame(
        [
            (1, "alpha beta", None, None, []),
            (2, "beta gamma", None, None, []),
            (3, "gamma", None, None, []),
            (4, "zorvex industries", None, None, ["zorvex"]),
        ],
        schema=INV_DDL,
    )
    pages = _pages(
        spark,
        [
            "alpha beta gamma arrived.",  # tie on length -> leftmost wins
            "zorvex industries expanded.",  # contained alias loses to name
        ],
    )
    got = {
        (r.url, r.start_token, r.end_token, r.entity_id)
        for r in linked_entities(pages, inv).collect()
    }
    # page 0: 'alpha beta' [0,1] beats 'beta gamma' [1,2]; 'gamma' [2,2]
    # then fits after it.
    assert (("u0", 0, 1, 1)) in got
    assert (("u0", 2, 2, 3)) in got
    assert not any(u == "u0" and eid == 2 for u, _s, _e, eid in got)
    # page 1: the 2-token name wins over its contained 1-token alias
    assert (("u1", 0, 1, 4)) in got
    assert sum(1 for u, *_ in got if u == "u1") == 1


def test_linked_entities_match_world_gold_exactly(spark, sworld):
    """Every planted entity span — and nothing else — is recovered with the
    exact (start, end, canonical text) the generator recorded."""
    linked = linked_entities(sworld["pages"], sworld["entities"])
    got = linked.select(
        "url", "entity_id", "start_token", "end_token", "text", "span_text"
    )
    gold = sworld["gold_entities"]
    assert gold.count() > 10
    assert got.exceptAll(gold).count() == 0
    assert gold.exceptAll(got).count() == 0


def test_entity_spans_flow_through_er_stack(spark):
    """Span mentions cluster across pages by linked entity: blocking ->
    scoring -> connected components (VERDICT r1 item 4's 'Done =')."""
    from word_sense_disambiguation_spark.operators.blocking import (
        sense_block_star_pairs,
    )
    from word_sense_disambiguation_spark.operators.clustering import cluster_mentions
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs

    inv = spark.createDataFrame(
        [
            (100, "Zorvex Industries", "maker of compilers", "https://kb/Q100",
             ["Zorvex"]),
            (101, "Mirelle Vance", "a judge", "https://kb/Q101", []),
        ],
        schema=INV_DDL,
    )
    pages = _pages(
        spark,
        [
            "Zorvex Industries shipped a compiler update.",
            "analysts praised Zorvex for the kernel work.",
            "Zorvex Industries hired engineers.",
            "Mirelle Vance ruled on the appeal.",
        ],
    )
    mentions = entity_mentions(linked_entities(pages, inv))
    pairs = sense_block_star_pairs(mentions)
    edges = score_mention_pairs(pairs, mentions)
    clusters = cluster_mentions(edges)
    joined = {
        r.mention_id: r.entity_id
        for r in clusters.collect()
    }
    m = {r.url: r.mention_id for r in mentions.collect()}
    assert len(m) == 4
    # the three Zorvex mentions (two full-name, one alias) share a cluster
    assert joined[m["u0"]] == joined[m["u1"]] == joined[m["u2"]]
    # which the lone Mirelle Vance mention does not join (star pairs give it
    # no edge; it can be absent from the pair table entirely)
    assert joined.get(m["u3"]) != joined[m["u0"]]
