"""Corpus-curation filters: per-site quota sampling + quality rule gates."""

from __future__ import annotations

import pyspark.sql.functions as F

from word_sense_disambiguation_spark.operators.webfilters import (
    quality_rule_flags,
    site_quota_sample,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, schema="url string")


def test_site_quota_deterministic_and_parallelism_invariant(spark):
    rows = [
        (f"https://x/{site}/p{i:04d}",)
        for site in ("alpha", "beta")
        for i in range(50)
    ]
    df = _pages(spark, rows)
    a = sorted(
        (r.site, r.url) for r in site_quota_sample(df, "url", quota=5).collect()
    )
    b = sorted(
        (r.site, r.url)
        for r in site_quota_sample(df.repartition(13), "url", quota=5).collect()
    )
    c = sorted(
        (r.site, r.url)
        for r in site_quota_sample(df.coalesce(1), "url", quota=5).collect()
    )
    assert a == b == c
    assert len(a) == 10 and sum(1 for s, _ in a if s == "alpha") == 5


def test_site_quota_matches_global_topk(spark):
    """The salted two-level top-K must equal the definitional global
    per-site top-K over the same (hash, url) order."""
    from pyspark.sql import Window

    from word_sense_disambiguation_spark.operators.webfilters import (
        _order_hash,
        site_of,
    )

    rows = [(f"https://x/s{i % 7}/page{i:05d}",) for i in range(400)]
    df = _pages(spark, rows)
    got = {
        (r.site, r.url) for r in site_quota_sample(df, "url", quota=3).collect()
    }
    w = Window.partitionBy("site").orderBy("h", "url")
    want = {
        (r.site, r.url)
        for r in df.select(
            site_of(F.col("url")).alias("site"),
            _order_hash(F.col("url"), 42).alias("h"),
            "url",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert got == want and len(got) == 21


def test_site_quota_hot_site_bounded(spark):
    """A hot site larger than quota*salts still yields exactly quota rows
    (and small sites keep everything)."""
    rows = [(f"https://x/hot/p{i:06d}",) for i in range(5000)]
    rows += [(f"https://x/cold/p{i}",) for i in range(3)]
    out = site_quota_sample(_pages(spark, rows), "url", quota=10).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r.site, []).append(r.url)
    assert len(by_site["hot"]) == 10
    assert len(by_site["cold"]) == 3


def test_canonical_url_cases(spark):
    from word_sense_disambiguation_spark.operators.webfilters import canonical_url

    cases = [
        ("https://example.com/a/b", "https://example.com/a/b"),
        ("HTTPS://WWW.Example.COM:443/a/b/", "https://example.com/a/b"),
        ("http://example.com:80/", "http://example.com/"),
        ("http://example.com:8080/x", "http://example.com:8080/x"),  # non-default port kept
        ("https://example.com", "https://example.com/"),
        ("https://example.com//", "https://example.com/"),
        ("https://e.com/p?b=2&a=1", "https://e.com/p?a=1&b=2"),
        (
            "https://e.com/p?utm_source=x&z=1&fbclid=abc&gclid=1&utm_campaign=c",
            "https://e.com/p?z=1",
        ),
        ("https://e.com/p?utm_source=x", "https://e.com/p"),
        ("https://e.com/p#frag", "https://e.com/p"),
        ("https://e.com/p?a=1#frag", "https://e.com/p?a=1"),
        # 'utmx=1' is NOT a tracking param (the rule anchors on utm_)
        ("https://e.com/p?utmx=1", "https://e.com/p?utmx=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], schema="url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_drop_boilerplate_sentences(spark):
    from word_sense_disambiguation_spark.operators.webfilters import (
        drop_boilerplate_sentences,
    )

    banner = "accept our cookies to continue"
    rows = [
        (i, f"{banner}. unique content number {i} here. more text {i}.")
        for i in range(6)
    ]
    rows.append((100, f"{banner}."))  # nothing survives
    rows.append((101, "entirely original document text."))
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {
        r.doc_id: r
        for r in drop_boilerplate_sentences(docs, max_docs=3).collect()
    }
    for i in range(6):
        assert out[i].clean_text == f"unique content number {i} here. more text {i}."
        assert out[i].n_dropped == 1 and out[i].n_kept == 2
    assert out[100].clean_text == "" and out[100].n_kept == 0
    assert out[100].n_dropped == 1
    assert out[101].clean_text == "entirely original document text."
    assert out[101].n_dropped == 0
    # below the document-frequency cutoff nothing is touched
    out_loose = {
        r.doc_id: r
        for r in drop_boilerplate_sentences(docs, max_docs=50).collect()
    }
    assert all(r.n_dropped == 0 for r in out_loose.values())


def test_quality_rule_flags(spark):
    good = " ".join(f"word{i} fine tokens here" for i in range(10)) + "."
    rows = [
        (0, good),
        (1, "short text."),  # fails r_len (< 10 words)
        (2, "@@ ## $$ %% ^^ && ** (( )) !! ~~ ++ == @@ ##"),  # symbols
        (3, ("repeat me. " * 12) + "one different sentence here okay."),
        (4, "a b c d e f g h i j k l m n o p q r s t."),  # mean word len < 3
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r.doc_id: r for r in quality_rule_flags(docs).collect()}
    assert out[0].keep
    assert not out[1].r_len and not out[1].keep
    assert not out[2].r_symbol and not out[2].keep
    assert not out[3].r_dup_sent and not out[3].keep
    assert out[3].dup_sentence_frac > 0.8
    assert not out[4].r_word_len and not out[4].keep
