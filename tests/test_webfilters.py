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
    good = (
        "the quality "
        + " ".join(f"word{i} fine tokens here" for i in range(10))
        + " of prose."
    )
    bullets = "\n".join(f"- item number{i} listed" for i in range(20)) + (
        "\nthe single plain line of text here with several proper words."
    )
    teasers = "\n".join(
        f"the teaser number{i} of stories continues..." for i in range(10)
    )
    rows = [
        (0, good),
        (1, "short text."),  # fails r_len (< 10 words)
        (2, "@@ ## $$ %% ^^ && ** (( )) !! ~~ ++ == @@ ##"),  # symbols
        (3, ("repeat me. " * 12) + "one different sentence here okay."),
        (4, "a b c d e f g h i j k l m n o p q r s t."),  # mean word len < 3
        # no Gopher stop words at all (word soup) -> fails r_stopwords
        (5, " ".join(f"token{i} filler payload words" for i in range(8)) + "."),
        (6, bullets),   # 20/21 bullet lines -> fails r_bullet
        (7, teasers),   # 10/10 ellipsis lines -> fails r_ellipsis
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r.doc_id: r for r in quality_rule_flags(docs).collect()}
    assert out[0].keep and out[0].r_stopwords and out[0].n_stop_words >= 2
    assert not out[1].r_len and not out[1].keep
    assert not out[2].r_symbol and not out[2].keep
    assert not out[3].r_dup_sent and not out[3].keep
    assert out[3].dup_sentence_frac > 0.8
    assert not out[4].r_word_len and not out[4].keep
    assert not out[5].r_stopwords and not out[5].keep
    assert out[5].n_stop_words == 0
    assert not out[6].r_bullet and not out[6].keep
    assert 0.9 < out[6].bullet_line_ratio < 1.0
    assert out[6].r_ellipsis  # bullets don't trip the ellipsis rule
    assert not out[7].r_ellipsis and not out[7].keep
    assert out[7].ellipsis_line_ratio == 1.0
    assert out[7].r_bullet


def test_canonical_url_bare_tracking_and_malformed(spark):
    """ADVICE r3: bare valueless tracking params must drop, and inputs
    without a scheme://host shape canonicalize to NULL instead of the
    degenerate '://' prefix (which would merge every malformed url into
    one giant dedup group)."""
    from word_sense_disambiguation_spark.operators.webfilters import canonical_url

    cases = [
        ("https://e.com/p?fbclid", "https://e.com/p"),
        ("https://e.com/p?utm_source", "https://e.com/p"),
        ("https://e.com/p?fbclid&a=1", "https://e.com/p?a=1"),
        # a *different* param that merely shares the prefix is kept
        ("https://e.com/p?fbclid2=zz", "https://e.com/p?fbclid2=zz"),
        # percent-hex normalizes to UPPERCASE (RFC 3986 canonical form);
        # a '%' not followed by two hex digits is left byte-identical
        ("https://e.com/a%7eb?x=%2fv", "https://e.com/a%7Eb?x=%2Fv"),
        ("https://e.com/a%7Eb", "https://e.com/a%7Eb"),
        ("https://e.com/100%zz", "https://e.com/100%zz"),
        ("https://e.com/p%", "https://e.com/p%"),
        # DNS root-label trailing dot strips (after default-port removal)
        ("https://e.com./p", "https://e.com/p"),
        ("https://E.COM.:443/p", "https://e.com/p"),
        ("not a url at all", None),
        ("/relative/path?x=1", None),
        ("example.com/no-scheme", None),
        ("://", None),
        ("", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], schema="url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_site_quota_plan_is_window_not_collect_list(spark):
    """OOM-safety regression (ADVICE r3): the per-site top-K must run
    through spillable Window groups — a collect_list aggregation buffers
    a hot site's full (site, salt) membership in memory before any slice
    applies, which is exactly the 10^8-page-site OOM."""
    df = _pages(spark, [("https://x/a/p1",), ("https://x/a/p2",)])
    plan = (
        site_quota_sample(df, "url", quota=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan
    assert "collect_list" not in plan


def test_site_quota_hot_site_exact_set(spark):
    """On a heavily skewed input the salted two-level window form must
    still return exactly the global hash-smallest quota rows."""
    from pyspark.sql import Window

    from word_sense_disambiguation_spark.operators.webfilters import (
        _order_hash,
        site_of,
    )

    rows = [(f"https://x/hot/p{i:06d}",) for i in range(5000)]
    rows += [(f"https://x/cold/p{i}",) for i in range(3)]
    df = _pages(spark, rows)
    got = {(r.site, r.url) for r in site_quota_sample(df, "url", quota=10).collect()}
    w = Window.partitionBy("site").orderBy("h", "url")
    want = {
        (r.site, r.url)
        for r in df.select(
            site_of(F.col("url")).alias("site"),
            _order_hash(F.col("url"), 42).alias("h"),
            "url",
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    assert got == want
    assert sum(1 for s, _ in got if s == "hot") == 10
    assert sum(1 for s, _ in got if s == "cold") == 3


def test_quality_rule_flags_vertical_tab_engine_parity(spark):
    """ADVICE r3: Java \\s includes U+000B while DuckDB's RE2 \\s does
    not — the explicit whitespace class must keep the Spark operator and
    the driver oracle SQL identical on vertical-tab corpora."""
    import os
    import sys

    import duckdb

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    txt = (
        "alpha\x0bbeta gamma delta epsilon zeta eta theta iota kappa lambda mu."
    )
    docs = spark.createDataFrame([(0, txt)], schema="doc_id long, text string")
    srow = quality_rule_flags(docs).collect()[0]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (0, ?)", [txt])
    orow = con.execute(entrymod.oracle_sql()["quality_rule_flags"]).fetchone()
    # columns: doc_id, n_words, mean_word_len, symbol_ratio,
    #          dup_sentence_frac, n_stop_words, bullet_line_ratio,
    #          ellipsis_line_ratio, r_*..., keep (last)
    assert srow.n_words == orow[1] == 12  # the VT splits alpha/beta
    assert srow.mean_word_len == orow[2]
    assert srow.symbol_ratio == orow[3]
    assert srow.n_stop_words == orow[5]
    assert srow.keep == orow[-1]


def test_redact_pii(spark):
    from word_sense_disambiguation_spark.operators.webfilters import redact_pii

    rows = [
        (0, "write to a.b+c@mail.example.org or admin@x.io today"),
        (1, "server at 192.168.0.1 and 10.0.0.254 up"),
        (2, "call +4915112345678 or 030-555-1234 now"),
        (3, "clean text with no pii at all"),
        (4, "mixed bob@corp.example 127.0.0.1 +12125551234"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r.doc_id: r for r in redact_pii(docs).collect()}
    assert out[0].clean_text == "write to <EMAIL> or <EMAIL> today"
    assert out[0].n_emails == 2 and out[0].n_ips == 0 and out[0].n_phones == 0
    assert out[1].clean_text == "server at <IP> and <IP> up"
    assert out[1].n_ips == 2
    assert out[2].clean_text == "call <PHONE> or <PHONE> now"
    assert out[2].n_phones == 2
    assert out[3].clean_text == rows[3][1]
    assert (out[3].n_emails, out[3].n_ips, out[3].n_phones) == (0, 0, 0)
    assert out[4].clean_text == "mixed <EMAIL> <IP> <PHONE>"


def test_pack_documents_layout(spark):
    """Offsets are a contiguous per-shard concatenation, chunk spans use
    capacity windows (straddles allowed), and the layout is invariant to
    input partitioning."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        pack_documents,
    )

    rows = [(i, " ".join(f"t{j}" for j in range(5 + (i * 7) % 23))) for i in range(60)]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = pack_documents(docs, capacity=16, shards=4).collect()
    assert len(out) == 60
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) <= {0, 1, 2, 3}
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r.start_offset)
        off = 0
        for r in rs:
            assert r.start_offset == off  # contiguous, no gaps
            assert r.chunk_first == r.start_offset // 16
            assert r.chunk_last == max(r.start_offset + r.n_tokens - 1, r.start_offset) // 16
            off += r.n_tokens
    # at least one straddler with capacity 16 and docs of 5..27 tokens
    assert any(r.chunk_last > r.chunk_first for r in out)
    out2 = pack_documents(docs.repartition(13), capacity=16, shards=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_pack_documents_null_text_packs_as_zero(spark):
    """ADVICE r4: a null text row must deterministically pack as 0 tokens
    (coalesce before trim) on ANY sizeOfNull config — a NULL n_tokens
    would corrupt the shard's whole running-sum layout downstream."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        pack_documents,
    )

    rows = [(0, "alpha beta gamma"), (1, None), (2, ""), (3, "delta")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {r.doc_id: r for r in pack_documents(docs, capacity=4, shards=2).collect()}
    assert len(out) == 4
    assert out[1].n_tokens == 0 and out[1].start_offset is not None
    assert out[2].n_tokens == 0
    # zero-token docs occupy a zero-width span: chunk_first == chunk_last
    assert out[1].chunk_first == out[1].chunk_last
    # layout stays contiguous per shard despite the null rows
    by_shard = {}
    for r in out.values():
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.start_offset)
        off = 0
        for r in rs:
            assert r.start_offset == off
            off += r.n_tokens


def test_mixture_sample_exact_and_parallelism_invariant(spark):
    """mixture_sample must match a hashlib replay exactly (copies =
    floor(r) + [hash32 < frac*2^32]), drop unlisted groups, and be
    partitioning-invariant (pure function of the row id)."""
    import hashlib

    from word_sense_disambiguation_spark.operators.webfilters import (
        mixture_sample,
    )

    rows = [(i, ["en", "de", "zh", "xx"][i % 4]) for i in range(400)]
    docs = spark.createDataFrame(rows, schema="doc_id long, lang string")
    rates = {"en": 0.5, "de": 2.25, "zh": 1.0}
    out = mixture_sample(docs, rates, "doc_id", "lang").collect()

    def expected(doc_id, lang):
        r = rates.get(lang, 0.0)
        u32 = int(hashlib.md5(f"mix:{doc_id}".encode()).hexdigest()[:8], 16)
        thr = int(round((r - int(r)) * 2**32))
        return int(r) + (1 if u32 < thr else 0)

    want = sorted(
        (i, lang, c)
        for i, lang in rows
        for c in range(1, expected(i, lang) + 1)
    )
    assert sorted((r.doc_id, r.lang, r.copy_id) for r in out) == want
    # every de doc keeps >= 2 copies; xx (absent) fully dropped
    per = {}
    for r in out:
        per.setdefault((r.doc_id, r.lang), []).append(r.copy_id)
    assert all(len(v) >= 2 for (_, lang), v in per.items() if lang == "de")
    assert not any(lang == "xx" for (_, lang) in per)
    # expected-copies calibration: en keeps roughly half (hash uniformity)
    n_en = sum(1 for (_, lang) in per if lang == "en")
    assert 30 <= n_en <= 70
    # parallelism invariance
    out1 = mixture_sample(docs.coalesce(1), rates, "doc_id", "lang").collect()
    out7 = mixture_sample(docs.repartition(7), rates, "doc_id", "lang").collect()
    key = lambda rws: sorted((r.doc_id, r.lang, r.copy_id) for r in rws)
    assert key(out1) == key(out7) == key(out)


def test_filter_blocklisted_hosts_semantics(spark):
    """Domain blocklist: exact host match, subdomain-under-rule match,
    most-specific (longest) rule wins, label boundaries respected
    (notexample.com is NOT under example.com), null host unblocked."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        filter_blocklisted_hosts,
    )

    df = spark.createDataFrame(
        [
            (1, "ads.tracker.example.com"),
            (2, "example.com"),
            (3, "good.org"),
            (4, "deep.sub.bad.net"),
            (5, "com"),
            (6, "notexample.com"),
            (7, None),
            (8, "a.b.c.d.e.f.g.h.i.j.k.bad.net"),  # deeper than max_depth
        ],
        "id long, host string",
    )
    bl = spark.createDataFrame(
        [("example.com",), ("bad.net",), ("sub.bad.net",)], "rule string"
    )
    out = {r.id: r for r in filter_blocklisted_hosts(df, bl).collect()}
    assert out[1].blocked and out[1].matched_rule == "example.com"
    assert out[2].blocked and out[2].matched_rule == "example.com"
    assert not out[3].blocked and out[3].matched_rule is None
    assert out[4].blocked and out[4].matched_rule == "sub.bad.net"  # most specific
    assert not out[5].blocked  # a bare label matches only a bare-label rule
    assert not out[6].blocked  # label boundary: not a dot-suffix
    assert not out[7].blocked
    # the suffix is anchored at the host TAIL: a 12-label host still
    # matches a 2-label rule even though max_depth=8
    assert out[8].blocked and out[8].matched_rule == "bad.net"


def test_filter_blocklisted_hosts_plan_is_broadcast_only(spark):
    """The corpus side must NEVER shuffle: the plan is a chain of
    broadcast hash joins (one per suffix depth) over a single scan — no
    SortMergeJoin, no exchange on the data spine. The only shuffle in
    the whole plan is the blocklist's own tiny distinct."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        filter_blocklisted_hosts,
    )

    df = spark.createDataFrame([(1, "x.example.com")], "id long, host string")
    bl = spark.createDataFrame([("example.com",)], "rule string")
    plan = (
        filter_blocklisted_hosts(df, bl)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 8


def test_quality_classifier_default_vs_python_replay(spark):
    """Default hash-weights path replays exactly in python: integer
    milli-weights, exact BIGINT logit, single IEEE division."""
    import hashlib
    import re

    from word_sense_disambiguation_spark.operators.webfilters import (
        quality_classifier_scores,
    )

    rows = [
        (1, "Good Wiki prose here"),
        (2, "spam spam spam"),
        (3, None),
        (4, ""),
        (5, "Mixed CASE   tokens\twith\nwhitespace variety"),
    ]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_classifier_scores(df).collect()}

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001 - 1000

    for did, txt in rows:
        toks = re.split("[ \t\n\r\f\x0b]+", (txt or "").lower().strip())
        logit = sum(w(t) for t in toks)
        r = got[did]
        assert r["n_tokens"] == len(toks)
        assert r["logit_milli"] == logit
        assert r["score"] == logit / (1000.0 * len(toks))
        assert r["keep"] == (logit > 0)


def test_quality_classifier_learned_path_matches_default(spark):
    """The broadcast learned-vocab path with derived weights equals the
    zero-shuffle default path; missing vocab entries contribute 0."""
    import hashlib
    import re

    from word_sense_disambiguation_spark.operators.webfilters import (
        quality_classifier_scores,
    )

    rows = [(i, f"tok{i % 5} shared words tok{i % 3} tail{i}") for i in range(20)]
    df = spark.createDataFrame(rows, schema="doc_id long, text string")

    def w(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % 2001 - 1000

    vocab = sorted(
        {t for _, txt in rows for t in re.split("[ \t\n\r\f\x0b]+", txt.lower())}
    )
    wt = spark.createDataFrame(
        [(t, w(t)) for t in vocab], schema="token string, w_milli long"
    )
    a = sorted(map(tuple, quality_classifier_scores(df).collect()))
    b = sorted(map(tuple, quality_classifier_scores(df, weights=wt).collect()))
    assert a == b
    # partial vocab: dropped tokens contribute exactly 0
    wt_partial = spark.createDataFrame(
        [(t, w(t)) for t in vocab if not t.startswith("shared")],
        schema="token string, w_milli long",
    )
    part = {
        r["doc_id"]: r
        for r in quality_classifier_scores(df, weights=wt_partial).collect()
    }
    full = {r["doc_id"]: r for r in quality_classifier_scores(df).collect()}
    for did in part:
        assert part[did]["logit_milli"] == full[did]["logit_milli"] - w("shared")
        assert part[did]["n_tokens"] == full[did]["n_tokens"]


def test_quality_classifier_default_plan_no_shuffle(spark):
    """The 100 TB pin: the default hash-weights path is one codegen'd
    scan-stage expression — no Exchange, no explode-join."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        quality_classifier_scores,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = (
        quality_classifier_scores(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]
    assert "Join" not in plan, plan[:1500]


def test_curation_pipeline_composition(spark):
    """End-to-end curation: a too-short doc dies at the quality gate, a
    byte-identical duplicate loses keep-best to its longer... equal copy
    (tie -> min id), and the packed layout covers exactly the kept
    representatives with chunk arithmetic intact."""
    import pyspark.sql.functions as F

    from word_sense_disambiguation_spark.operators.dedup import (
        cluster_representatives,
        minhash_near_duplicate_clusters,
    )
    from word_sense_disambiguation_spark.operators.webfilters import (
        pack_documents,
        quality_rule_flags,
    )

    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu"
    docs = spark.createDataFrame(
        [(1, good, len(good)), (2, good, len(good)),
         (3, "tiny", 4),
         (4, good.replace("alpha", "omega"), len(good))],
        "doc_id long, text string, n_chars long",
    )
    flags = quality_rule_flags(docs, min_stop_words=0)
    surv = docs.join(flags.filter(F.col("keep")).select("doc_id"), on="doc_id")
    assert sorted(r.doc_id for r in surv.collect()) == [1, 2, 4]
    clusters = minhash_near_duplicate_clusters(surv, "doc_id", "text", threshold=0.7)
    scored = clusters.join(surv.select("doc_id", "n_chars"), on="doc_id")
    reps = cluster_representatives(scored, "doc_id", "cluster_id", "n_chars")
    kept = surv.join(
        reps.filter(F.col("is_representative")).select("doc_id"), on="doc_id"
    )
    kept_ids = sorted(r.doc_id for r in kept.collect())
    assert 3 not in kept_ids and 1 in kept_ids  # dup pair {1,2} -> min id 1
    assert 2 not in kept_ids
    packed = pack_documents(kept, capacity=8, shards=2).collect()
    assert sorted(r.doc_id for r in packed) == kept_ids
    for r in packed:
        assert r.chunk_first == r.start_offset // 8
        assert r.chunk_last >= r.chunk_first


def test_path_rollup_prefix_tree(spark):
    """Each url contributes one row per prefix depth 0..min(segs, cap);
    malformed/NULL urls are excluded; value sums are exact."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        path_rollup,
    )

    rows = [
        ("https://a.com/x/y/z/w?q=1", 10),   # 4 segs, capped at depth 3
        ("https://a.com/x/y", 5),
        ("https://a.com/", 1),
        ("HTTP://b.org/solo#f", 2),          # scheme case, fragment cut
        ("not a url", 99),
        (None, 7),
    ]
    df = spark.createDataFrame(rows, "url string, n long")
    out = {
        (r.host, r.depth, r.path_prefix): (r.n_docs, r.sum_n)
        for r in path_rollup(df, "url", "n", max_depth=3).collect()
    }
    assert out == {
        ("a.com", 0, "/"): (3, 16),
        ("a.com", 1, "/x"): (2, 15),
        ("a.com", 2, "/x/y"): (2, 15),
        ("a.com", 3, "/x/y/z"): (1, 10),
        ("b.org", 0, "/"): (1, 2),
        ("b.org", 1, "/solo"): (1, 2),
    }


def test_path_rollup_no_value_col_and_invariance(spark):
    from word_sense_disambiguation_spark.operators.webfilters import (
        path_rollup,
    )

    rows = [(f"https://h{i % 3}.net/p{i % 5}/q{i % 7}",) for i in range(300)]
    df = spark.createDataFrame(rows, "url string")
    a = path_rollup(df.coalesce(1), "url").collect()
    b = path_rollup(df.repartition(11), "url").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r.n_docs for r in a if r.depth == 0} == {100}


def test_extract_links_scope_and_order(spark):
    """Absolute http(s) hrefs only, document order, both quote styles,
    attr-case-insensitive; relative/mailto/unquoted and NULL html
    produce nothing."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        extract_links,
    )

    rows = [
        ("https://a.com/p",
         '<a href="https://b.org/x">x</a> mid '
         "<a HREF = 'http://c.net/y'>y</a> "
         '<a href="/rel">r</a> <a href="mailto:z@q.w">m</a> '
         "<a href=http://unquoted.example/u>u</a>"),
        ("https://d.io/q", None),
        ("https://e.gov", "<p>no links</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = [tuple(r) for r in extract_links(df, "url", "html").collect()]
    assert out == [
        ("https://a.com/p", "a.com", "https://b.org/x", "b.org", 0),
        ("https://a.com/p", "a.com", "http://c.net/y", "c.net", 1),
    ]


def test_extract_links_hub_page_linear(spark):
    """A hub page with many links yields one row per link, positions
    contiguous — row-local explode, no buffering assumptions."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        extract_links,
    )

    html = " ".join(
        f'<a href="https://t{i}.example/p">l</a>' for i in range(200)
    )
    df = spark.createDataFrame([("https://hub.example", html)],
                               "url string, html string")
    out = extract_links(df, "url", "html").collect()
    assert len(out) == 200
    assert [r.position for r in out] == list(range(200))
    assert out[7].dst_host == "t7.example"


def test_anchor_profile_counts_hosts_and_top(spark):
    """Whitespace-only anchors count as inlinks but never as top;
    top-anchor ties break lexicographically ASC; nested markup yields
    empty direct text -> NULL top; hosts are distinct."""
    from word_sense_disambiguation_spark.operators.webfilters import (
        anchor_profile,
    )

    rows = [
        ("https://a.com/1",
         '<a href="https://t.example/x">Best Page</a> '
         '<a href="https://t.example/x" class="z">Best Page</a> '
         "<a href='https://t.example/x'>\t \n</a>"),
        ("https://b.org/2",
         '<a href="https://t.example/x">other</a> '
         '<a href="https://t.example/y"><b>nested</b></a>'),
        ("https://a.com/3", '<a href="https://t.example/x">other</a>'),
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    out = {r.dst_url: r for r in anchor_profile(df, "url", "html").collect()}
    x = out["https://t.example/x"]
    assert (x.n_inlinks, x.n_src_hosts) == (5, 2)
    assert x.top_anchor == "Best Page"     # 2-2 tie vs 'other' -> ASC
    y = out["https://t.example/y"]
    assert (y.n_inlinks, y.n_src_hosts, y.top_anchor) == (1, 1, None)


def test_anchor_profile_parallelism_invariant(spark):
    from word_sense_disambiguation_spark.operators.webfilters import (
        anchor_profile,
    )

    rows = [
        (f"https://h{i % 4}.net/{i}",
         f'<a href="https://t{i % 6}.example/p">a{i % 3}</a>')
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "url string, html string")
    a = anchor_profile(df.coalesce(1), "url", "html").collect()
    b = anchor_profile(df.repartition(11), "url", "html").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
