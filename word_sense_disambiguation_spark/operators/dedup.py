"""Deduplication operator family over document tables.

Exact (hash groupBy), MinHash-LSH, SimHash, n-gram Jaccard, and
embedding-cosine near-dup — the operations a 100 TB training-data pipeline
runs before anything else. All candidate generation is blocked (never
O(n^2)); all verification is either JVM array math or Arrow-batched NumPy.

Design at scale: candidate pairs >> true dups, so every family is
``cheap blocked candidates -> exact verify -> connected components``;
the CC stage reuses :mod:`clustering` (large-star/small-star).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from word_sense_disambiguation_spark.functions.text import WS_CLASS
from word_sense_disambiguation_spark.operators.blocking import minhash_lsh_pairs
from word_sense_disambiguation_spark.operators.clustering import connected_components


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: every row tagged with its canonical id
    (min id among byte-identical texts) and a duplicate flag.

    SKEW-SAFE BY CONSTRUCTION: the min/count per content hash is a
    ``groupBy().agg()`` — map-side partial combine shrinks every map
    partition's contribution to ONE row per distinct hash before the
    shuffle — joined back to the rows on the hash. Identical-byte
    duplicates are exactly where crawl skew lives (empty pages, parked
    domains, boilerplate error pages): a 10^8-row hot hash costs one
    combined row per map partition here, where a
    ``Window.partitionBy(content_hash)`` (the r1-r4 shape) streamed the
    entire hot group through a single spilled window task. Same output;
    a plan test pins HashAggregate-not-Window. The join back is a plain
    shuffle join on the hash — both sides are hash-partitioned on the
    same key, and the agg side carries one row per distinct content.
    """
    hashed = df.select(id_col, text_col).withColumn(
        "content_hash", F.sha2(F.col(text_col), 256)
    )
    groups = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("canonical_id"),
        F.count("*").alias("group_size"),
    )
    return hashed.join(groups, on="content_hash").select(
        F.col(id_col),
        "content_hash",
        "canonical_id",
        (F.col("group_size") > 1).alias("is_duplicate"),
    )


def _token_ngrams(col, n: int):
    """Token n-gram array, pure Spark: slice a split-token array with a
    generated index sequence (stays in whole-stage codegen)."""
    toks = F.split(F.lower(F.trim(col)), WS_CLASS + "+")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.when(F.size(toks) >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    )).otherwise(F.array(F.concat_ws(" ", toks)))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs.

    ``pairs`` defaults to MinHash-LSH candidates (the scale path); passing
    an explicit pair table lets tests verify against a full cross product.
    Jaccard itself is JVM array math: |intersect| / |union|.
    """
    if pairs is None:
        pairs, _ = minhash_lsh_pairs(df, id_col, text_col)
    grams = df.select(
        F.col(id_col).alias("gid"), _token_ngrams(F.col(text_col), n).alias("grams")
    )
    a = grams.select(F.col("gid").alias("id_a"), F.col("grams").alias("grams_a"))
    b = grams.select(F.col("gid").alias("id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    union = F.size(F.array_union("grams_a", "grams_b")).cast("double")
    return (
        pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.greatest(union, F.lit(1.0))).alias("jaccard"),
        )
        .withColumn("is_match", F.col("jaccard") >= threshold)
    )


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC n-gram containment over candidate pairs: ``cont_a =
    |A∩B| / |A|`` and ``cont_b = |A∩B| / |B|`` (Broder 1997's
    containment, the RefinedWeb/quote-inclusion catch). A short document
    fully embedded in a long one scores 1.0 on its own side while
    symmetric Jaccard dilutes toward ``|short|/|long|`` and sails under
    any threshold — containment is how subset duplicates (quoted
    articles, boilerplate-wrapped bodies, partial mirrors) get caught.
    ``is_match`` fires when EITHER side's containment clears the
    threshold.

    Same JVM array-math shape as ``ngram_jaccard_pairs`` (one grams
    projection, two hash joins onto the blocked pair table, per-row
    codegen set ops); each containment is one IEEE division of exact
    integer sizes, divide-by-zero guarded via greatest(|·|, 1) (the
    degenerate short-text gram array is never empty by construction).
    """
    if pairs is None:
        pairs, _ = minhash_lsh_pairs(df, id_col, text_col)
    grams = df.select(
        F.col(id_col).alias("gid"), _token_ngrams(F.col(text_col), n).alias("grams")
    )
    a = grams.select(F.col("gid").alias("id_a"), F.col("grams").alias("grams_a"))
    b = grams.select(F.col("gid").alias("id_b"), F.col("grams").alias("grams_b"))
    inter = F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
    ca = inter / F.greatest(F.size("grams_a").cast("double"), F.lit(1.0))
    cb = inter / F.greatest(F.size("grams_b").cast("double"), F.lit(1.0))
    return (
        pairs.join(a, on="id_a")
        .join(b, on="id_b")
        .select("id_a", "id_b", ca.alias("cont_a"), cb.alias("cont_b"))
        .withColumn(
            "is_match",
            F.greatest(F.col("cont_a"), F.col("cont_b")) >= threshold,
        )
    )


def contamination_check(
    eval_docs: DataFrame,
    train_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Test-set decontamination signal (the GPT-3 appendix-C / C4-analysis
    check): for each EVALUATION document, the fraction of its distinct
    token ``n``-grams that occur anywhere in the TRAINING corpus. Output:
    ``(id, n_grams, n_hit, contamination)`` — one row per eval doc, docs
    with fewer than ``n`` tokens report ``n_grams = 0, contamination 0.0``.

    Scale shape (train side = the 100 TB side): the eval gram set is tiny
    by construction (benchmarks are thousands of docs), so it broadcasts
    into the train scan — the train corpus is filtered MAP-SIDE to only
    grams the eval set mentions, and only those survivors are deduped.
    Never a global distinct of the train grams (that shuffle is the whole
    corpus), never a join with train as build side. Membership keys are
    15-hex-char md5 prefixes (60 bits — exact in a signed long on both
    engines, collision odds negligible at eval-set cardinality); the
    final fraction is one IEEE division. Set ``broadcast_eval=False``
    only when the eval side is itself crawl-sized (falls back to a
    shuffled join). Tokenization mirrors the engine's whitespace
    convention (explicit class, never ``\\s`` — DuckDB-mirrorable).
    Reference analogue: the skip-list anti-join discipline of
    ``/root/reference/training/data/generate.py:148-160`` (exclude
    already-seen items before expensive work), lifted to n-gram grain.
    """

    def gram_hashes(col):
        toks = F.split(F.lower(F.trim(F.coalesce(col, F.lit("")))), WS_CLASS + "+")
        idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - n + 1, F.lit(1)))
        grams = F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n))),
        ).otherwise(F.array().cast("array<string>"))
        return F.array_distinct(
            F.transform(
                grams,
                lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast(
                    "long"
                ),
            )
        )

    ev = eval_docs.select(
        F.col(id_col), F.explode_outer(gram_hashes(F.col(text_col))).alias("gh")
    )
    tr = train_docs.select(F.explode(gram_hashes(F.col(text_col))).alias("gh"))
    ev_set = ev.filter(F.col("gh").isNotNull()).select("gh").distinct()
    if broadcast_eval:
        ev_set = F.broadcast(ev_set)
    hits = tr.join(ev_set, "gh").distinct().withColumn("_hit", F.lit(1))
    return (
        ev.join(hits, on="gh", how="left")
        .groupBy(id_col)
        .agg(
            F.count("gh").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .select(
            id_col,
            "n_grams",
            "n_hit",
            F.when(
                F.col("n_grams") > 0,
                F.col("n_hit").cast("double") / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("contamination"),
        )
    )


def minhash_near_duplicate_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """LSH candidates -> exact Jaccard verify -> CC -> (id, cluster_id).

    Every input row gets a cluster id (singletons cluster with themselves)
    — canonical id = min member, the engine-wide convention.

    Cache ownership (r4 ADVICE, same contract as
    ``clustering.cluster_mentions``): the internal match-edge cache is
    released before returning; the RESULT comes back persisted and
    materialized — the caller owns it and may ``.unpersist()`` it.

    The internal LSH candidate pairs skip the cross-band ``distinct()``
    (``dedup=False`` — one less shuffle stage): the Jaccard verifier is
    row-wise deterministic and CC is duplicate-edge-tolerant, so a pair
    surviving in two bands re-verifies instead of re-shuffling — the same
    argument as the bench ER pair union (r3, CLAUDE.md). Cluster output is
    identical; only the internal pair table may carry duplicates.
    """
    cand_pairs, _ = minhash_lsh_pairs(df, id_col, text_col, dedup=False)
    scored = ngram_jaccard_pairs(
        df, id_col, text_col, n=n, threshold=threshold, pairs=cand_pairs
    )
    edges = scored.filter(F.col("is_match")).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).persist()
    # singletons never enter CC (the overwhelming majority of a real
    # corpus): solve components over actual match edges only, then one
    # left join hands every unmatched row its own id — same rule as
    # clustering.cluster_mentions. The count below materializes the cache
    # AND feeds the CC strategy pick in one action (fused driver round).
    n_edges = edges.count()
    comp = connected_components(
        edges, edge_count=n_edges, input_materialized=True
    )
    out = (
        df.select(F.col(id_col).alias("node"))
        .join(comp, on="node", how="left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
        )
    ).persist()
    out.count()  # materialize the result, then release the edge cache
    edges.unpersist(blocking=False)
    return out


def cluster_representatives(
    clustered: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    score_col: str = "score",
) -> DataFrame:
    """Quality-priority canonical selection: per dup cluster keep the
    HIGHEST-``score`` member (ties -> smallest id), not the min id — the
    RefinedWeb/FineWeb rule (keep the longest/cleanest copy, drop the
    rest). Appends ``rep_id`` and ``is_representative`` to every row.

    SKEW-SAFE: the per-cluster argmax is an AGGREGATE
    (``min_by(id, struct(-score, id))`` — max score then min id, one
    lexicographic ordering key), never a window: a crawl-reality hot
    cluster (10^8 boilerplate copies) contributes one combined row per
    map partition instead of streaming through a single spilled window
    task (the engine-wide assign_senses rule). The join back is a plain
    shuffle join on the cluster key against one row per cluster.
    ``min_by`` (not ``max_by`` of a negated id) so ids only need to be
    ORDERABLE, not negatable — string ids work. NULL scores rank LAST
    (pinned via coalesce to +inf on the negated key, not engine null
    ordering — Spark sorts struct-field NULLs first, DuckDB last, so an
    unpinned null would pick different representatives per engine).
    """
    reps = clustered.groupBy(cluster_col).agg(
        F.expr(
            f"min_by({id_col}, struct("
            f"coalesce(-{score_col}, cast('Infinity' as double)) as _ns,"
            f" {id_col}))"
        ).alias("rep_id")
    )
    return clustered.join(reps, on=cluster_col).select(
        *clustered.columns,
        "rep_id",
        (F.col(id_col) == F.col("rep_id")).alias("is_representative"),
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.7,
    num_perm: int | None = None,
    bands: int | None = None,
    shingle_k: int = 5,
    max_pairs_per_bucket: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """Snapshot-vs-corpus deduplication: tag every NEW document as
    ``exact_dup`` (byte-identical text exists in the corpus), ``near_dup``
    (verified n-gram Jaccard >= ``threshold`` against some corpus doc), or
    ``novel``. This is the standing operation of a crawl pipeline: each new
    snapshot is admitted against the corpus accumulated so far, never
    re-clustered against itself (within-snapshot duplicates are
    :func:`exact_duplicates` / :func:`minhash_near_duplicate_clusters`'
    job and are deliberately out of scope here).

    Returns ``(result, oversized_buckets)``. ``result`` has one row per
    new doc: ``(id, status, matched_id, max_jaccard)`` where ``matched_id``
    is the MINIMUM matching corpus id (the engine-wide canonical
    convention), ``max_jaccard`` the best verified similarity (1.0 for
    exact), both NULL for novel docs — deterministic, no tie-break
    ambiguity.

    Scale shape (corpus = the 100 TB side):

    - Exact stage: the corpus collapses to ONE row per distinct content
      (``groupBy(hash).agg(min(id))`` — map-side partial combine, the
      skew rule of :func:`exact_duplicates`) before the join; a 10^8-copy
      boilerplate page costs one index row. The per-new-row tag join is
      linear in the snapshot.
    - Near stage runs ONLY on new docs that miss the exact index (a
      physical split, not a ``when()`` — the MinHash ``mapInPandas``
      kernel never sees rows the cheap stage already decided, the
      engine's UDF short-circuit rule).
    - Candidates come from a banded MinHash equi-join between the new
      side's band keys and the corpus band index (``minhash_bands``
      output — exactly the table a deployment persists as its standing
      index and unions per admitted snapshot). Hot band buckets (shingle
      boilerplate) are capped by the PRODUCT ``n_new * n_corpus`` per
      key — the actual number of generated pairs — and excluded buckets
      are reported in ``oversized_buckets``, never silently dropped.
    - Verification is JVM array math (``array_intersect``/``array_union``
      over distinct token n-grams, one IEEE division), then a
      ``groupBy(new_id).agg(min, max)`` — partial-combined, so a new doc
      colliding with a million corpus near-copies ships one row per map
      partition.

    Reference analogue: the skip-list discipline of
    ``/root/reference/training/data/generate.py:148-160`` (drop
    already-covered items before expensive scoring), lifted from id grain
    to content grain.
    """
    from word_sense_disambiguation_spark.operators.blocking import (
        DEFAULT_BANDS,
        DEFAULT_NUM_PERM,
        minhash_bands,
    )

    num_perm = DEFAULT_NUM_PERM if num_perm is None else num_perm
    bands = DEFAULT_BANDS if bands is None else bands

    txt = lambda c: F.coalesce(F.col(c), F.lit(""))  # noqa: E731

    # ---- exact stage: one index row per distinct corpus content ----
    exact_index = (
        corpus.select(F.col(id_col).alias("_cid"), F.sha2(txt(text_col), 256).alias("_h"))
        .groupBy("_h")
        .agg(F.min("_cid").alias("_exact_id"))
    )
    tagged = (
        new_docs.select(id_col, text_col)
        .withColumn("_h", F.sha2(txt(text_col), 256))
        .join(exact_index, on="_h", how="left")
    ).localCheckpoint(eager=True)
    # materialize ONCE: `tagged` feeds the near-stage filter, the gram
    # side of verification, and the final assembly — uncheckpointed, the
    # snapshot scan + hash + index join re-runs per consumer (the
    # fan-out rule measured on the bench's er_cluster, BASELINE.md)

    # ---- near stage: only the exact-stage misses enter the kernel ----
    misses = tagged.filter(F.col("_exact_id").isNull()).select(id_col, text_col)
    new_bands = minhash_bands(
        misses, id_col, text_col, num_perm, bands, shingle_k
    ).withColumnRenamed("id", "_nid")
    idx_bands = minhash_bands(
        corpus, id_col, text_col, num_perm, bands, shingle_k
    ).withColumnRenamed("id", "_oid").localCheckpoint(eager=True)
    # the corpus band table is the persistent LSH index: checkpointed
    # because it feeds both the bucket-size caps and the candidate join

    key = ["band_id", "band_hash"]
    n_new = new_bands.groupBy(*key).agg(F.count("*").alias("n_new"))
    n_idx = idx_bands.groupBy(*key).agg(F.count("*").alias("n_corpus"))
    sizes = n_new.join(n_idx, on=key)  # inner: keys on one side only pair nothing
    oversized = sizes.filter(
        F.col("n_new") * F.col("n_corpus") > max_pairs_per_bucket
    )
    cands = (
        new_bands.join(F.broadcast(oversized.select(*key)), on=key, how="left_anti")
        .join(idx_bands, on=key)
        .select("_nid", "_oid")
        .distinct()
    )

    # ---- verify: exact token-n-gram Jaccard, JVM array math ----
    g_new = misses.select(
        F.col(id_col).alias("_nid"), _token_ngrams(txt(text_col), n).alias("_ga")
    )
    g_old = corpus.select(
        F.col(id_col).alias("_oid"), _token_ngrams(txt(text_col), n).alias("_gb")
    )
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    jac = inter / F.greatest(union, F.lit(1.0))
    near = (
        cands.join(g_new, on="_nid")
        .join(g_old, on="_oid")
        .select("_nid", "_oid", jac.alias("_j"))
        .filter(F.col("_j") >= threshold)
        .groupBy("_nid")
        .agg(
            F.min("_oid").alias("_near_id"),
            F.max("_j").alias("_near_j"),
        )
    )

    result = (
        tagged.join(near, tagged[id_col] == near["_nid"], how="left")
        .select(
            F.col(id_col),
            F.when(F.col("_exact_id").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_near_id").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("novel"))
            .alias("status"),
            F.coalesce(F.col("_exact_id"), F.col("_near_id"))
            .cast("long")
            .alias("matched_id"),
            F.when(F.col("_exact_id").isNotNull(), F.lit(1.0))
            .otherwise(F.col("_near_j"))
            .alias("max_jaccard"),
        )
    )
    return result, oversized


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    max_block_size: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """SimHash near-dup candidates via the pigeonhole block trick:
    split the 64-bit fingerprint into ``max_hamming + 1`` chunks — any two
    fingerprints within the Hamming radius agree on >= 1 whole chunk, so a
    per-chunk equi-join finds all of them. Verified by exact Hamming
    distance (``bit_count(a ^ b)``, JVM-side).

    Returns ``(pairs, oversized_chunks)``. The chunk self-join is
    skew-capped through the same ``_pairs_within_blocks`` helper as
    MinHash: a degenerate corpus (thousands of empty/near-identical docs
    -> one hot (chunk_id, chunk_val) bucket) would otherwise make the join
    quadratic; buckets over ``max_block_size`` are excluded from pairing
    and reported in the oversized side table — no silent caps. A pair
    survives iff it collides in >= 1 *non-oversized* chunk bucket (the
    DuckDB oracle mirrors exactly this rule).
    """
    from word_sense_disambiguation_spark.functions.hashing import simhash64_batch
    from word_sense_disambiguation_spark.operators.blocking import (
        _pairs_within_blocks,
    )

    n_chunks = max_hamming + 1
    width = 64 // n_chunks

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # whole-batch kernel: explode+factorize+bit-plane bincount, no
            # per-document python loop (see functions.hashing)
            # explicit ASCII whitespace (functions.text invariant): pandas
            # .str.split() is Unicode-aware and would diverge from the RE2
            # oracle on U+000B / U+00A0-class codepoints
            sh = simhash64_batch(
                pdf[text_col]
                .fillna("")
                .str.lower()
                .str.findall(r"[^ \t\n\r\f\x0B]+")
            )
            yield pd.DataFrame(
                {
                    "sid": pdf[id_col],
                    # uint64 -> signed two's complement (x - 2^63), the
                    # Spark LongType encoding the chunk math expects
                    "simhash": (sh ^ np.uint64(1 << 63)).view(np.int64),
                }
            )

    id_type = dict(df.dtypes)[id_col]
    # checkpoint once: the signature table feeds the chunk explosion AND
    # both hamming-verify sides — uncheckpointed, Catalyst re-runs the
    # kernel per consumer (same rule as minhash_lsh_pairs)
    hashed = (
        df.select(id_col, text_col)
        .mapInPandas(run, schema=f"sid {id_type}, simhash long")
        .localCheckpoint(eager=True)
    )
    # explode into (chunk_id, chunk_value) block keys
    chunks = hashed.select(
        "sid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("chunk_id"),
                    F.shiftright(F.col("simhash"), c * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    ).alias("chunk_val"),
                )
                for c in range(n_chunks)
            ])
        ).alias("ch"),
    ).select("sid", "ch.chunk_id", "ch.chunk_val")
    raw, oversized = _pairs_within_blocks(
        chunks, "sid", ["chunk_id", "chunk_val"], max_block_size
    )
    cand = raw.select("id_a", "id_b").distinct()
    a = hashed.select(F.col("sid").alias("id_a"), F.col("simhash").alias("sim_a"))
    b = hashed.select(F.col("sid").alias("id_b"), F.col("simhash").alias("sim_b"))
    pairs = (
        cand.join(a, on="id_a")
        .join(b, on="id_b")
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs, oversized


def embedding_near_duplicates(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bits: int = 12,
    seed: int = 42,
    max_block_size: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """Embedding cosine near-dup: random-hyperplane LSH buckets -> exact
    cosine verify. Reuses the ANN machinery from similarity_search.

    Returns ``(matches, oversized_buckets)``: the bucket self-join is
    skew-capped through ``_pairs_within_blocks`` (a hot bucket — e.g. a
    corpus dominated by one embedding cluster, or the all-zeros bucket of
    degenerate vectors — would otherwise go quadratic); dropped buckets
    are reported, never silently lost.
    """
    from word_sense_disambiguation_spark.operators.blocking import (
        _pairs_within_blocks,
    )
    from word_sense_disambiguation_spark.operators.similarity_search import (
        hyperplane_buckets,
    )

    # checkpoint once: sigs feeds bucket counting, the anti-join, and both
    # verify sides — uncheckpointed, the signature scan re-runs per subtree
    sigs = hyperplane_buckets(df, id_col, vec_col, bits=bits, seed=seed)
    sigs = sigs.localCheckpoint(eager=True)
    raw, oversized = _pairs_within_blocks(
        sigs.select("vid", "bucket"), "vid", ["bucket"], max_block_size
    )
    cand = raw.select("id_a", "id_b").distinct()
    a = sigs.select(F.col("vid").alias("id_a"), F.col("vec").alias("vec_a"))
    b = sigs.select(F.col("vid").alias("id_b"), F.col("vec").alias("vec_b"))
    joined = cand.join(a, on="id_a").join(b, on="id_b")
    dot = F.aggregate(
        F.zip_with("vec_a", "vec_b", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    cos = dot / F.greatest(norm(F.col("vec_a")) * norm(F.col("vec_b")), F.lit(1e-12))
    matches = joined.select("id_a", "id_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
    return matches, oversized


def duplicate_span_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact duplicated-substring spans, the ExactSubstr dedup policy
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better") re-expressed relationally at token-window grain.

    Every ``n``-token window whose content hash occurs MORE THAN ONCE in
    the corpus (cross-doc or intra-doc) is a duplicated substring
    occurrence. The globally first occurrence — minimal ``(doc_id, pos)``
    — is canonical and kept; every other occurrence is removable.
    Non-canonical windows are merged per document into maximal token
    spans (gaps-and-islands over window starts; a window starting at or
    before the previous covered end + 1 fuses — covered regions are
    contiguous because consecutive in-island starts are <= n apart).

    Output, one row per input document (clean docs report zeros):
    ``(doc_id, n_tokens, n_dup_windows, n_spans, dup_tokens,
    dup_fraction)`` where ``dup_tokens`` is the token count covered by
    removable spans and ``dup_fraction`` is the single IEEE division
    ``dup_tokens / n_tokens``.

    Scale shape (the 100 TB contract):

    - Window generation is a map-side explode of a generated position
      sequence — no shuffle, no per-doc buffering beyond the token array.
    - Duplicate detection is ONE ``groupBy(h)`` with map-side partial
      combine: the count and the ``min(struct(doc_id, pos))`` canonical
      pick both partial-aggregate, so a 10^8-occurrence boilerplate
      window (crawl reality: cookie banners, nav bars) costs one row per
      map partition — never a windowed buffer (same discipline as the
      post-r4 ``exact_duplicates``). The agg is a SortAggregate (struct
      buffer), which is exactly the assign_senses precedent.
    - The join back is occurrence-side on ``h`` with ONE row per
      duplicated hash on the build side — no row amplification, and a
      hot hash is AQE-skew-splittable because each probe row matches
      exactly one build row.
    - Span merge is a doc-bounded window (buffer <= windows per doc),
      the same bound accepted for ``repetition_stats``'s tie-break.

    Tokenization is the engine's oracle-mirrorable convention: explicit
    whitespace class (never ``\\s`` — Java/RE2 divergence), lower/trim/
    null-coalesce; window keys are 60-bit md5-prefix integers, exact in
    a signed long on both engines (same scheme as
    :func:`contamination_check`). Reference parity anchor: the
    reference's skip-already-covered discipline in
    ``/root/reference/training/data/generate.py:148-160``; the span
    policy itself is public literature (Lee et al. 2022 §4.1), which the
    reference does not implement — this is added training-pipeline
    surface.
    """
    toks = F.split(
        F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), WS_CLASS + "+"
    )
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("t"),
    ).select("doc_id", "t", F.size("t").cast("long").alias("n_tokens"))

    # (doc_id, pos, h): one row per n-token window, map-side only.
    occ = (
        base.filter(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.size("t") - (n - 1))).alias("pos"),
            "t",
        )
        .select(
            "doc_id",
            "pos",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(F.col("t"), F.col("pos"), n))),
                    1,
                    15,
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )

    dups = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct(F.col("doc_id"), F.col("pos"))).alias("canon"),
        )
        .filter(F.col("c") > 1)
        .select("h", "canon")
    )
    flagged = (
        occ.join(dups, "h")
        .filter(
            ~(
                (F.col("doc_id") == F.col("canon.doc_id"))
                & (F.col("pos") == F.col("canon.pos"))
            )
        )
        .select("doc_id", "pos")
    )

    # Gaps-and-islands: break when this window starts past the previous
    # covered end + 1 (NULL prev on the first row also breaks).
    ws = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + (n - 1)).over(
        ws.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = flagged.withColumn(
        "brk",
        F.when(prev_end >= F.col("pos") - 1, F.lit(0)).otherwise(F.lit(1)),
    ).withColumn(
        "island", F.sum("brk").over(ws.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"),
        (F.max("pos") + (n - 1)).alias("e"),
        F.count(F.lit(1)).alias("wins"),
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_tokens"),
        F.sum("wins").cast("long").alias("n_dup_windows"),
    )
    return (
        base.select("doc_id", "n_tokens")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.when(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) > 0,
                F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame,
    threshold: float = 0.8,
    idf_scale: int = 1_000,
) -> DataFrame:
    """TF-IDF cosine over blocked candidate pairs — the classic token-
    weighted record-linkage/near-dup measure (Cohen, Ravikumar &
    Fienberg 2003's TF-IDF family): shared RARE tokens count, shared
    boilerplate ('the', nav chrome) is idf-damped to noise, which is
    exactly what raw Jaccard gets wrong on template-heavy web text.

    Float discipline (the ``distinctive_terms`` idf + ``er_eval_bcubed``
    sum rules): weights are INTEGER ``w = tf * ((N * idf_scale) DIV
    df)``; dot products and squared norms are DECIMAL(38,0) sums of
    integer products (exact, associative — never an order-dependent
    float sum); the output is ``cos2 = dot^2 / (norm2_a * norm2_b)``
    computed as ONE fixed IEEE tree over DOUBLE casts of those exact
    integers. cos2 is monotone in cosine (weights are nonnegative), so
    thresholding/ranking on it is thresholding on cosine with the bound
    squared — ``is_match = cos2 >= threshold^2`` — and no sqrt ever
    enters (sqrt is where cross-engine float replay usually dies).
    Either side empty (zero norm) -> NULL cos2, never-match (CASE).
    Size ``idf_scale`` so ``N * idf_scale * max_tf < 2^63``; the
    DECIMAL(38,0) sums absorb the squares.

    Plan shape: ONE (doc, token) tf aggregate; df derives from the tf
    table (second partial-combined groupBy — never countDistinct over
    the raw explode); norms contract to one row per doc; the dot
    product attaches pair ids to side-a weights, equi-joins side-b on
    (doc, token), and contracts per pair — all equi-joins and combined
    aggregates, pair-token linear, no window, no cartesian. ``pairs``
    is the caller's blocking (LSH/SimHash candidates); never feed a
    cross join. Reference parity anchor: the weighted-overlap scoring
    family of ``score_mention_pairs``
    (/root/reference/wsd/word_sense_disambiguation.py:194-217), lifted
    to corpus-frequency weights.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    tf = (
        df.select(F.col(id_col).alias("did"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("did", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("dfr"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).withColumn("_k", F.lit(1))
    w = (
        tf.join(dfreq, on="token")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), on="_k")
        .select(
            "did",
            "token",
            F.expr(f"tf * ((n_docs * {int(idf_scale)}) DIV dfr)").alias("w"),
        )
    )
    norms = w.groupBy("did").agg(
        F.sum(F.expr("CAST(w * w AS DECIMAL(38,0))")).alias("norm2")
    )
    pa = pairs.select("id_a", "id_b")
    left = pa.join(w.withColumnRenamed("did", "id_a"), on="id_a").select(
        "id_a", "id_b", "token", F.col("w").alias("wa")
    )
    dots = (
        left.join(
            w.select(
                F.col("did").alias("id_b"),
                "token",
                F.col("w").alias("wb"),
            ),
            on=["id_b", "token"],
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.expr("CAST(wa * wb AS DECIMAL(38,0))")).alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_common"),
        )
    )
    cos2 = (
        "CASE WHEN norm2_a IS NULL OR norm2_b IS NULL"
        " OR norm2_a = 0 OR norm2_b = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE (CAST(coalesce(dot, 0) AS DOUBLE) * CAST(coalesce(dot, 0) AS DOUBLE))"
        "      / (CAST(norm2_a AS DOUBLE) * CAST(norm2_b AS DOUBLE)) END"
    )
    thr2 = float(threshold) * float(threshold)
    return (
        pa.join(dots, on=["id_a", "id_b"], how="left")
        .join(
            norms.select(F.col("did").alias("id_a"), F.col("norm2").alias("norm2_a")),
            on="id_a",
            how="left",
        )
        .join(
            norms.select(F.col("did").alias("id_b"), F.col("norm2").alias("norm2_b")),
            on="id_b",
            how="left",
        )
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
            F.expr(cos2).alias("cos2"),
        )
        .withColumn(
            "is_match",
            F.when(F.col("cos2").isNull(), F.lit(False)).otherwise(
                F.col("cos2") >= F.lit(thr2)
            ),
        )
    )


def dedup_impact(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    group_cols: tuple[str, ...] = ("lang", "source"),
    size_col: str = "n_chars",
) -> DataFrame:
    """Dataset-card impact report of a dedup clustering: per corpus
    slice, how many documents and how much payload the keep-one-per-
    cluster policy retains — the numbers a curation run publishes
    (RefinedWeb/FineWeb-style "X% of tokens removed by dedup" tables)
    and the sanity gate before a destructive materialization.

    Keep rule: the engine-wide canonical representative, min id per
    cluster (swap in ``cluster_representatives`` upstream for
    quality-priority keeps — this report only needs SOME keep set).
    Documents absent from ``clusters`` count as kept singletons, so the
    report composes with partial/incremental clusterings.

    Output, one row per ``group_cols`` slice: ``n_docs, n_kept,
    n_dropped`` (BIGINT), ``chars_total, chars_kept`` (BIGINT,
    NULL-size rows count 0), and ``doc_drop_ratio / char_drop_ratio``
    — each ONE fixed IEEE expression over exact integers
    (``1.0 - kept/total``, NULL on an empty denominator), so the whole
    report hash-replays on any engine.

    Scale shape: representatives contract with ONE partial-combined
    ``groupBy(cluster)`` min; two equi-joins attach cluster + keep flag
    (no window — a 10^8-member boilerplate cluster contracts map-side);
    the final ``groupBy(group_cols)`` is partial-combined into a
    handful of slice rows. Reference parity anchor: the kept/dropped
    accounting discipline of `filter_prompts_by_length`
    (/root/reference/training/train.py:374-396's dropped-count warning) applied to the dedup decision.
    """
    reps = clusters.groupBy(cluster_col).agg(
        F.min(id_col).alias("_keep_id")
    )
    sz = F.coalesce(F.col(size_col).cast("long"), F.lit(0).cast("long"))
    flagged = (
        docs.select(id_col, *group_cols, sz.alias("_sz"))
        .join(clusters.select(id_col, cluster_col), on=id_col, how="left")
        .join(reps, on=cluster_col, how="left")
        .select(
            *group_cols,
            "_sz",
            F.coalesce(
                F.col(id_col) == F.col("_keep_id"), F.lit(True)
            ).alias("_kept"),
        )
    )
    agg = flagged.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum("_sz").cast("long").alias("chars_total"),
        F.sum(F.when(F.col("_kept"), F.col("_sz")).otherwise(0))
        .cast("long")
        .alias("chars_kept"),
    )
    return agg.select(
        *group_cols,
        "n_docs",
        "n_kept",
        (F.col("n_docs") - F.col("n_kept")).cast("long").alias("n_dropped"),
        "chars_total",
        "chars_kept",
        F.expr(
            "CASE WHEN n_docs = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE 1.0D - CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE) END"
        ).alias("doc_drop_ratio"),
        F.expr(
            "CASE WHEN chars_total = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE 1.0D - CAST(chars_kept AS DOUBLE)"
            " / CAST(chars_total AS DOUBLE) END"
        ).alias("char_drop_ratio"),
    )


def prefix_filter_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold_pct: int = 70,
    max_block_size: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """EXACT all-pairs Jaccard similarity join via prefix filtering
    (Chaudhuri/Bayardo/PPJoin family) — the deterministic complement to
    the MinHash path: LSH trades false negatives for speed; the prefix
    filter has a COMPLETENESS GUARANTEE (every pair with J >= t shares
    at least one prefix token) and, in this engine, ZERO floats — the
    threshold is an integer percent, so both the prefix length
    ``|d| - ceil(t·|d|) + 1`` and the verify ``100·|x∩y| >=
    t·|x∪y|`` are exact integer arithmetic (``ceil`` spelled as
    ``(t·len + 99) DIV 100``).

    Why the candidate set stays small: each document's tokens sort by
    GLOBAL RARITY (count ASC, token ASC — a total order both engines
    replay), and only the first ``prefix_len`` — the rarest — tokens
    block. Common tokens (stopwords, boilerplate) fall out of prefixes
    of any document long enough to survive the threshold, so blocks
    concentrate on discriminative tokens. Residual hot prefix-token
    blocks (e.g. a corpus of near-identical short docs — where the TRUE
    output is itself quadratic) are capped at ``max_block_size`` and
    surfaced in the returned ``oversized`` table, the house no-silent-
    drop contract; completeness holds exactly for every pair untouched
    by the cap.

    Scale shape: distinct (doc, token) membership and global token
    counts are partial-combined groupBys; the per-doc rarity rank is a
    DOC-BOUNDED window (the ``distinctive_terms`` class — partitioned
    by document, never by a corpus-level hot key); candidate pairs come
    from the capped within-block self-join on prefix tokens;
    intersection sizes contract token-linearly per pair (the
    ``tfidf_cosine`` join shape, no array materialization per pair);
    the verify is one integer comparison. Empty documents have no
    tokens, hence no prefix, hence never pair (J with an empty set is
    0 for any nonempty partner; the empty-empty pair is undefined and
    deliberately not emitted).

    Returns ``(matches, oversized)``: matches = (id_a, id_b, n_inter,
    n_union, jaccard) with id_a < id_b, jaccard the ONE IEEE division
    of the exact counts; oversized = (token, block_size).
    """
    from pyspark.sql import Window

    from word_sense_disambiguation_spark.functions.text import WS_CLASS

    tq = int(threshold_pct)
    if not 0 < tq <= 100:
        raise ValueError("threshold_pct must be in (0, 100]")
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    membership = (
        df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).alias("_dup"))
        .select("_id", "token")
    )
    sizes = membership.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("_len")
    )
    freq = membership.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("_freq")
    )
    ranked = membership.join(freq, on="token").withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy("_id").orderBy(
                F.asc("_freq"), F.asc("token")
            )
        ),
    )
    prefix = (
        ranked.join(sizes, on="_id")
        .filter(
            F.col("_rn")
            <= F.col("_len")
            - F.expr(f"({tq}L * _len + 99L) DIV 100L")
            + F.lit(1)
        )
        .select("token", "_id")
    )
    from word_sense_disambiguation_spark.operators.blocking import (
        _pairs_within_blocks,
    )

    cand, oversized = _pairs_within_blocks(
        prefix, "_id", ["token"], max_block_size
    )
    pairs = cand.select("id_a", "id_b").distinct()
    inter = (
        membership.select(F.col("_id").alias("id_a"), "token")
        .join(pairs, on="id_a")
        .join(
            membership.select(F.col("_id").alias("id_b"), "token"),
            on=["id_b", "token"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_len").alias("_na"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_len").alias("_nb"))
    matches = (
        inter.join(sa, on="id_a")
        .join(sb, on="id_b")
        .withColumn(
            "n_union",
            (F.col("_na") + F.col("_nb") - F.col("n_inter")).cast("long"),
        )
        .filter(F.col("n_inter") * 100 >= F.lit(tq) * F.col("n_union"))
        .select(
            "id_a",
            "id_b",
            "n_inter",
            "n_union",
            F.expr(
                "CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)"
            ).alias("jaccard"),
        )
    )
    return matches, oversized.select("token", "block_size")
