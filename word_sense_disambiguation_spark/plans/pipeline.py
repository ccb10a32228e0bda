"""End-to-end pipeline DAG: pages -> mentions -> candidates -> assignments.

The Spark re-expression of the reference's request lifecycle
(``/root/reference/wsd/word_sense_disambiguation.py:375-403``, SURVEY §3.1):
one linear DataFrame DAG whose only shuffles are (a) the per-mention window
in :func:`assign_senses` and (b) nothing else — the inventory join is
broadcast, tokenization/context is a single scan. At cluster scale the plan
is embarrassingly page-parallel until the tiny candidate-set aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from word_sense_disambiguation_spark.operators.candidates import candidates_for_mentions
from word_sense_disambiguation_spark.operators.scoring import (
    assign_senses,
    score_candidates,
)
from word_sense_disambiguation_spark.operators.tokenize import (
    mentions_from_pages,
    mentions_from_pages_sql,
)


def sense_assignments(
    pages: DataFrame, senses: DataFrame, use_html: bool = False
) -> DataFrame:
    """pages + inventory -> per-mention sense assignments (the flagship query).

    Uses the JVM-only mention extractor (whole-stage codegen, scales with
    cores) unless ``use_html`` demands python-side byte extraction; the two
    extractors are row-identical (tested), so the choice is purely physical.
    """
    if use_html:
        mentions = mentions_from_pages(pages, use_html=True)
    else:
        mentions = mentions_from_pages_sql(pages)
    cands = candidates_for_mentions(mentions, senses)
    scored = score_candidates(cands)
    return assign_senses(scored)


def sense_assignments_prompted(
    pages: DataFrame, senses: DataFrame
) -> DataFrame:
    """The prompt-path flagship: the reference's actual inference flow
    (SURVEY §3.1 steps 5-6) — build a multiple-choice prompt per mention,
    score it with the batched 128-way scorer, decode the probability
    vector. Exists alongside the columnar path to prove the engine carries
    the full prompt/letter/scorer contract end-to-end; results agree with
    the columnar path on the gold fixtures (tested).

    PHYSICAL SHORT-CIRCUIT (the engine-wide python-boundary rule): on a
    crawl-heavy corpus ~90% of mentions have an EMPTY candidate set — their
    decision is ``no_definitions`` with confidence 0.0 regardless of any
    scoring — yet the naive plan ships them through the mapInPandas scorer
    as null prompts, paying the Arrow round-trip of the fat passthrough
    columns (definitions/sense_ids arrays, marked sentence) for rows the
    python side only zero-fills. They are split out BEFORE the scorer and
    union'd back as literal rows; both branches read the same grouped
    aggregate (one Exchange, reused). Mentions with n_defs > 127 (prompt
    NULL by the letter-window rule) stay on the scorer branch so their
    degenerate decode is byte-identical to the unsplit plan.
    """
    from pyspark.sql import functions as F

    from word_sense_disambiguation_spark.operators.mlm_scorer import (
        decode_probabilities,
        score_prompts,
    )
    from word_sense_disambiguation_spark.operators.prompts import build_prompts

    mentions = mentions_from_pages_sql(pages)
    cands = candidates_for_mentions(mentions, senses)
    grouped = (
        cands.groupBy(
            "url", "mention_id", "position", "surface", "lemma", "pos",
            "context_words",
        )
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("sense_id").isNotNull(),
                        F.struct("sense_rank", "sense_id", "sense_definition"),
                    )
                )
            ).alias("cands")
        )
        .withColumn("definitions", F.transform("cands", lambda c: c["sense_definition"]))
        .withColumn("sense_ids", F.transform("cands", lambda c: c["sense_id"]))
        .withColumn("n_defs", F.size("definitions"))
        .withColumn(
            "marked_sentence",
            F.concat(
                F.lit("*"), F.col("surface"), F.lit("* "),
                F.concat_ws(" ", "context_words"),
            ),
        )
        .drop("cands")
    )
    prompted = build_prompts(
        grouped.filter(F.col("n_defs") > 0), word_col="surface"
    )
    scored = score_prompts(prompted.drop("context_words"))
    decoded = decode_probabilities(scored, n_defs_col="n_defs")
    from_scorer = decoded.select(
        "url",
        "mention_id",
        "position",
        "surface",
        "lemma",
        "pos",
        F.when(F.col("is_nota_pred"), F.lit("nota"))
        .otherwise(F.lit("assigned"))
        .alias("decision"),
        F.when(
            ~F.col("is_nota_pred"),
            F.element_at(F.col("sense_ids"), F.col("choice_index") + 1),
        ).alias("pred_sense_id"),
        "confidence",
    )
    # n_defs == 0 rows decode deterministically (zero vector -> is_nota
    # forced, total 0 -> confidence 0.0) — emit the literals directly.
    no_defs = grouped.filter(F.col("n_defs") == 0).select(
        "url",
        "mention_id",
        "position",
        "surface",
        "lemma",
        "pos",
        F.lit("no_definitions").alias("decision"),
        F.lit(None).cast("string").alias("pred_sense_id"),
        F.lit(0.0).alias("confidence"),
    )
    return from_scorer.unionByName(no_defs)
