"""Evaluation aggregates: accuracy, pairwise F1, disjoint splits.

Re-expresses the reference's benchmark loop
(``/root/reference/wsd/benchmark.py:85-143``): prediction correct iff
predicted sense id equals gold at the same blocking key — as one join +
aggregate. The pairwise-F1 form (the north rule's >=0.99 gate) treats two
labeled mentions at the same blocking key as a *match pair* iff they carry
the same gold sense; predictions match iff both assigned the same sense.

Also the synset-disjoint eval/benchmark split of
``/root/reference/training/wn_data.py:15-39`` as a deterministic
portable-hash partition (no driver-side shuffle of group keys needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predictions_for_gold(assignments: DataFrame, gold: DataFrame) -> DataFrame:
    """Join gold mentions to pipeline predictions on ``(url, lemma)``.

    The generator plants at most one mention per (url, lemma), so this is a
    1:1 equi-join; the positional bookkeeping the reference needs
    (``...py:343-354``) disappears in the relational form.
    """
    pred = assignments.select(
        "url", "lemma", "pos", "decision", "pred_sense_id", "confidence"
    )
    return gold.join(pred, on=["url", "lemma", "pos"], how="left")


def accuracy(assignments: DataFrame, gold: DataFrame) -> DataFrame:
    """Mention-level accuracy (reference's benchmark metric)."""
    j = predictions_for_gold(assignments, gold)
    correct = F.when(
        F.col("is_nota"), F.col("decision") == F.lit("nota")
    ).otherwise(F.col("pred_sense_id") == F.col("gold_sense_id"))
    return j.agg(
        F.count("*").alias("n_examples"),
        F.sum(F.coalesce(correct, F.lit(False)).cast("int")).alias("n_correct"),
        F.avg(F.coalesce(correct, F.lit(False)).cast("double")).alias("accuracy"),
    )


def pairwise_f1(assignments: DataFrame, gold: DataFrame) -> DataFrame:
    """Pairwise-match F1 over labeled mention pairs at the same blocking key.

    Pairs = gold mentions sharing ``(lemma, pos)`` with ``pair_id_a <
    pair_id_b``. Gold match = same non-null gold sense; predicted match =
    both assigned the same sense. Returns one row:
    (tp, fp, fn, precision, recall, f1, n_pairs).

    The self-join is keyed on the blocking key, exactly like the production
    pair generation — so the metric measures the same decision surface the
    pipeline actually exposes at scale.
    """
    p = predictions_for_gold(assignments, gold).select(
        "pair_id", "lemma", "pos", "gold_sense_id", "is_nota",
        "decision", "pred_sense_id",
    )
    a = p.alias("a")
    b = p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lemma") == F.col("b.lemma"))
        & (F.col("a.pos") == F.col("b.pos"))
        & (F.col("a.pair_id") < F.col("b.pair_id")),
    )
    gold_match = (
        ~F.col("a.is_nota")
        & ~F.col("b.is_nota")
        & (F.col("a.gold_sense_id") == F.col("b.gold_sense_id"))
    )
    pred_match = (
        (F.col("a.decision") == "assigned")
        & (F.col("b.decision") == "assigned")
        & (F.col("a.pred_sense_id") == F.col("b.pred_sense_id"))
    )
    agg = pairs.agg(
        F.sum((gold_match & pred_match).cast("long")).alias("tp"),
        F.sum((~gold_match & pred_match).cast("long")).alias("fp"),
        F.sum((gold_match & ~pred_match).cast("long")).alias("fn"),
        F.count("*").alias("n_pairs"),
    )
    return agg.select(
        "tp", "fp", "fn", "n_pairs",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1))).alias("precision"),
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1))).alias("recall"),
        (
            2 * F.col("tp")
            / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1))
        ).alias("f1"),
    )


def disjoint_split(
    examples: DataFrame, key: str = "gold_sense_id", n_buckets: int = 5, seed: int = 42
) -> DataFrame:
    """Group-disjoint split: every row of a ``key`` group lands in the same
    bucket (semantics of ``training/wn_data.py:15-39``), via a portable
    md5 hash (same value in Spark and DuckDB — used by the oracle check)."""
    h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key))), 1, 8), 16, 10)
    return examples.withColumn("bucket", (h.cast("long") % n_buckets).cast("int"))
