"""Decompose the bench er_cluster's honest COLD cost at bench conditions.

Usage: python scripts/_er_cold_probe.py [reps]
Mirrors bench.py's run_er over the same staged inputs (sf0.1 documents
lifted to pages + synthetic world, local[32], par=cpus*4), but times each
internal phase separately:
  b_sense   — sense_block_star_pairs count
  b_small   — surface_key_pairs small-block count
  b_recov   — oversized_star_pairs recovery count
  b_union   — full union count (re-runs all three: gives the fused cost)
  score     — score_mention_pairs -> persist + match count
  cc        — cluster_mentions tail on the scored edges
  full      — the whole run_er as bench times it (single fused job)
Every phase is cold per rep: per-rep gc between reps, no internal caches
survive (operators release their own).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    import pyspark.sql.functions as F

    from word_sense_disambiguation_spark.datagen import (
        build_world,
        pages_for_scale,
        world_to_spark,
    )
    from word_sense_disambiguation_spark.operators.blocking import (
        oversized_star_pairs,
        sense_block_star_pairs,
        surface_key_pairs,
    )
    from word_sense_disambiguation_spark.operators.clustering import cluster_mentions
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments
    from word_sense_disambiguation_spark.session import get_spark
    from word_sense_disambiguation_spark.sources.pages import pages_from_documents

    spark = get_spark(
        app_name="er_cold_probe",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    par = cpus * 4
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(par)
        .persist()
    )
    docs.count()
    world = world_to_spark(spark, build_world(n_pages=pages_for_scale(sf), seed=42))
    pages = pages_from_documents(docs).unionByName(
        world["pages"].repartition(par)
    ).persist()
    pages.count()
    senses = world["senses"].persist()
    senses.count()

    assignments = sense_assignments(pages, senses).persist()
    assignments.count()

    def a_df():
        return assignments.filter(F.col("decision") != "no_definitions").select(
            "mention_id", "lemma", "pos", "norm_surface", "surface",
            "context_words", "pred_sense_id", "decision",
        )

    def build_pairs(a):
        small, oversized = surface_key_pairs(a, max_block_size=64)
        recovered = oversized_star_pairs(
            a.filter(F.col("decision") != "assigned"), oversized
        )
        return (
            sense_block_star_pairs(a)
            .unionByName(small.select("id_a", "id_b"))
            .unionByName(recovered)
        )

    phases: dict[str, float] = {}
    counts: dict[str, int] = {}

    def timed(name, fn):
        best = float("inf")
        n = None
        for _ in range(reps):
            t0 = time.monotonic()
            n = fn()
            best = min(best, time.monotonic() - t0)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        phases[name] = round(best, 3)
        counts[name] = n

    a = a_df()
    timed("a_count", lambda: a.count())
    timed("b_sense", lambda: sense_block_star_pairs(a).count())
    timed(
        "b_small",
        lambda: surface_key_pairs(a, max_block_size=64)[0]
        .select("id_a", "id_b")
        .count(),
    )

    def recov():
        small, oversized = surface_key_pairs(a, max_block_size=64)
        return oversized_star_pairs(
            a.filter(F.col("decision") != "assigned"), oversized
        ).count()

    timed("b_recov", recov)
    timed("b_union", lambda: build_pairs(a).count())
    timed(
        "score",
        lambda: score_mention_pairs(build_pairs(a), a)
        .filter(F.col("is_match"))
        .count(),
    )

    def full():
        edges = score_mention_pairs(build_pairs(a), a)
        return cluster_mentions(edges).count()

    timed("full", full)
    print(json.dumps({"cpus": cpus, "sf": sf, "phases": phases, "counts": counts}))


if __name__ == "__main__":
    main()
