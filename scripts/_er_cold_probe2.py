"""Second-level decomposition of the bench er_cluster cold cost.

Times each layer against a MATERIALIZED input (localCheckpoint), so the
number is that layer's own cost, not its upstream's:
  pairs_ckpt   — pair-union build + localCheckpoint (eager)
  score_only   — score_mention_pairs over checkpointed pairs -> match count
  cm_only      — cluster_mentions over checkpointed scored edges
  union_ckpt_a — pair union with `a` itself checkpointed first
Also: variant of the full run with `a` checkpointed (full_ckpt_a).
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
        app_name="er_cold_probe2",
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

    def timed(name, fn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        phases[name] = round(best, 3)

    a = a_df()

    # fixed checkpointed inputs for the per-layer timings (built once)
    pairs_m = build_pairs(a).localCheckpoint(eager=True)
    edges_m = score_mention_pairs(pairs_m, a).localCheckpoint(eager=True)

    timed("pairs_ckpt", lambda: build_pairs(a).localCheckpoint(eager=True).count())
    timed(
        "score_only",
        lambda: score_mention_pairs(pairs_m, a).filter(F.col("is_match")).count(),
    )

    def cm_only():
        out = cluster_mentions(edges_m)
        n = out.count()
        out.unpersist(blocking=False)
        return n

    timed("cm_only", cm_only)

    def union_ckpt_a():
        am = a.localCheckpoint(eager=True)
        return build_pairs(am).count()

    timed("union_ckpt_a", union_ckpt_a)

    def full_ckpt_a():
        am = a.localCheckpoint(eager=True)
        edges = score_mention_pairs(build_pairs(am), am)
        out = cluster_mentions(edges)
        n = out.count()
        out.unpersist(blocking=False)
        return n

    timed("full_ckpt_a", full_ckpt_a)
    print(json.dumps({"cpus": cpus, "sf": sf, "phases": phases}))


if __name__ == "__main__":
    main()
