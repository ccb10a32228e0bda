"""Decompose the full 3-stage ER job's parallelism-independent tail.

Usage: python scripts/_tail_probe.py <cores> <n_pages> [reps]
Prints one JSON line with per-phase walls, mirroring _flagship_run's
run_full but with timers around each serial barrier:
  assign_ckpt  — sense_assignments -> filter/select -> localCheckpoint
  edge_count   — scored-edge persist + match count (cluster_mentions fuse)
  cc_solve     — connected_components on the match edges
  result_mat   — all_ids left-join comp -> persist + count
  sink         — noop save of the persisted result
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cores = int(sys.argv[1])
    n_pages = int(sys.argv[2])
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    import pyspark.sql.functions as F

    from word_sense_disambiguation_spark.datagen import build_world, world_to_spark
    from word_sense_disambiguation_spark.operators.blocking import (
        oversized_star_pairs,
        sense_block_star_pairs,
        surface_key_pairs,
    )
    from word_sense_disambiguation_spark.operators.clustering import (
        connected_components,
    )
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments
    from word_sense_disambiguation_spark.session import get_spark

    spark = get_spark(
        app_name=f"tail{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    world = world_to_spark(spark, build_world(n_pages=n_pages, seed=42))
    pages = world["pages"].repartition(cores * 4).persist()
    n = pages.count()
    senses = world["senses"].persist()
    senses.count()

    def one_rep() -> dict:
        ph: dict[str, float] = {}
        t0 = time.monotonic()
        a = (
            sense_assignments(pages, senses)
            .filter(F.col("decision") != "no_definitions")
            .select(
                "mention_id", "lemma", "pos", "norm_surface", "surface",
                "context_words", "pred_sense_id", "decision",
            )
            .localCheckpoint(eager=True)
        )
        ph["assign_ckpt"] = time.monotonic() - t0

        t0 = time.monotonic()
        small, oversized = surface_key_pairs(a, max_block_size=64)
        recovered = oversized_star_pairs(
            a.filter(F.col("decision") != "assigned"), oversized
        )
        prs = (
            sense_block_star_pairs(a)
            .unionByName(small.select("id_a", "id_b"))
            .unionByName(recovered)
        )
        edges = score_mention_pairs(prs, a)
        me = edges.select("id_a", "id_b", "is_match").persist()
        n_match = me.filter(F.col("is_match")).count()
        ph["edge_count"] = time.monotonic() - t0

        t0 = time.monotonic()
        matches = me.filter(F.col("is_match")).select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        )
        comp = connected_components(
            matches, edge_count=n_match, input_materialized=True
        ).persist()
        n_comp = comp.count()
        ph["cc_solve"] = time.monotonic() - t0

        t0 = time.monotonic()
        all_ids = (
            me.select(F.col("id_a").alias("node"))
            .union(me.select(F.col("id_b")))
            .distinct()
        )
        out = all_ids.join(comp, on="node", how="left").select(
            F.col("node").alias("mention_id"),
            F.coalesce(F.col("component"), F.col("node")).alias("entity_id"),
        ).persist()
        out.count()
        ph["result_mat"] = time.monotonic() - t0

        t0 = time.monotonic()
        out.write.mode("overwrite").format("noop").save()
        ph["sink"] = time.monotonic() - t0
        ph["n_match"] = n_match
        ph["n_comp"] = n_comp
        me.unpersist(blocking=False)
        comp.unpersist(blocking=False)
        out.unpersist(blocking=False)
        return ph

    best = None
    for _ in range(reps):
        ph = one_rep()
        if best is None or sum(
            v for k, v in ph.items() if k not in ("n_match", "n_comp")
        ) < sum(v for k, v in best.items() if k not in ("n_match", "n_comp")):
            best = ph
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)
    total = sum(v for k, v in best.items() if k not in ("n_match", "n_comp"))
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n,
                "phases": {k: round(v, 3) if isinstance(v, float) else v
                           for k, v in best.items()},
                "total": round(total, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
