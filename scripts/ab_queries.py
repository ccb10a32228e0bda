"""One measurement of the four big headline queries in a fresh JVM,
importing the package from WHEREVER PYTHONPATH points — the generalized
A/B harness (same discipline as ab_sense_assign.py: staging replicates
bench.py, caller interleaves legs in one host window, PYTHONPATH selects
the code under test; no sys.path self-insertion on purpose).

Usage: python scripts/ab_queries.py <label> [queries...] [--sf DIR] [--cpus N]
Prints one JSON line {"label":.., "queries": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    label = sys.argv[1]
    args = sys.argv[2:]
    sf_dir = "/root/testdata/sf0.1"
    cpus = 32
    names = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--cpus":
            cpus = int(next(it))
        else:
            names.append(a)
    if not names:
        names = ["sense_assign", "prompt_assign", "er_cluster", "dedup_minhash"]
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
    from word_sense_disambiguation_spark.operators.dedup import (
        minhash_near_duplicate_clusters,
    )
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs
    from word_sense_disambiguation_spark.plans.pipeline import (
        sense_assignments,
        sense_assignments_prompted,
    )
    from word_sense_disambiguation_spark.session import get_spark
    from word_sense_disambiguation_spark.sources.pages import pages_from_documents

    spark = get_spark(
        app_name=f"ab_{label}",
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
    world_pages = world["pages"].repartition(par).persist()
    pages = pages_from_documents(docs).unionByName(world_pages).persist()
    pages.count()
    senses = world["senses"].persist()
    senses.count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()
        return 1

    out: dict[str, float] = {}

    def timed(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)

    if "sense_assign" in names:
        noop(sense_assignments(pages, senses))
        timed("sense_assign", lambda: noop(sense_assignments(pages, senses)))
    if "prompt_assign" in names:
        noop(sense_assignments_prompted(pages, senses))
        timed(
            "prompt_assign",
            lambda: noop(sense_assignments_prompted(pages, senses)),
        )
    if "er_cluster" in names or "dedup_minhash" in names:
        assignments = sense_assignments(pages, senses).persist()
        assignments.count()

        def run_er():
            a = assignments.filter(
                F.col("decision") != "no_definitions"
            ).select(
                "mention_id", "lemma", "pos", "norm_surface", "surface",
                "context_words", "pred_sense_id", "decision",
            ).localCheckpoint(eager=True)
            small, oversized = surface_key_pairs(a, max_block_size=64)
            recovered = oversized_star_pairs(
                a.filter(F.col("decision") != "assigned"), oversized
            )
            pairs = (
                sense_block_star_pairs(a)
                .unionByName(small.select("id_a", "id_b"))
                .unionByName(recovered)
            )
            edges = score_mention_pairs(pairs, a)
            o = cluster_mentions(edges)
            n = o.count()
            o.unpersist(blocking=False)
            return n

        if "er_cluster" in names:
            run_er()
            timed("er_cluster", run_er)
        if "dedup_minhash" in names:
            minhash_near_duplicate_clusters(
                docs, "doc_id", "text", threshold=0.7
            ).count()
            timed(
                "dedup_minhash",
                lambda: minhash_near_duplicate_clusters(
                    docs, "doc_id", "text", threshold=0.7
                ).count(),
            )
        assignments.unpersist()

    print(json.dumps({"label": label, "queries": out, "sf": sf, "cpus": cpus}))


if __name__ == "__main__":
    main()
