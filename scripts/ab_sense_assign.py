"""One sense_assign (flagship) measurement in a fresh JVM, importing the
package from WHEREVER PYTHONPATH points — the A/B harness for comparing
two checked-out code states of the same operator in one host window.

Staging replicates bench.py's sense_assign exactly (documents parquet
lifted to pages + synthetic world at sf scale, cpus*4 partitions, persist,
noop-sink warm-up, min-of-2). No sys.path self-insertion on purpose: the
caller selects the code under test via PYTHONPATH.

Usage: python scripts/ab_sense_assign.py <label> [sf_dir] [cpus]
Prints one JSON line {"label":..,"sense_assign_sec":..,"pages":..}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    label = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from word_sense_disambiguation_spark.datagen import (
        build_world,
        pages_for_scale,
        world_to_spark,
    )
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments
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
    total_pages = pages.count()
    senses = world["senses"].persist()
    senses.count()

    def materialize() -> None:
        sense_assignments(pages, senses).write.mode("overwrite").format(
            "noop"
        ).save()

    materialize()  # warm-up: codegen/JIT + python worker spawn
    best = float("inf")
    for _ in range(2):
        t0 = time.monotonic()
        materialize()
        best = min(best, time.monotonic() - t0)
    print(
        json.dumps(
            {
                "label": label,
                "sense_assign_sec": round(best, 3),
                "pages": total_pages,
                "cpus": cpus,
            }
        )
    )


if __name__ == "__main__":
    main()
