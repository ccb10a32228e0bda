"""One flagship-throughput measurement in a fresh JVM (used by scaling.py).

Usage: python scripts/_flagship_run.py <cores> <n_pages> <reps>
Prints one JSON line: {"cores":..,"n_pages":..,"best_sec":..,"docs_per_sec":..}
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
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from word_sense_disambiguation_spark.datagen import build_world, world_to_spark
    from word_sense_disambiguation_spark.plans.pipeline import sense_assignments
    from word_sense_disambiguation_spark.session import get_spark

    spark = get_spark(
        app_name=f"flagship{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )
    world = world_to_spark(spark, build_world(n_pages=n_pages, seed=42))
    pages = world["pages"].repartition(cores * 4).persist()
    n = pages.count()
    senses = world["senses"].persist()
    senses.count()

    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        sense_assignments(pages, senses).count()
        best = min(best, time.monotonic() - t0)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_pages": n,
                "best_sec": round(best, 3),
                "docs_per_sec": round(n / best, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
