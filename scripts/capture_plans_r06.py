"""Capture .explain('formatted') for the headline bench queries into
plans/r06/<query>_<tag>.txt (tag = before/after, argv[1]).

Same staging as bench.py so the plans match what the driver times.
Run standalone (no other Spark work concurrently).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def grab(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out_dir = os.path.join(os.path.dirname(os.path.dirname(__file__)), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

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
    from word_sense_disambiguation_spark.operators.dedup import ngram_jaccard_pairs
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs
    from word_sense_disambiguation_spark.operators.similarity_search import (
        brute_force_topk,
        ivf_index,
        ivf_topk,
        lsh_index,
        lsh_topk,
    )
    from word_sense_disambiguation_spark.operators.textstats import text_profile
    from word_sense_disambiguation_spark.plans.pipeline import (
        sense_assignments,
        sense_assignments_prompted,
    )
    from word_sense_disambiguation_spark.session import get_spark
    from word_sense_disambiguation_spark.sources.pages import pages_from_documents

    spark = get_spark(
        app_name="wsd_plans_r06",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    par = cpus * 4
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .repartition(par)
        .persist()
    )
    docs.count()
    emb_raw = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb_par = max(1, cpus // 4, emb_raw.count() // 2000)
    emb = emb_raw.repartition(emb_par).persist()
    emb.count()
    world = world_to_spark(spark, build_world(n_pages=pages_for_scale(sf), seed=42))
    world_pages = world["pages"].repartition(par).persist()
    pages = pages_from_documents(docs).unionByName(world_pages).persist()
    pages.count()
    senses = world["senses"].persist()
    senses.count()

    def write(name: str, df) -> None:
        if only and name not in only:
            return
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(grab(df))
        print("wrote", path)

    write("sense_assign", sense_assignments(pages, senses))
    write("prompt_assign", sense_assignments_prompted(pages, senses))

    # er_cluster: the scored-edge plan (the pair union + UDF scorer — the
    # part whose physical shape matters; CC is adaptive/iterative).
    assignments = sense_assignments(pages, senses).persist()
    assignments.count()
    a = (
        assignments.filter(F.col("decision") != "no_definitions")
        .select(
            "mention_id", "lemma", "pos", "norm_surface", "surface",
            "context_words", "pred_sense_id", "decision",
        )
        .localCheckpoint(eager=True)
    )
    small, oversized = surface_key_pairs(a, max_block_size=64)
    recovered = oversized_star_pairs(
        a.filter(F.col("decision") != "assigned"), oversized
    )
    pairs = (
        sense_block_star_pairs(a)
        .unionByName(small.select("id_a", "id_b"))
        .unionByName(recovered)
    )
    write("er_cluster_edges", score_mention_pairs(pairs, a))
    assignments.unpersist()

    write(
        "dedup_minhash_verify",
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7),
    )

    q_rows = emb.orderBy("vec_id").limit(8).collect()
    queries_vec = [(int(r.vec_id), list(r.embedding)) for r in q_rows]
    write("ann_topk", brute_force_topk(emb, queries_vec, k=10))
    ivf = ivf_index(emb, n_lists=32, lloyd_iters=1)
    write(
        "ann_ivf",
        ivf_topk(emb, queries_vec, k=10, n_lists=32, n_probe=8, index=ivf),
    )
    lsh = lsh_index(emb).persist()
    lsh.count()
    write("ann_lsh", lsh_topk(emb, queries_vec, k=10, index=lsh))
    write("text_profile", text_profile(docs, "doc_id", "text"))


if __name__ == "__main__":
    main()
