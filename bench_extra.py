"""Per-stage isolation probes for the headline bench queries (r06).

NOT the driver bench — ``bench.py`` is frozen for measurement. This file
exists so optimization work can attribute each headline query's wall to its
stages (guide §1.4: noop sink so Catalyst can't prune the scored columns;
§1.5: labelled jobs). Staging mirrors bench.py exactly (same repartitioned
persisted inputs) so stage sums are comparable to the headline rows.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python bench_extra.py [query ...]
Prints one JSON line: {"stages": {name: best_sec, ...}, "sf": ..}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    only = set(sys.argv[1:])

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
    from word_sense_disambiguation_spark.operators.candidates import (
        candidates_for_mentions,
    )
    from word_sense_disambiguation_spark.operators.clustering import cluster_mentions
    from word_sense_disambiguation_spark.operators.dedup import (
        minhash_near_duplicate_clusters,
        ngram_jaccard_pairs,
    )
    from word_sense_disambiguation_spark.operators.blocking import minhash_lsh_pairs
    from word_sense_disambiguation_spark.operators.mlm_scorer import (
        decode_probabilities,
        score_prompts,
    )
    from word_sense_disambiguation_spark.operators.pairs import score_mention_pairs
    from word_sense_disambiguation_spark.operators.prompts import build_prompts
    from word_sense_disambiguation_spark.operators.scoring import (
        assign_senses,
        score_candidates,
    )
    from word_sense_disambiguation_spark.operators.similarity_search import (
        lsh_index,
        lsh_topk,
    )
    from word_sense_disambiguation_spark.operators.tokenize import (
        mentions_from_pages_sql,
    )
    from word_sense_disambiguation_spark.plans.pipeline import (
        sense_assignments,
        sense_assignments_prompted,
    )
    from word_sense_disambiguation_spark.session import get_spark
    from word_sense_disambiguation_spark.sources.pages import pages_from_documents

    spark = get_spark(
        app_name="wsd_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    sc = spark.sparkContext

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
    n_pages = pages_for_scale(sf)
    world = world_to_spark(spark, build_world(n_pages=n_pages, seed=42))
    world_pages = world["pages"].repartition(par).persist()
    pages = pages_from_documents(docs).unionByName(world_pages).persist()
    pages.count()
    senses = world["senses"].persist()
    senses.count()

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    stages: dict[str, float] = {}

    def timed(name, fn, reps=2):
        sc.setJobDescription(name)
        best = float("inf")
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            best = min(best, time.monotonic() - t0)
        sc.setJobDescription(None)
        stages[name] = round(best, 3)

    def want(q):
        return not only or q in only

    # ---- sense_assign decomposition -------------------------------------
    if want("sense_assign"):
        noop(sense_assignments(pages, senses))  # warm-up
        timed("sa_mentions", lambda: noop(mentions_from_pages_sql(pages)))
        timed(
            "sa_candidates",
            lambda: noop(candidates_for_mentions(mentions_from_pages_sql(pages), senses)),
        )
        timed(
            "sa_score_lesk",
            lambda: noop(
                score_candidates(
                    candidates_for_mentions(mentions_from_pages_sql(pages), senses),
                    use_cosine=False,
                )
            ),
        )
        timed(
            "sa_score_cos",
            lambda: noop(
                score_candidates(
                    candidates_for_mentions(mentions_from_pages_sql(pages), senses)
                )
            ),
        )
        timed("sa_full", lambda: noop(sense_assignments(pages, senses)))
        timed(
            "sa_full_lesk",
            lambda: noop(
                assign_senses(
                    score_candidates(
                        candidates_for_mentions(
                            mentions_from_pages_sql(pages), senses
                        ),
                        use_cosine=False,
                    )
                )
            ),
        )

    # ---- prompt_assign decomposition ------------------------------------
    # NOTE: pa_grouped / pa_prompts / pa_scored deliberately replicate the
    # r5 (pre-split) aggregate shape so before/after stage attribution is
    # possible; pa_full runs whatever pipeline.sense_assignments_prompted
    # currently ships (the r6 pre-aggregate split).
    if want("prompt_assign"):
        noop(sense_assignments_prompted(pages, senses))  # warm-up

        def grouped_df():
            mentions = mentions_from_pages_sql(pages)
            cands = candidates_for_mentions(mentions, senses)
            return (
                cands.groupBy(
                    "url", "mention_id", "position", "surface", "lemma", "pos",
                    "context_words",
                )
                .agg(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("sense_id").isNotNull(),
                                F.struct(
                                    "sense_rank", "sense_id", "sense_definition"
                                ),
                            )
                        )
                    ).alias("cands")
                )
                .withColumn(
                    "definitions",
                    F.transform("cands", lambda c: c["sense_definition"]),
                )
                .withColumn(
                    "sense_ids", F.transform("cands", lambda c: c["sense_id"])
                )
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

        timed("pa_grouped", lambda: noop(grouped_df()))
        timed(
            "pa_prompts",
            lambda: noop(
                build_prompts(
                    grouped_df().filter(F.col("n_defs") > 0), word_col="surface"
                )
            ),
        )
        timed(
            "pa_scored",
            lambda: noop(
                score_prompts(
                    build_prompts(
                        grouped_df().filter(F.col("n_defs") > 0),
                        word_col="surface",
                    ).drop("context_words")
                )
            ),
        )
        timed("pa_full", lambda: noop(sense_assignments_prompted(pages, senses)))

    # ---- er_cluster decomposition ---------------------------------------
    if want("er_cluster"):
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

        def pair_union():
            small, oversized = surface_key_pairs(a, max_block_size=64)
            recovered = oversized_star_pairs(
                a.filter(F.col("decision") != "assigned"), oversized
            )
            return (
                sense_block_star_pairs(a)
                .unionByName(small.select("id_a", "id_b"))
                .unionByName(recovered)
            )

        timed("er_pairs", lambda: noop(pair_union()))
        timed("er_scored", lambda: noop(score_mention_pairs(pair_union(), a)))
        timed(
            "er_scored_nojw",
            lambda: noop(score_mention_pairs(pair_union(), a, w_jw=0.0)),
        )
        timed(
            "er_scored_nocos",
            lambda: noop(score_mention_pairs(pair_union(), a, w_cos=0.0)),
        )

        def full_er():
            edges = score_mention_pairs(pair_union(), a)
            out = cluster_mentions(edges)
            n = out.count()
            out.unpersist(blocking=False)
            return n

        timed("er_full", full_er)
        assignments.unpersist()

    # ---- dedup_minhash decomposition ------------------------------------
    if want("dedup_minhash"):
        minhash_near_duplicate_clusters(docs, "doc_id", "text", threshold=0.7).count()

        def bands_only():
            from word_sense_disambiguation_spark.operators.blocking import (
                minhash_bands,
            )

            noop(minhash_bands(docs, "doc_id", "text"))

        timed("mh_bands", bands_only)

        def lsh_pairs_only():
            p, _ = minhash_lsh_pairs(docs, "doc_id", "text")
            noop(p)

        timed("mh_pairs", lsh_pairs_only)
        timed(
            "mh_verify",
            lambda: noop(
                ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.7)
            ),
        )
        timed(
            "mh_full",
            lambda: minhash_near_duplicate_clusters(
                docs, "doc_id", "text", threshold=0.7
            ).count(),
        )

    # ---- ann_lsh decomposition ------------------------------------------
    if want("ann_lsh"):
        q_rows = emb.orderBy("vec_id").limit(8).collect()
        queries_vec = [(int(r.vec_id), list(r.embedding)) for r in q_rows]
        lsh = lsh_index(emb).persist()
        lsh.count()
        lsh_topk(emb, queries_vec, k=10, index=lsh).count()  # warm-up
        timed(
            "lsh_probe",
            lambda: lsh_topk(emb, queries_vec, k=10, index=lsh).count(),
        )

    print(json.dumps({"stages": stages, "sf": sf, "cpus": cpus}))


if __name__ == "__main__":
    main()
