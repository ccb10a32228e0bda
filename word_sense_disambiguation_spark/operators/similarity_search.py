"""Approximate-nearest-neighbor search over embedding columns.

Three paths, as the build brief requires:

* :func:`brute_force_topk` — exact cosine top-k, the correctness baseline.
  Scale-aware even so: queries are broadcast, each Arrow batch computes a
  (batch x queries) GEMM and emits only its *local* top-k per query, so the
  shuffle carries O(partitions * q * k) rows instead of O(n * q).
* :func:`lsh_topk` — random-hyperplane (SimHash-for-vectors) bucketing:
  candidates share a ``bits``-wide signature; exact cosine re-rank inside
  buckets. The 1000-executor path: signature computation is a scan, the
  join is an equi-join on a small key.
* :func:`ivf_topk` — inverted-file ANN: a deterministic coarse quantizer
  (seeded sample centroids + distributed Lloyd refinement) partitions the
  corpus into lists; queries probe their ``n_probe`` nearest lists and
  exact-rerank only those candidates. Probing every list degrades to the
  exact search (tested).

All return ``(query_id, vid, cosine, rank)``.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hyperplanes(dim: int, bits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.normal(size=(dim, bits)).astype(np.float32)


def hyperplane_buckets(
    df: DataFrame, id_col: str, vec_col: str, bits: int = 12, seed: int = 42, dim: int | None = None
) -> DataFrame:
    """(id, vec) -> (vid, vec, bucket): sign-pattern bucket id per vector."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        H = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray))
            if H is None:
                H = _hyperplanes(M.shape[1], bits, seed)
            signs = (M @ H) > 0
            buckets = (signs * (1 << np.arange(bits))).sum(axis=1).astype("int64")
            yield pd.DataFrame(
                {"vid": pdf[id_col], "vec": pdf[vec_col], "bucket": buckets}
            )

    id_type = dict(df.dtypes)[id_col]
    vec_type = dict(df.dtypes)[vec_col]
    return df.select(id_col, vec_col).mapInPandas(
        run, schema=f"vid {id_type}, vec {vec_type}, bucket long"
    )


def brute_force_topk(
    data: DataFrame,
    queries: list[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for a small in-memory query set.

    ``queries``: list of (query_id, vector). Local top-k per Arrow batch
    (NumPy GEMM), then a global window top-k — the map-side-combine shape
    of the reference's batched scorer (everything expensive happens once
    per batch, not once per row).
    """
    qids = [q[0] for q in queries]
    Q = np.stack([np.asarray(q[1], dtype=np.float32) for q in queries])
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray)).astype(np.float32)
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            S = Mn @ Qn.T  # (batch, q)
            top = min(k, S.shape[0])
            out = []
            for qi in range(S.shape[1]):
                idx = np.argpartition(-S[:, qi], top - 1)[:top]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[qi],
                            "vid": pdf[id_col].iloc[idx].to_numpy(),
                            "cosine": S[idx, qi].astype("float64"),
                        }
                    )
                )
            yield pd.concat(out, ignore_index=True)

    id_type = dict(data.dtypes)[id_col]
    partial = data.select(id_col, vec_col).mapInPandas(
        run, schema=f"query_id long, vid {id_type}, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vid"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_index(
    data: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 32,
    seed: int = 42,
    lloyd_iters: int = 1,
) -> tuple[np.ndarray, DataFrame]:
    """Build the IVF coarse quantizer: (centroids, assignments).

    Centroid seeds are the ``n_lists`` vectors with the smallest portable
    md5 of their id — a seeded sample with no ``rand()`` — refined by
    ``lloyd_iters`` distributed Lloyd steps (elementwise mean per list via
    posexplode + groupBy, a tiny n_lists x dim result collected to the
    driver). Every vector is then assigned to its nearest centroid by
    cosine inside one Arrow scan (the centroid matrix ships in the closure
    — it IS the broadcast dim). Deterministic end to end: same data ->
    same centroids -> same lists.

    Each assignment pass is ``localCheckpoint``-ed: the per-iteration
    stats aggregate and every later probe join read the materialized
    lists instead of lazily re-running the assignment scan per consumer
    (the engine's fan-out rule, cf. blocking.minhash_lsh_pairs) — exactly
    one MapInPandas job per Lloyd iteration, and the index a caller
    amortizes over query batches is a real materialized table.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:ivf:"), F.col(id_col).cast("string"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    seeds = (
        data.select(F.col(vec_col).alias("vec"), h.alias("h"))
        .orderBy("h")
        .limit(n_lists)
        .collect()
    )
    C = np.stack([np.asarray(r.vec, dtype=np.float32) for r in seeds])
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    id_type = dict(data.dtypes)[id_col]
    vec_type = dict(data.dtypes)[vec_col]
    base = data.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    schema = f"vid {id_type}, vec {vec_type}, list_id int"

    def assigner(Cn: np.ndarray):
        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.stack(pdf["vec"].map(np.asarray)).astype(np.float32)
                Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                lid = np.argmax(Mn @ Cn.T, axis=1).astype("int32")
                yield pd.DataFrame(
                    {"vid": pdf["vid"], "vec": pdf["vec"], "list_id": lid}
                )

        return run

    assigned = base.mapInPandas(assigner(C), schema=schema).localCheckpoint(
        eager=True
    )
    dim = C.shape[1]
    for _ in range(lloyd_iters):
        stats = (
            assigned.select("list_id", F.posexplode("vec").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        C_new = C.copy()
        means: dict[int, np.ndarray] = {}
        for r in stats:
            means.setdefault(r.list_id, np.zeros(dim, dtype=np.float64))[r.pos] = r.m
        for lid, v in means.items():
            n = np.linalg.norm(v)
            if n > 0:
                C_new[lid] = (v / n).astype(np.float32)
        C = C_new
        assigned = base.mapInPandas(assigner(C), schema=schema).localCheckpoint(
            eager=True
        )
    return C, assigned


def ivf_topk(
    data: DataFrame,
    queries: list[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 32,
    n_probe: int = 8,
    seed: int = 42,
    index: tuple[np.ndarray, DataFrame] | None = None,
) -> DataFrame:
    """IVF ANN: probe the ``n_probe`` nearest lists per query, exact cosine
    re-rank inside them. ``n_probe == n_lists`` is the exhaustive search.
    Pass ``index`` (from :func:`ivf_index`) to amortize the quantizer over
    many query batches — the production pattern.
    """
    C, assigned = index if index is not None else ivf_index(
        data, id_col, vec_col, n_lists=n_lists, seed=seed
    )
    qrows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float32)
        v = v / max(float(np.linalg.norm(v)), 1e-12)
        for lid in np.argsort(-(C @ v))[: min(n_probe, C.shape[0])]:
            qrows.append((int(qid), [float(x) for x in v], int(lid)))
    spark = data.sparkSession
    qdf = spark.createDataFrame(
        qrows, schema="query_id long, qvec array<float>, list_id int"
    )
    # every vector lives in exactly one list, so the probe join yields each
    # (query, vid) at most once — no dedup needed
    cand = assigned.join(F.broadcast(qdf), on="list_id")
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = F.sqrt(F.aggregate(F.col("vec"), F.lit(0.0), lambda a, x: a + x * x))
    cos = dot / F.greatest(nrm, F.lit(1e-12))  # qvec already unit-norm
    scored = cand.select("query_id", "vid", cos.alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_index(
    data: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """The materializable half of :func:`lsh_topk`: the multi-table
    hyperplane signature table ``(vid, vec, table_id, bucket)``.

    Build (and persist) ONCE, probe many query batches — the same
    amortized-index pattern as :func:`ivf_index`; at 100 TB the signature
    table is written as a bucketed parquet table and every probe is a
    broadcast join against it, never a rescan of the corpus.
    """

    def run(batches):
        Hs = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.stack(pdf[vec_col].map(np.asarray))
            if Hs is None:
                Hs = [
                    _hyperplanes(M.shape[1], bits, seed + 1000 * t)
                    for t in range(tables)
                ]
            frames = []
            for t, H in enumerate(Hs):
                signs = (M @ H) > 0
                buckets = (signs * (1 << np.arange(bits))).sum(axis=1).astype("int64")
                frames.append(
                    pd.DataFrame(
                        {
                            "vid": pdf[id_col],
                            "vec": pdf[vec_col],
                            "table_id": t,
                            "bucket": buckets,
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    id_type = dict(data.dtypes)[id_col]
    vec_type = dict(data.dtypes)[vec_col]
    return data.select(id_col, vec_col).mapInPandas(
        run, schema=f"vid {id_type}, vec {vec_type}, table_id int, bucket long"
    )


def lsh_topk(
    data: DataFrame,
    queries: list[tuple],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    index: DataFrame | None = None,
) -> DataFrame:
    """Multi-table bucketed ANN: exact cosine re-rank within candidates.

    ``tables`` independent hyperplane tables of ``bits`` each; a vector is a
    candidate if it shares a bucket with the query in *any* table (union
    amplification — per-neighbor recall 1-(1-p^bits)^tables). One scan
    emits all table signatures; the join key is (table_id, bucket).
    Pass ``index`` (from :func:`lsh_index`, same bits/tables/seed) to
    amortize the signature build over many query batches.
    Tests report recall against :func:`brute_force_topk`.
    """
    banded = index if index is not None else lsh_index(
        data, id_col, vec_col, bits=bits, tables=tables, seed=seed
    )
    dim = len(queries[0][1])
    qrows = []
    for qid, vec in queries:
        v = np.asarray(vec, dtype=np.float32)
        for t in range(tables):
            H = _hyperplanes(dim, bits, seed + 1000 * t)
            b = int(((v @ H > 0) * (1 << np.arange(bits))).sum())
            qrows.append((qid, [float(x) for x in v], t, b))
    spark = data.sparkSession
    qdf = spark.createDataFrame(
        qrows, schema="query_id long, qvec array<float>, table_id int, bucket long"
    )
    cand = banded.join(F.broadcast(qdf), on=["table_id", "bucket"]).select(
        "query_id", "vid", "vec", "qvec"
    )
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))  # noqa: E731
    cos = dot / F.greatest(nrm(F.col("vec")) * nrm(F.col("qvec")), F.lit(1e-12))
    # score BEFORE the cross-table dedup (guide §2.3 — shuffle fewer
    # bytes): the dedup shuffle previously carried both 64-float vectors
    # per candidate row; computing the (deterministic) cosine first lets
    # the dedup contract to (query_id, vid, cosine) — a multi-table
    # duplicate re-computes one 64-wide dot product map-side instead of
    # shipping 0.5 KB of vectors, and ``first`` over bit-identical values
    # is order-independent.
    scored = (
        cand.select("query_id", "vid", cos.alias("cosine"))
        .groupBy("query_id", "vid")
        .agg(F.first("cosine").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vid"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def rrf_fuse(
    rankings: DataFrame,
    query_col: str = "query_id",
    item_col: str = "item_id",
    rank_col: str = "rank",
    source_col: str = "source",
    k: int = 60,
    top_n: int = 10,
    scale: int = 1_000_000_000_000,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of several
    per-query result lists — the hybrid-retrieval merge (ANN cosine +
    BM25-ish lexical + a recency list fused into one ranking without
    score calibration): ``RRF(item) = sum over sources of
    1 / (k + rank)``.

    Exactness discipline: the float reciprocal sum is replaced by the
    engine's scaled-DIV form ``sum(scale DIV (k + rank))`` — exact
    BIGINTs, associative, engine-portable; order-isomorphic to the real
    RRF whenever the scale dominates rank collisions (scale/(k+r) is
    strictly decreasing in r until integer truncation flattens at
    r ~ sqrt(scale); the default 10^12 keeps distinct contributions to
    rank ~10^6, far past any candidate list). Final order is pinned
    total: (fused score DESC, item ASC); duplicate (query, source,
    item) rows keep the BEST (lowest) rank first — an argmin aggregate,
    not trust in upstream dedup.

    Scale shape: one partial-combined dedup argmin, one
    partial-combined fused-score groupBy (per-query hot items contract
    map-side), then the per-query top-N as a window over a
    query-BOUNDED candidate set (at most sources x list length rows per
    query — the doc-bounded window class, not a corpus-keyed one).

    Output: ``(query, item, fused_milli, fused_rank)`` — fused_milli =
    the exact BIGINT score, fused_rank 1-based.
    """
    k = int(k)
    scale = int(scale)
    if k < 0 or scale <= 0:
        raise ValueError("k must be >= 0 and scale positive")
    best = (
        rankings.filter(
            F.col(query_col).isNotNull()
            & F.col(item_col).isNotNull()
            & F.col(rank_col).isNotNull()
        )
        .groupBy(
            F.col(query_col).alias("query"),
            F.col(source_col).alias("_src"),
            F.col(item_col).alias("item"),
        )
        .agg(F.min(F.col(rank_col)).cast("long").alias("_r"))
    )
    fused = best.groupBy("query", "item").agg(
        F.sum(F.expr(f"{scale}L DIV ({k}L + _r)")).cast("long").alias("fused_milli")
    )
    w = Window.partitionBy("query").orderBy(
        F.desc("fused_milli"), F.asc("item")
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= int(top_n))
        .select("query", "item", "fused_milli", "fused_rank")
    )
