"""Bloom-filter join pruning: drop non-matching big-side rows BELOW the
shuffle of a big-to-medium join.

The 100 TB problem this solves: a semi/inner join of a fact table against
a dim-key set that is too big to broadcast as a hash relation (10^7-10^8
keys -> multi-GB broadcast) still shuffles the ENTIRE fact side today —
including the (often vast) majority of rows whose key cannot possibly
match. A Bloom filter of the dim keys is 10-100x smaller than the hash
relation (m bits vs 8+ bytes/key), broadcasts as a plan literal, and
prunes those rows with a pure-codegen predicate right above the scan, so
the shuffle only carries probable matches. False positives are removed by
the exact join that follows — the operator's OUTPUT is exactly the join's
output (the one-sided-error discipline of ``sketches.cms_heavy_hitters``:
approximate structure, exact answer), which is why its oracle is a plain
``SEMI JOIN``.

Spark's AQE has a runtime bloom rewrite (``spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled``) that targets the same shape; this
operator is the explicit, deterministic, REUSABLE form: the packed words
are a plain ``list[int]`` the caller can build once and apply to many
queries/stages (the reference's skip-if-exists resume discipline applied
to a filter: compute once, reuse, ``training/train.py:374-396`` parity
trail in plans/checkpoint.py).

Determinism contract: positions come from the engine's portable 60-bit
md5 hash (``conv(substr(md5(...)),16,10)`` — the same construction the
CMS sketch and the JVM embedding path use), never from Spark's
xxhash/murmur whose seeds are not replayable elsewhere. ``local[1] ==
local[32]`` bit-for-bit; a python reference replays the words exactly.

Sizing: false-positive rate ~= (1 - e^(-k*n/m))^k; the default
m=2^16, k=4 holds ~6500 keys at ~2% fp. Size m to the dim-key count —
the words array is embedded in the plan as a literal (m/64 BIGINTs;
m=2^20 -> 16K words ~= 128 KB plan payload, the practical ceiling for
literal embedding — beyond that, :func:`bloom_prune_by_join` ships the
words as a broadcast (w, word) relation instead: k broadcast hash joins,
still exchange-free on the fact side, identity-tested against the
literal path).
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 4

# Plan-literal ceiling: beyond 2^20 bits the literal array stops being a
# sane plan payload; refuse loudly rather than emit a 10 MB plan.
MAX_LITERAL_M_BITS = 1 << 20


def _pos_sql(key_expr: str, i: int, m_bits: int) -> str:
    """Portable bit position i of a key: 60-bit md5 (hex->BIGINT) mod m.
    Same hash family as sketches.py — replayable in DuckDB and python."""
    return (
        f"pmod(CAST(conv(substr(md5(concat('bloom{i}:', "
        f"CAST(({key_expr}) AS STRING))), 1, 15), 16, 10) AS BIGINT), {m_bits})"
    )


def bloom_positions_py(key: object, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K):
    """Python replay of the k bit positions (tests pin spark == python)."""
    return [
        int(hashlib.md5(f"bloom{i}:{key}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def build_bloom_words(
    df: DataFrame,
    key_expr: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> list[int]:
    """One aggregate job over the build side -> m/64 packed BIGINT words.

    The plan is the map-side-combine shape: explode each key to its k
    (word_index, bit_mask) pairs, ``groupBy(word).agg(bit_or(mask))`` —
    a partition's contribution collapses to at most m/64 rows before the
    (tiny) shuffle, and the collect is bounded at m/64 rows regardless of
    build-side cardinality (the same bounded-collect class as the IVF
    centroid pull, similarity_search.py).
    """
    if m_bits % 64 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if m_bits > MAX_LITERAL_M_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the plan-literal ceiling "
            f"{MAX_LITERAL_M_BITS}; build the words in chunks and use "
            "bloom_prune_by_join (broadcast word-index relation) at that "
            "scale"
        )
    pos_cols = [
        F.expr(_pos_sql(key_expr, i, m_bits)).alias(f"_p{i}") for i in range(k)
    ]
    keyed = df.filter(F.expr(key_expr).isNotNull()).select(*pos_cols)
    pos = keyed.select(
        F.explode(F.array(*[F.col(f"_p{i}") for i in range(k)])).alias("p")
    )
    words = (
        pos.select(
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.w] = r.word
    return out


def bloom_might_contain(
    key_expr: str, words: list[int], m_bits: int, k: int = DEFAULT_K
) -> Column:
    """Membership predicate as ONE pure-codegen Column (no UDF).

    The packed words ride along as a constant-folded literal array; each
    of the k probes is ``(element_at(words, pos div 64 + 1) >> (pos %
    64)) & 1 = 1``. Arithmetic shiftright is correct for bit 63 too: the
    sign-fill only touches bits above the ``& 1``.
    """
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    conds = []
    for i in range(k):
        p = _pos_sql(key_expr, i, m_bits)
        conds.append(
            F.expr(
                f"(shiftright(element_at({arr}, CAST(({p}) div 64 AS INT) + 1), "
                f"CAST(({p}) % 64 AS INT)) & 1) = 1"
            )
        )
    return reduce(lambda a, b: a & b, conds)


def bloom_prune(
    big: DataFrame,
    key_expr: str,
    words: list[int],
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Filter ``big`` to rows whose key MIGHT be in the filter (superset
    of true matches; NULL keys never match — join semantics)."""
    return big.filter(
        F.expr(key_expr).isNotNull() & bloom_might_contain(key_expr, words, m_bits, k)
    )


def bloom_words_df(spark, words: list[int]) -> DataFrame:
    """The packed words as a (w, word) table, nonzero words only — the
    shippable form for filters too big to embed as plan literals."""
    rows = [(i, int(w)) for i, w in enumerate(words) if w]
    return spark.createDataFrame(rows, "w long, word long")


def bloom_prune_by_join(
    big: DataFrame,
    key_expr: str,
    words_df: DataFrame,
    m_bits: int,
    k: int = DEFAULT_K,
) -> DataFrame:
    """The beyond-the-literal-ceiling prune: k successive BROADCAST hash
    joins against the nonzero-words table, one per probe — still NO
    exchange on the fact side, so the prune stays below any downstream
    shuffle, but the filter ships as a broadcast relation (m/64 rows)
    instead of a plan literal. Semantically identical to
    :func:`bloom_prune` on the same words (identity-tested): an inner
    join on the word index drops keys probing an all-zero word (bit
    unset) exactly as the literal predicate would, and the bit test
    filters the rest. NULL keys drop at the first join (null probe).
    """
    out = big
    for i in range(k):
        p = _pos_sql(key_expr, i, m_bits)
        wd = words_df.select(
            F.col("w").alias(f"_bw{i}"), F.col("word").alias(f"_bword{i}")
        )
        out = (
            out.join(
                F.broadcast(wd),
                on=F.expr(f"CAST(({p}) div 64 AS BIGINT)") == F.col(f"_bw{i}"),
                how="inner",
            )
            .filter(
                F.expr(
                    f"(shiftright(_bword{i}, CAST(({p}) % 64 AS INT)) & 1) = 1"
                )
            )
            .drop(f"_bw{i}", f"_bword{i}")
        )
    return out


def bloom_semijoin(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact left-semi join of ``big`` against ``small``'s keys, with the
    Bloom prune applied below the join's exchange.

    Output == ``big SEMI JOIN small`` exactly (bloom false positives are
    removed by the verify join) — approximate plumbing, exact answer.
    Two jobs total: one bounded aggregate over ``small`` to build the
    words, then the pruned join; at the target scale the build cost is
    amortized across every stage that reuses the words.
    """
    words = build_bloom_words(small, small_key, m_bits, k)
    pruned = bloom_prune(big, big_key, words, m_bits, k)
    keys = small.select(F.expr(small_key).alias("_bloom_k")).filter(
        F.col("_bloom_k").isNotNull()
    )
    return pruned.join(
        keys, on=F.expr(big_key) == F.col("_bloom_k"), how="left_semi"
    )
