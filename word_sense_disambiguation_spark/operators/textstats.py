"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Everything except the fingerprint is pure ``pyspark.sql.functions`` —
whole-stage-codegen'd, pushdown-friendly, and expressible 1:1 in the DuckDB
oracle. The fingerprint (winnowing rolling hash) is an Arrow mapInPandas
(rows-only oracle check, like the reference's non-SQL scorer).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.functions.hashing import rolling_fingerprint
from word_sense_disambiguation_spark.functions.text import WS, WS_CLASS

# tiny per-language marker lexicons for the n-gram/stopword heuristic —
# deterministic, good enough for corpus routing (real lang-id plugs into the
# same column contract).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "es", "una"],
    "de": ["der", "die", "das", "und", "ist"],
}

WORD_RE = r"[A-Za-z0-9]+"
BPE_ISH_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9" + WS + "]"


def whitespace_token_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), WS_CLASS + "+"))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of word-or-punct pieces — the BPE-ish pre-tokenization count."""
    return F.regexp_count(col, F.lit(BPE_ISH_RE))


def _marker_hits(col: Column, markers: list[str]) -> Column:
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pat))


def lang_id(col: Column) -> Column:
    """Argmax over marker-word hit counts; 'und' when nothing matches.

    Ties break by language order (en > fr > es > de), deterministically.
    """
    hits = {lang: _marker_hits(col, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality: length band + word shape + punctuation and
    stopword ratios. Mirrors the reference's pre-scoring pruning stance
    (filter junk before the expensive stage, ``training/train.py:374-396``).
    """
    n_chars = F.length(col)
    n_words = F.regexp_count(col, F.lit(WORD_RE))
    n_punct = F.regexp_count(col, F.lit(r"[^\w" + WS + "]"))
    n_stop = _marker_hits(col, LANG_MARKERS["en"])
    wordlen = n_chars.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    len_term = F.least(n_chars.cast("double") / F.lit(200.0), F.lit(1.0))
    punct_term = F.greatest(
        F.lit(1.0) - n_punct.cast("double") / F.greatest(n_words, F.lit(1)).cast("double"),
        F.lit(0.0),
    )
    stop_term = F.least(
        n_stop.cast("double") * F.lit(5.0) / F.greatest(n_words, F.lit(1)).cast("double"),
        F.lit(1.0),
    )
    shape_term = F.when((wordlen >= 3.0) & (wordlen <= 12.0), F.lit(1.0)).otherwise(F.lit(0.5))
    return (
        F.lit(0.3) * len_term
        + F.lit(0.3) * punct_term
        + F.lit(0.2) * stop_term
        + F.lit(0.2) * shape_term
    )


def text_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One-pass per-document profile table (the headline textstats query)."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        whitespace_token_count(c).alias("ws_tokens"),
        bpe_ish_token_count(c).alias("bpe_tokens"),
        lang_id(c).alias("pred_lang"),
        quality_score(c).alias("quality"),
    )


def fingerprints(
    df: DataFrame, id_col: str, text_col: str, window: int = 16, keep_mod: int = 8
) -> DataFrame:
    """(id, fingerprint-hash) rows via winnowing 0-mod sampling — joinable
    for containment/overlap detection between documents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                for h in rolling_fingerprint(t or "", window, keep_mod):
                    ids.append(i)
                    hs.append(h - (1 << 63))
            yield pd.DataFrame({"id": ids, "fp": pd.Series(hs, dtype="int64")})

    id_type = dict(df.dtypes)[id_col]
    return df.select(id_col, text_col).mapInPandas(
        run, schema=f"id {id_type}, fp long"
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Gopher-shaped within-document repetition signals (Rae et al. 2021
    §A1.1 'repetition removal' family; the exact char-occupancy formulas
    here are engine-defined and SQL-mirrored, not paper-exact):

    * ``top_ngram_char_frac`` — characters covered by the most frequent
      token ``top_n``-gram, ``count * length(gram) / length(text)``
      (tie-break: higher count, then lexicographically smallest gram);
    * ``dup_ngram_char_frac`` — characters covered by ALL token
      ``dup_n``-grams occurring more than once,
      ``sum(count * length(gram)) / length(text)`` (overlap-naive by
      construction — occurrences may share characters; the signal is a
      monotone repetition score, not an exact coverage measure).

    Plan shape at scale: explode grams -> ONE groupBy (id, gram) with
    map-side partial aggregation -> one per-id aggregate. Never a
    per-document O(G^2) higher-order-function scan (the O(T^2)
    scale-killer class the sentence-id invariant guards against): a
    100k-token document costs 100k rows through a hash aggregate, not
    10^10 lambda evaluations. Skew is bounded by document length.

    Documents with fewer than ``n`` tokens contribute no ``n``-grams and
    get 0.0 fractions (joined back over the full id set — no silent row
    loss).
    """
    t = F.trim(F.col(text_col))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    base = df.select(
        F.col(id_col).alias("_id"),
        F.length(F.col(text_col)).alias("_chars"),
        toks.alias("_toks"),
    )

    def gram_rows(n: int, out_name: str):
        idx = F.sequence(F.lit(0), F.size("_toks") - n)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice("_toks", i + 1, n))
        )
        return (
            base.filter(F.size("_toks") >= n)
            .select("_id", F.explode(grams).alias("gram"))
            .groupBy("_id", "gram")
            .agg(F.count("*").alias("cnt"))
            .withColumn("covered", F.col("cnt") * F.length("gram"))
            .withColumnRenamed("gram", out_name)
        )

    # per-doc argmax by (cnt desc, gram asc): a max_by ordering struct
    # cannot tie-break toward the lexicographically SMALLEST string, so
    # this one is a row_number window — partitioned by document id, whose
    # group size is bounded by the document's gram count (spill-safe).
    w = Window.partitionBy("_id").orderBy(F.desc("cnt"), F.asc("gram"))
    top = (
        gram_rows(top_n, "gram")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("_id", F.col("covered").alias("top_covered"))
    )
    dup = (
        gram_rows(dup_n, "gram")
        .filter(F.col("cnt") > 1)
        .groupBy("_id")
        .agg(F.sum("covered").alias("dup_covered"))
    )
    return (
        base.select("_id", "_chars")
        .join(top, on="_id", how="left")
        .join(dup, on="_id", how="left")
        .select(
            F.col("_id").alias(id_col),
            (
                F.coalesce(F.col("top_covered"), F.lit(0)).cast("double")
                / F.greatest(F.col("_chars"), F.lit(1)).cast("double")
            ).alias("top_ngram_char_frac"),
            (
                F.coalesce(F.col("dup_covered"), F.lit(0)).cast("double")
                / F.greatest(F.col("_chars"), F.lit(1)).cast("double")
            ).alias("dup_ngram_char_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
) -> DataFrame:
    """Overlapping token-window chunking — the embedding/RAG prep step:
    every document becomes ceil(max(n - overlap, 1) / stride) chunks of
    up to ``chunk_tokens`` whitespace tokens with ``overlap_tokens``
    shared between neighbours, so no retrieval query can fall into a
    chunk-boundary blind spot.

    Pure codegen: ONE scan, tokens via the engine's explicit-class
    whitespace split (never ``\\s`` — the Java/RE2 divergence rule),
    chunk starts via ``sequence(0, n-1, stride)``, chunk text via
    ``slice`` + ``array_join``. No shuffle at all — chunking is
    row-local, and the output keeps (doc, chunk_id, token span) so a
    downstream embedder (``similarity_search``) can key on it.
    Empty/null text yields one empty chunk row (chunks are a total
    function of the corpus — a doc that vanishes here would silently
    drop from retrieval).

    Chunk count per doc is bounded by n/stride + 1; stride =
    ``chunk_tokens - overlap_tokens`` must be positive.
    """
    if not (0 <= overlap_tokens < chunk_tokens):
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    # last start: the largest multiple of stride still beginning a chunk
    # with new content; sequence is inclusive, so cap it explicitly.
    # Pure integer arithmetic (div), no float rounding.
    last = F.expr(
        f"greatest(0L, ((_n - {overlap_tokens} - 1) div {stride}) * {stride})"
    )
    starts = F.sequence(F.lit(0).cast("long"), last, F.lit(stride).cast("long"))
    return (
        base.select(
            F.col(id_col), "_toks", "_n", F.posexplode(starts).alias("chunk_id", "_s")
        )
        .select(
            F.col(id_col),
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("_s").alias("token_start"),
            F.least(F.col("_s") + chunk_tokens, F.col("_n")).alias("token_end"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_s").cast("int") + 1, chunk_tokens),
                " ",
            ).alias("chunk_text"),
        )
    )


def distinctive_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_k: int = 5,
    idf_scale: int = 1_000_000,
) -> DataFrame:
    """Top-k most distinctive terms per document — tf-idf with an
    INTEGER-EXACT idf proxy: ``score = tf * ((N * idf_scale) div df)``
    (N = corpus doc count, df = docs containing the term). The floored
    scaled ratio is strictly decreasing in df while ``df <=
    sqrt(N * idf_scale)`` (floor(a/df) separates consecutive df values
    up to there), so within that regime the fixed-tf ranking equals the
    classic log(N/df) one — and every number stays BIGINT (the engine's
    oracle float discipline: no log, no float multiply). Size
    ``idf_scale`` so ``N * idf_scale * max_tf < 2^63``.

    Plan: tokens -> ONE (doc, token) count aggregate; document
    frequency derives from THAT table (a second partial-combined
    groupBy on token — never a countDistinct over the raw explode); N
    rides a broadcast 1-row cross join; the final top-k is a
    row_number window partitioned BY DOCUMENT — doc-bounded (a
    document's distinct-token count), the same acceptable-window class
    as repetition_stats' tie-break, not a corpus-keyed window.

    Ties: (score desc, tf desc, token asc) — total order, deterministic
    at any parallelism.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    ).withColumn("_k", F.lit(1))
    scored = (
        tf.join(dfreq, on="token")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n_docs), on="_k")
        .drop("_k")
        .withColumn(
            "score_scaled", F.expr(f"tf * ((n_docs * {idf_scale}) div df)")
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score_scaled"), F.desc("tf"), F.asc("token")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "rank", "token", "tf", "df", "score_scaled")
    )


# Explicit BMP codepoint ranges, NOT \\p{Script} property classes: Java
# regex (Spark) and RE2 (DuckDB/Go) disagree on property-class names and
# membership across Unicode versions, but a literal range class denotes
# the same codepoint set everywhere (the TOKEN_PATTERN \x0B-not-\v rule,
# applied to scripts). U+00D7/U+00F7 (multiply/divide signs) are excluded
# from the Latin letter ranges on purpose.
_SCRIPT_RANGES = {
    "latin": "A-Za-z\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u024F",
    "cyrillic": "\u0400-\u04FF",
    "greek": "\u0370-\u03FF",
    "arabic": "\u0600-\u06FF",
    "cjk": "\u4E00-\u9FFF\u3040-\u30FF\uAC00-\uD7A3",
}
# dominant-script tie priority = this listing order (stable, documented)
_SCRIPT_ORDER = ["latin", "cyrillic", "greek", "arabic", "cjk"]


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode SCRIPT composition — the char-level routing
    signal under language ID (CommonCrawl/CCNet route pages to per-
    language pipelines off exactly this; a 'lang=en' page that is 60%
    CJK chars is a mislabel the token-level n-gram langid can miss).

    Counts per script family by codepoint-range deletion:
    ``n_x = length(t) - length(regexp_replace(t, '[ranges]', ''))`` —
    pure JVM codegen, one scan, zero shuffle, and every count replays
    on any engine because the classes are LITERAL BMP ranges, never
    ``\\p{Script}`` properties (Java and RE2 disagree on those; same
    trap family as ``\\s`` vs WS_CLASS). Dominant script = max count
    with ties broken by the fixed family order, 'none' when no script
    chars at all; ``dominant_ratio`` = dominant count / total chars
    (ONE IEEE division, NULL on empty text).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    counts = {
        name: (
            F.length(t) - F.length(F.regexp_replace(t, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in _SCRIPT_RANGES.items()
    }
    out = df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        *[counts[n].alias(f"n_{n}") for n in _SCRIPT_ORDER],
    )
    best = F.greatest(*[F.col(f"n_{n}") for n in _SCRIPT_ORDER])
    dom = F.lit("none")
    for name in reversed(_SCRIPT_ORDER):
        dom = F.when(
            (F.col(f"n_{name}") == best) & (best > 0), F.lit(name)
        ).otherwise(dom)
    return out.select(
        "*",
        dom.alias("dominant_script"),
        F.expr(
            "CASE WHEN n_chars = 0 THEN CAST(NULL AS DOUBLE)"
            " ELSE CAST(greatest(n_latin, n_cyrillic, n_greek, n_arabic,"
            " n_cjk) AS DOUBLE) / CAST(n_chars AS DOUBLE) END"
        ).alias("dominant_ratio"),
    )


def build_vocabulary(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    top_n: int = 50_000,
) -> DataFrame:
    """Tokenizer-prep vocabulary: corpus token counts -> min-count floor
    -> global top-N by (count DESC, token ASC) with contiguous ranks —
    the table a BPE/WordPiece trainer, an OOV filter, or a hash-free
    embedding layer consumes.

    Scale shape: ONE partial-combined token-count groupBy is the only
    full-data shuffle (a 10^12-token corpus contracts map-side to its
    distinct tokens); the global top-N is ``orderBy(...).limit(n)`` —
    Spark's TakeOrderedAndProject keeps a bounded per-partition heap and
    merges N rows, NEVER a full sort shuffle — and the final contiguous
    rank is a row_number window over the ALREADY-LIMITED n rows (a
    caller-sized bounded window, the ``distinctive_terms`` doc-bounded
    class, not a corpus-keyed one). The (count DESC, token ASC) order is
    total, so boundary ties resolve deterministically at any
    parallelism. ``top_n`` sizes driver/task memory — it is the
    vocabulary budget, a few 100k in practice.

    Output: ``(rank, token, count)``, rank 1-based.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
        .filter(F.col("count") >= int(min_count))
        .orderBy(F.desc("count"), F.asc("token"))
        .limit(int(top_n))
    )
    w = Window.orderBy(F.desc("count"), F.asc("token"))
    return counts.select(
        F.row_number().over(w).cast("long").alias("rank"), "token", "count"
    )


def cooccurrence_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 2,
    min_count: int = 5,
    harmonic_scale: int | None = None,
) -> DataFrame:
    """Skip-gram co-occurrence table — the word2vec/GloVe prep statistic:
    unordered token pairs within ``window`` positions, with an EXP-PMI
    association ratio ``(n_pair · T_tok²) / (T_pairs · n_w1 · n_w2)``
    (exactly the quantity inside PMI's log — log-free because log is
    where cross-engine replay dies, and the ratio is order-isomorphic to
    PMI anyway: rank/threshold on it directly).

    Scale shape: positions ride ONE posexplode; window membership is an
    offset EXPLODE (1..window) + one equi-join on (doc, position+k) —
    the ``hopping_window`` move, never an inequality/range join; pair
    and unigram counts are partial-combined groupBys; the two corpus
    totals ride a broadcast one-row join (``distinctive_terms``'s _k
    trick). All counts BIGINT-exact; the ratio is one fixed IEEE tree
    over DOUBLE casts. ``min_count`` floors the OUTPUT pairs only — the
    totals T_pairs/T_tok are computed before flooring, so the
    distribution stays honest. Pairs are canonical ``w1 <= w2``
    (least/greatest); a token co-occurring with itself counts like any
    other pair.

    Output: ``(w1, w2, n_pair, assoc_ratio)``. With ``harmonic_scale``
    set, a ``w_pair`` column is appended: GloVe's 1/distance weighting
    in integer-exact form — a pair at offset k contributes
    ``harmonic_scale DIV k``, so pick a scale the window's offsets
    divide (720720 = lcm(1..16) makes every weight EXACT for windows up
    to 16) and the weighted sum stays BIGINT — no float harmonics.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    tokpos = (
        df.select(F.col(id_col).alias("did"), F.posexplode(toks).alias("pos", "tok"))
        .filter(F.col("tok") != "")
    )
    uni = tokpos.groupBy(F.col("tok").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_w")
    )
    t_tok = uni.agg(
        F.coalesce(F.sum("n_w"), F.lit(0)).cast("long").alias("t_tok")
    ).withColumn("_k", F.lit(1))
    left = tokpos.select(
        "did",
        F.col("tok").alias("w_a"),
        F.explode(F.sequence(F.lit(1), F.lit(int(window)))).alias("k"),
        "pos",
    ).select(
        "did", "w_a", "k", (F.col("pos") + F.col("k")).alias("pos_b")
    )
    pairs = left.join(
        tokpos.select("did", F.col("pos").alias("pos_b"), F.col("tok").alias("w_b")),
        on=["did", "pos_b"],
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n_pair")]
    if harmonic_scale is not None:
        aggs.append(
            F.sum(F.expr(f"{int(harmonic_scale)}L DIV k")).cast("long").alias("w_pair")
        )
    pc = pairs.select(
        F.least("w_a", "w_b").alias("w1"),
        F.greatest("w_a", "w_b").alias("w2"),
        "k",
    ).groupBy("w1", "w2").agg(*aggs)
    t_pairs = pc.agg(
        F.coalesce(F.sum("n_pair"), F.lit(0)).cast("long").alias("t_pairs")
    ).withColumn("_k", F.lit(1))
    return (
        pc.filter(F.col("n_pair") >= int(min_count))
        .join(uni.select(F.col("w").alias("w1"), F.col("n_w").alias("n_w1")), on="w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("n_w").alias("n_w2")), on="w2")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(t_tok), on="_k")
        .join(F.broadcast(t_pairs), on="_k")
        .select(
            "w1",
            "w2",
            "n_pair",
            *(["w_pair"] if harmonic_scale is not None else []),
            F.expr(
                "(CAST(n_pair AS DOUBLE) * (CAST(t_tok AS DOUBLE)"
                " * CAST(t_tok AS DOUBLE)))"
                " / ((CAST(t_pairs AS DOUBLE) * CAST(n_w1 AS DOUBLE))"
                "    * CAST(n_w2 AS DOUBLE))"
            ).alias("assoc_ratio"),
        )
    )


def token_diversity(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document Simpson diversity of the token distribution:
    ``1 - Σ c_i² / T²`` — the log-free member of the entropy family
    (entropy needs a per-term log, which no cross-engine float replay
    survives; Simpson is EXACT integer arithmetic until one final IEEE
    division, and ranks junk the same way: a page that is one token
    repeated scores 0, all-distinct tokens score 1 - 1/T). Production
    use: the keyword-stuffing / generated-spam gate next to the Gopher
    repetition fractions — repetition_stats catches repeated PHRASES,
    diversity catches a flat degenerate token histogram.

    Shape: one explode -> (doc, token) count -> per-doc sum of squares
    (both partial-combined groupBys, never a window), left join back so
    empty docs keep a row (NULL diversity, never a drop). Σc² sums as
    DECIMAL(38,0) (a 10^9-token single-token doc squares to 10^18);
    output ``(id, n_tokens, n_distinct, simpson_diversity)``.
    """
    t = F.lower(F.trim(F.coalesce(F.col(text_col), F.lit(""))))
    toks = F.when(t == "", F.array()).otherwise(F.split(t, WS_CLASS + "+"))
    tf = (
        df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("_id", "token")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    per_doc = tf.groupBy("_id").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.expr("CAST(c * c AS DECIMAL(38,0))")).alias("_c2"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc.withColumnRenamed("_id", id_col), on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias("n_distinct"),
            F.expr(
                "CASE WHEN n_tokens IS NULL OR n_tokens = 0"
                " THEN CAST(NULL AS DOUBLE)"
                " ELSE CAST(1.0 AS DOUBLE) - CAST(_c2 AS DOUBLE)"
                "      / (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)) END"
            ).alias("simpson_diversity"),
        )
    )
