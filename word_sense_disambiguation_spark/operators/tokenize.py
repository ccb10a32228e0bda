"""Stage: pages -> tokens and pages -> mentions.

Re-expresses the reference's tokenize+select path
(``/root/reference/wsd/word_sense_disambiguation.py:294-315`` and
``:318-340``) as ONE ``mapInPandas`` pass over the pages table: extraction,
tokenization, POS, content-word selection, and per-mention context windows
all happen in a single scan with **no shuffle** — at 10^12 rows the
alternative (tokens self-join to build context windows) would shuffle the
full token table twice, so context is computed while the page is already in
memory.

Python here is unavoidable (regex tokenization with char offsets), exactly
as spaCy is in the reference; the cost is Arrow-batched and embarrassingly
parallel per page.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.functions.text import (
    FUNCTION_WORDS,
    SPACY_TO_WORDNET_POS,
    extract_text,
    lemma_of,
    pos_tag,
    tokenize,
)

TOKENS_SCHEMA = (
    "url string, position int, word string, lemma string, pos string, "
    "wn_pos string, start_char int, end_char int, sentence_id int, "
    "is_content boolean"
)

MENTIONS_SCHEMA = (
    "url string, mention_id string, position int, surface string, "
    "norm_surface string, lemma string, pos string, sentence_id int, "
    "context_words array<string>, n_context int"
)

CONTEXT_WINDOW = 12


def _page_tokens(url: str, text: str, pos_cache: dict[str, str]) -> list[dict]:
    rows = []
    sentence_id = 0
    for word, position, start, end in tokenize(text):
        lemma = lemma_of(word)
        pos = pos_cache.get(lemma)
        if pos is None:
            pos = pos_tag(word)
            pos_cache[lemma] = pos
        wn_pos = SPACY_TO_WORDNET_POS.get(pos)
        rows.append(
            {
                "url": url,
                "position": position,
                "word": word,
                "lemma": lemma,
                "pos": pos,
                "wn_pos": wn_pos,
                "start_char": start,
                "end_char": end,
                "sentence_id": sentence_id,
                "is_content": wn_pos is not None and pos != "PUNCT",
            }
        )
        if word == ".":
            sentence_id += 1
    return rows


def tokens_from_pages(pages: DataFrame, use_html: bool = False) -> DataFrame:
    """pages -> tokens. With ``use_html=True`` the text is re-extracted from
    the html column (and the byte-identity invariant applies); otherwise the
    pre-extracted ``text`` column is scanned (column pruning drops html)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos_cache: dict[str, str] = {}
        for pdf in batches:
            out: list[dict] = []
            texts = (
                pdf["html"].map(lambda b: extract_text(bytes(b)))
                if use_html
                else pdf["text"]
            )
            for url, text in zip(pdf["url"], texts):
                out.extend(_page_tokens(url, text, pos_cache))
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "position", "word", "lemma", "pos", "wn_pos",
                    "start_char", "end_char", "sentence_id", "is_content",
                ],
            )

    cols = ["url", "html"] if use_html else ["url", "text"]
    return pages.select(*cols).mapInPandas(run, schema=TOKENS_SCHEMA)


def mentions_from_pages_sql(
    pages: DataFrame,
    window: int = CONTEXT_WINDOW,
) -> DataFrame:
    """JVM-only mention extraction — the 100 TB hot path.

    Produces byte-identical rows to :func:`mentions_from_pages` (asserted in
    tests) using only whole-stage-codegen expressions: ``regexp_extract_all``
    with the same token regex, portable-md5 POS (same value as
    ``functions.text.pos_tag``), and higher-order array functions for
    sentence scoping + context windows. No Python worker is involved, so the
    stage scales with JVM cores and runs inside one scan with no shuffle.

    The pandas path remains the canonical reference implementation (it also
    serves the char-offset ``tokens`` API and the html-extraction variant);
    this one exists because a pure-Python tokenizer caps cluster scaling —
    measured on this host: JVM stages scale ~5x from 8->32 cores, Python
    stages ~2.3x.
    """
    from word_sense_disambiguation_spark.functions.text import TOKEN_PATTERN

    token_re = TOKEN_PATTERN  # shared with the pandas tokenizer — one source
    # one string literal instead of 120 array literals: plan analysis time
    # is serial driver work — keep the logical plan small.
    func_words = F.split(F.lit(" ".join(sorted(FUNCTION_WORDS))), " ")

    # F.lit pattern (not an F.expr SQL literal): SQL string literals eat
    # backslashes, silently corrupting \s in the token regex.
    toks = F.regexp_extract_all(F.col("text"), F.lit(token_re), F.lit(0))
    df = pages.select("url", toks.alias("toks"))
    # sentence id per token = number of '.' tokens strictly before it.
    # LINEAR construction (run-length expansion over dot positions), not the
    # naive per-token slice/filter count: that form is O(T^2) in page token
    # count, and one 100k-token outlier page (10^10 ops) stalls its whole
    # task at crawl scale. Here: dot positions (one pass) -> per-sentence
    # run lengths via zip_with over [-1]++dots and dots++[T-1] (one pass
    # over #sentences) -> array_repeat expansion back to T ids. O(T) total,
    # still pure codegen, still zero shuffle.
    df = df.withColumn(
        "_dots",
        F.expr("filter(transform(toks, (t, i) -> IF(t = '.', i, -1)), x -> x >= 0)"),
    )
    df = df.withColumn(
        "sent_ids",
        F.expr(
            "flatten(transform("
            " zip_with(array_prepend(_dots, -1),"
            "          array_append(_dots, size(toks) - 1),"
            "          (b, e) -> e - b),"
            " (n, j) -> array_repeat(j, n)))"
        ),
    ).drop("_dots")
    # lemma per token; POS pool index via portable md5 (same as pos_tag)
    df = df.withColumn("lemmas", F.expr("transform(toks, t -> lower(t))"))
    # content flag: alnum-leading token, not a function word; NUM pool for
    # digit-leading (wn pos n), hash pool otherwise
    pool = "array('NOUN','NOUN','NOUN','VERB','VERB','ADJ','ADV')"
    pos_expr = (
        "transform(lemmas, t -> CASE"
        " WHEN NOT t rlike '^[a-z0-9]' THEN 'PUNCT'"
        f" WHEN array_contains({{fw}}, t) THEN 'DET'"
        " WHEN t rlike '^[0-9]' THEN 'NUM'"
        f" ELSE element_at({pool}, CAST(CAST(conv(substring(md5(concat('pos:', t)), 1, 8), 16, 10) AS BIGINT) % 7 + 1 AS INT))"
        " END)"
    )
    df = df.withColumn("fw", func_words).withColumn(
        "poss", F.expr(pos_expr.format(fw="fw"))
    )
    wn_map = (
        "CASE WHEN p IN ('NOUN','PROPN','NUM','INTJ') THEN 'n'"
        " WHEN p = 'VERB' THEN 'v' WHEN p = 'ADJ' THEN 'a'"
        " WHEN p = 'ADV' THEN 'r' END"
    )
    df = df.withColumn(
        "wn_poss", F.expr(f"transform(poss, p -> {wn_map})")
    )
    # Build per-mention structs BEFORE the explode (r6). The r1-r5 shape
    # exploded every token and evaluated the context lambda over the FULL
    # page token array per mention row — O(T) compute per mention and,
    # worse, O(T) parent-array copy per generated row (Generate duplicates
    # the carried page arrays into every output row): O(T^2) per page in
    # both compute and bytes, exactly the class the linear sentence-id
    # construction exists to avoid. Here each content token's context is
    # assembled inside ONE transform over the content positions, scanning
    # only the +-window neighborhood (``sequence(max(i-w,0), min(i+w,
    # T-1))`` — O(T*w) total), and the explode then carries one small
    # struct per mention instead of four page-sized arrays. Predicate,
    # ordering and output values are identical to the pandas path (the
    # row-identity test pins it); ~2x measured on the extraction stage.
    ments = F.expr(
        "transform("
        " IF(size(toks) = 0, array(),"
        "    filter(sequence(0, size(toks) - 1), i -> wn_poss[i] IS NOT NULL)),"
        " i -> named_struct("
        "  'position', i,"
        "  'surface', toks[i],"
        "  'lemma', lemmas[i],"
        "  'pos', wn_poss[i],"
        "  'sentence_id', sent_ids[i],"
        "  'ctx', filter(transform("
        "     sequence(greatest(i - {w}, 0), least(i + {w}, size(toks) - 1)),"
        "     a -> CASE WHEN a != i AND sent_ids[a] = sent_ids[i]"
        "           AND wn_poss[a] IS NOT NULL AND lemmas[a] != lemmas[i]"
        "           THEN lemmas[a] END),"
        "   x -> x IS NOT NULL)))".format(w=window)
    )
    df = df.select("url", F.explode(ments).alias("m"))
    return df.select(
        "url",
        F.concat_ws(":", "url", F.col("m.position").cast("string")).alias(
            "mention_id"
        ),
        F.col("m.position").cast("int").alias("position"),
        F.col("m.surface").alias("surface"),
        F.col("m.lemma").alias("norm_surface"),
        F.col("m.lemma").alias("lemma"),
        F.col("m.pos").alias("pos"),
        F.col("m.sentence_id").cast("int").alias("sentence_id"),
        F.col("m.ctx").alias("context_words"),
        F.size("m.ctx").alias("n_context"),
    )


def mentions_from_pages(
    pages: DataFrame,
    use_html: bool = False,
    window: int = CONTEXT_WINDOW,
) -> DataFrame:
    """pages -> mentions, with per-mention sentence-scoped context windows.

    A mention is a content token (reference's content-word selection,
    ``...py:312``). ``context_words`` are the content lemmas in the same
    sentence within ±``window`` positions, mention excluded — the input to
    both Lesk gloss-overlap and the hashed context embedding.
    ``mention_id = url ':' position`` is deterministic, so re-runs and
    different parallelism levels produce identical ids (no
    ``monotonically_increasing_id`` anywhere in this engine).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pos_cache: dict[str, str] = {}
        for pdf in batches:
            out: list[dict] = []
            texts = (
                pdf["html"].map(lambda b: extract_text(bytes(b)))
                if use_html
                else pdf["text"]
            )
            for url, text in zip(pdf["url"], texts):
                toks = _page_tokens(url, text, pos_cache)
                # group content tokens by sentence for window lookup
                by_sent: dict[int, list[dict]] = {}
                for t in toks:
                    if t["is_content"]:
                        by_sent.setdefault(t["sentence_id"], []).append(t)
                for t in toks:
                    if not t["is_content"]:
                        continue
                    ctx = [
                        o["lemma"]
                        for o in by_sent[t["sentence_id"]]
                        if o["position"] != t["position"]
                        and abs(o["position"] - t["position"]) <= window
                        and o["lemma"] not in FUNCTION_WORDS
                        and o["lemma"] != t["lemma"]
                    ]
                    out.append(
                        {
                            "url": url,
                            "mention_id": f"{url}:{t['position']}",
                            "position": t["position"],
                            "surface": t["word"],
                            "norm_surface": t["lemma"],
                            "lemma": t["lemma"],
                            "pos": t["wn_pos"],
                            "sentence_id": t["sentence_id"],
                            "context_words": ctx,
                            "n_context": len(ctx),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "mention_id", "position", "surface", "norm_surface",
                    "lemma", "pos", "sentence_id", "context_words", "n_context",
                ],
            )

    cols = ["url", "html"] if use_html else ["url", "text"]
    return pages.select(*cols).mapInPandas(run, schema=MENTIONS_SCHEMA)
