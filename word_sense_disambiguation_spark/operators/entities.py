"""Multi-token entity spans linked against a KB inventory (SURVEY §2 T14).

The reference emits ``Entity(id, start_token, end_token, text, description,
url)`` spans from its entity-linking pass
(``/root/reference/wsd/word_sense_disambiguation.py:45-52,357-372``; golden
Wikidata fixture ``wsd/test_server.py:162-170``): multi-word spans over the
token stream, linked to KB records with canonical label + description +
entity URL. Spark-first re-expression:

* **candidate span generation** is pure higher-order array expressions over
  the shared ``TOKEN_PATTERN`` tokenizer — whole-stage codegen, zero
  shuffle, one scan of the text column;
* **alias matching** is ONE broadcast hash join on the normalized
  token-joined alias key (the KB inventory is the dim side, like the sense
  inventory join in ``candidates.py``);
* **overlap resolution** follows spaCy's ``filter_spans`` rule (longest
  span first, earliest start on ties, drop anything overlapping a kept
  span), applied per page with an ``aggregate()`` lambda over that page's
  *matched* spans — the groupBy shuffle moves only matches (a handful per
  page), never the token stream.

At 100 TB the plan is: scan -> span explode (map-side) -> broadcast join
(map-side prune) -> one small shuffle of matches -> codegen'd greedy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.functions.text import TOKEN_PATTERN

DEFAULT_MAX_SPAN = 4

_SPAN_FIELDS = (
    "start_token int, end_token int, n_tokens int, span_key string, "
    "span_text string"
)


def _lemmas(text_col: Column) -> Column:
    toks = F.regexp_extract_all(text_col, F.lit(TOKEN_PATTERN), F.lit(0))
    return toks


def normalized_key(text_col: Column) -> Column:
    """Tokenizer-faithful normalization of a surface string: the same
    TOKEN_PATTERN tokens, lowercased, space-joined. 'Apple Inc.' and
    'apple inc .' collide on the same key — alias matching is over token
    sequences, not raw strings."""
    return F.concat_ws(
        " ", F.transform(_lemmas(text_col), lambda t: F.lower(t))
    )


def inventory_alias_rows(inventory: DataFrame) -> DataFrame:
    """KB inventory -> one row per (normalized alias, entity).

    ``inventory``: (entity_id, name, description, url[, aliases
    array<string>]). The canonical name is always an alias of itself.
    Normalization runs JVM-side with the *same* expressions the span keys
    use, so dim and fact can never drift.
    """
    aliases = (
        F.array_union(F.array(F.col("name")), F.coalesce("aliases", F.array()))
        if "aliases" in inventory.columns
        else F.array(F.col("name"))
    )
    return (
        inventory.select(
            "entity_id",
            F.col("name").alias("entity_name"),
            "description",
            F.col("url").alias("entity_url"),
            F.explode(aliases).alias("alias"),
        )
        .select(
            normalized_key(F.col("alias")).alias("span_key"),
            "entity_id",
            "entity_name",
            "description",
            "entity_url",
        )
        .filter(F.col("span_key") != "")
        .distinct()
    )


def candidate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_span: int = DEFAULT_MAX_SPAN,
) -> DataFrame:
    """(id, text) -> every contiguous token span of 1..max_span tokens that
    does not cross a sentence boundary.

    Pure codegen: tokenize once, build (start, length) index structs with
    nested ``transform``s, slice the lemma array per span. Emits ~max_span
    rows per token *after* predicate pushdown of the caller's join — at
    cluster scale this stays inside the scan stage (no shuffle).
    """
    toks = _lemmas(F.col(text_col))
    d = df.select(F.col(id_col), toks.alias("_toks"))
    d = d.withColumn("_lemmas", F.expr("transform(_toks, t -> lower(t))"))
    # sentence id per token = '.' tokens strictly before it (same LINEAR
    # run-length construction as mentions_from_pages_sql — one tokenizer,
    # one sentence rule, O(T) per page instead of the O(T^2) slice/filter
    # form that stalls on long-document outliers)
    d = d.withColumn(
        "_dots",
        F.expr("filter(transform(_toks, (t, i) -> IF(t = '.', i, -1)), x -> x >= 0)"),
    )
    d = d.withColumn(
        "_sids",
        F.expr(
            "flatten(transform("
            " zip_with(array_prepend(_dots, -1),"
            "          array_append(_dots, size(_toks) - 1),"
            "          (b, e) -> e - b),"
            " (n, j) -> array_repeat(j, n)))"
        ),
    ).drop("_dots")
    spans = F.expr(
        f"""
        filter(
          flatten(transform(_lemmas, (t, i) ->
            transform(sequence(1, {int(max_span)}), L ->
              struct(i AS start_token,
                     i + L - 1 AS end_token,
                     L AS n_tokens)))),
          s -> s.end_token < size(_lemmas)
               AND element_at(_sids, s.start_token + 1)
                   = element_at(_sids, s.end_token + 1))
        """
    )
    d = d.select(F.col(id_col), F.explode(spans).alias("s"), "_toks", "_lemmas")
    return d.select(
        F.col(id_col),
        F.col("s.start_token").cast("int").alias("start_token"),
        F.col("s.end_token").cast("int").alias("end_token"),
        F.col("s.n_tokens").cast("int").alias("n_tokens"),
        F.concat_ws(
            " ", F.expr("slice(_lemmas, s.start_token + 1, s.n_tokens)")
        ).alias("span_key"),
        F.concat_ws(
            " ", F.expr("slice(_toks, s.start_token + 1, s.n_tokens)")
        ).alias("span_text"),
    )


def linked_entities(
    pages: DataFrame,
    inventory: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    max_span: int = DEFAULT_MAX_SPAN,
) -> DataFrame:
    """pages + KB inventory -> non-overlapping linked entity spans.

    Output mirrors the reference ``Entity`` fields: (page id, entity_id,
    start_token, end_token inclusive, text = canonical entity label,
    span_text = surface as written, description, entity_url).
    """
    spans = candidate_spans(pages, id_col, text_col, max_span=max_span)
    matched = spans.join(F.broadcast(inventory_alias_rows(inventory)), on="span_key")

    grouped = matched.groupBy(id_col).agg(
        F.collect_list(
            F.struct(
                "start_token", "end_token", "n_tokens", "span_text",
                "entity_id", "entity_name", "description", "entity_url",
            )
        ).alias("cands")
    )
    # spaCy filter_spans: consider longest first (ties: earliest start),
    # keep a span iff it overlaps nothing already kept. The first span of
    # the sorted array seeds the accumulator, which keeps aggregate()'s
    # accumulator type inference trivial (no empty-array cast).
    sel = F.expr(
        """
        aggregate(
          slice(_sorted, 2, size(_sorted) - 1),
          slice(_sorted, 1, 1),
          (acc, s) -> IF(
            exists(acc, k -> NOT (s.end_token < k.start_token
                                  OR s.start_token > k.end_token)),
            acc,
            array_append(acc, s)))
        """
    )
    grouped = grouped.withColumn(
        "_sorted",
        F.expr(
            """
            array_sort(cands, (l, r) -> CASE
              WHEN l.n_tokens > r.n_tokens THEN -1
              WHEN l.n_tokens < r.n_tokens THEN 1
              WHEN l.start_token < r.start_token THEN -1
              WHEN l.start_token > r.start_token THEN 1
              WHEN l.entity_id < r.entity_id THEN -1
              WHEN l.entity_id > r.entity_id THEN 1
              ELSE 0 END)
            """
        ),
    ).withColumn("_kept", sel)
    out = grouped.select(F.col(id_col), F.explode("_kept").alias("e"))
    return out.select(
        F.col(id_col),
        F.col("e.entity_id").alias("entity_id"),
        F.col("e.start_token").alias("start_token"),
        F.col("e.end_token").alias("end_token"),
        F.col("e.entity_name").alias("text"),
        F.col("e.span_text").alias("span_text"),
        F.col("e.description").alias("description"),
        F.col("e.entity_url").alias("entity_url"),
    )


def entity_mentions(linked: DataFrame, id_col: str = "url") -> DataFrame:
    """Adapter: linked entity spans -> mention-shaped rows so spans flow
    through the ER stack (blocking -> pair scoring -> clustering).

    ``pred_sense_id`` carries the linked entity id and ``decision`` is
    'assigned', so the pair scorer's same-sense weight fires for mentions of
    the same KB entity across pages; ``context_words`` is empty (the span's
    evidence is the KB link itself). ``surface`` is the CANONICAL label,
    not the raw span text — linking already resolved the alias, so 'Zorvex'
    and 'Zorvex Industries' mentions of Q100 must block and score together.
    """
    return linked.select(
        F.col(id_col).alias("url"),
        F.concat_ws(
            ":",
            F.col(id_col),
            F.col("start_token").cast("string"),
            F.col("end_token").cast("string"),
        ).alias("mention_id"),
        F.col("start_token").alias("position"),
        F.col("text").alias("surface"),
        F.lower(F.col("text")).alias("norm_surface"),
        F.lower(F.col("text")).alias("lemma"),
        F.lit("n").alias("pos"),
        F.lit(0).alias("sentence_id"),
        F.array().cast("array<string>").alias("context_words"),
        F.lit("assigned").alias("decision"),
        F.col("entity_id").cast("string").alias("pred_sense_id"),
    )
