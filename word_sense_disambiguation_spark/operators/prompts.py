"""Prompt construction + training-example generation (reference T7/T8, T18/T19).

:func:`build_prompts` renders the reference's multiple-choice prompt
(``/root/reference/wsd/prompt.py:78-116``) for every mention with a
non-empty candidate set — entirely with JVM string/array expressions:
``aggregate`` over a zipped (rank, definition) array builds the lettered
choice list, NOTA always takes the reserved letter at index 127, and the
offset-window bound check (``start_offset + n <= 127``) becomes a filter
with a loud side-channel (count of dropped rows is the caller's to log —
no silent caps).

:func:`training_examples` is T18: per (lemma, pos) group, pick one of the
two glosses per sense with a seeded coin, shuffle candidate order with a
seeded random, draw a random letter offset (bounded like
``training/train.py:87-96``), and emit one prompt per inventory example
sentence — all with ``F.rand(seed)``-free *portable* hashing so re-runs and
parallelism levels agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.functions.text import WS_CLASS
from word_sense_disambiguation_spark.functions.letters import (
    NOTA_LETTER_INDEX,
    build_letters,
)

NONE_OF_THE_ABOVE = "none of the above"
MASK_TOKEN = "[MASK]"

PROMPT_TEMPLATE = (
    "What is the meaning of *{word}* in this sentence?\n\n"
    "Sentence: {sentence}\n\n{choices}\n\nAnswer: [unused0] {mask}"
)


def _letters_col():
    ls = build_letters()
    return F.array(*[F.lit(c) for c in ls.letters])


def build_prompts(
    candidates_grouped: DataFrame,
    word_col: str = "surface",
    sentence_col: str = "marked_sentence",
    defs_col: str = "definitions",
    start_offset_col=None,
) -> DataFrame:
    """Input: one row per mention with ``definitions array<string>`` in
    candidate-rank order. Output adds ``prompt`` (null if the offset window
    would collide with the NOTA slot, mirroring OptionLetterIndexError).
    """
    letters = _letters_col()
    off = (
        F.col(start_offset_col) if start_offset_col else F.lit(0)
    ).cast("int")
    n = F.size(F.col(defs_col))
    # lettered choice lines: zip definitions with letters[off + i]
    idx = F.sequence(F.lit(0), n - 1)
    lines = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(letters, (off + i + 1).cast("int")),
            F.lit(". "),
            F.element_at(F.col(defs_col), (i + 1).cast("int")),
        ),
    )
    nota_line = F.concat(
        F.element_at(letters, F.lit(NOTA_LETTER_INDEX + 1)),
        F.lit(". " + NONE_OF_THE_ABOVE),
    )
    choices = F.concat_ws("\n", F.flatten(F.array(lines, F.array(nota_line))))
    prompt = F.concat(
        F.lit("What is the meaning of *"),
        F.col(word_col),
        F.lit("* in this sentence?\n\nSentence: "),
        F.col(sentence_col),
        F.lit("\n\n"),
        choices,
        F.lit("\n\nAnswer: [unused0] " + MASK_TOKEN),
    )
    valid = (off >= 0) & ((off + n) <= F.lit(NOTA_LETTER_INDEX)) & (n > 0)
    return candidates_grouped.withColumn(
        "prompt", F.when(valid, prompt)
    )


def filter_prompts_by_length(
    prompts: DataFrame,
    prompt_col: str = "prompt",
    max_tokens: int = 2048,
) -> tuple[DataFrame, DataFrame]:
    """T19: drop prompts that would lose their answer slot after truncation
    (``training/train.py:374-396`` — the reference warns with a dropped
    count; we return the dropped rows as a side table — no silent caps).

    Token proxy = whitespace pieces (the reference counts tokenizer tokens;
    the bound is a budget, not an exact length).
    """
    n_tok = F.size(F.split(F.coalesce(F.col(prompt_col), F.lit("")), WS_CLASS + "+"))
    kept = prompts.filter(F.col(prompt_col).isNotNull() & (n_tok <= max_tokens))
    dropped = prompts.filter(F.col(prompt_col).isNull() | (n_tok > max_tokens))
    return kept, dropped


def _phash(*cols, salt: str) -> F.Column:
    """Portable deterministic pseudo-random long from columns + salt."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt), *cols)), 1, 8), 16, 10
    ).cast("long")


def mark_word_jvm(sentence, word) -> F.Column:
    """JVM twin of :func:`functions.text.mark_word_in_sentence` — same
    contract (first word-boundary, case-insensitive occurrence marked with
    ``*``, original casing preserved), but as a codegen expression: NULL
    where the python function would raise (no match / already marked),
    so callers route failures to a side table instead of emitting
    corrupted text. Tested row-identical to the python function over
    adversarial cases ('art' in 'artist', case flips, pre-marked).
    """
    s = F.col(sentence) if isinstance(sentence, str) else sentence
    w = F.col(word) if isinstance(word, str) else word
    # escape regex metacharacters in the word, then anchor on \b
    esc = F.regexp_replace(w, F.lit(r"([^a-zA-Z0-9])"), F.lit(r"\\$1"))
    pat = F.concat(F.lit(r"(?i)\b"), esc, F.lit(r"\b"))
    pos = F.regexp_instr(s, pat)  # 1-based; 0 = no boundary match
    matched = s.substr(pos, F.length(w))  # literal pattern: match len == word len
    marked = F.concat(
        s.substr(F.lit(1), pos - 1),
        F.lit("*"),
        matched,
        F.lit("*"),
        s.substr(pos + F.length(w), F.length(s)),
    )
    return F.when((pos > 0) & ~s.contains("*"), marked)


def training_examples(
    senses: DataFrame, seed: int = 42, max_prompt_defs: int = 100
) -> DataFrame:
    """Sense inventory -> supervised training prompts (T18 semantics).

    Per (lemma, pos): candidate list in rank order; per sense, a seeded
    coin picks source vs alternative gloss; per example sentence, the word
    is asterisk-marked (examples contain the lemma by construction); a
    seeded offset in [0, NOTA-n] spreads correct answers across the letter
    range (``training/train.py:87-96``). One row per (sense, example).
    """
    defs_choice = F.when(
        _phash(F.col("sense_id"), salt=f"{seed}:gloss") % 2 == 0,
        F.col("source_definition"),
    ).otherwise(F.col("alternative_definition"))
    per_sense = senses.select(
        "lemma",
        "pos",
        "sense_id",
        "sense_rank",
        defs_choice.alias("definition"),
        "examples",
    )
    grouped = (
        per_sense.groupBy("lemma", "pos")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("sense_rank", "sense_id", "definition"))
            ).alias("cands")
        )
        .withColumn("definitions", F.transform("cands", lambda c: c["definition"]))
        .withColumn("sense_ids", F.transform("cands", lambda c: c["sense_id"]))
        .filter(F.size("definitions") <= max_prompt_defs)
    )
    # one row per (sense, example): re-join examples and mark the lemma
    exploded = per_sense.select(
        "lemma", "pos", "sense_id", F.explode("examples").alias("sentence")
    )
    joined = exploded.join(grouped, on=["lemma", "pos"])
    # word-boundary marking (NULL when unmarkable): a substring instr()
    # would mid-word-mark 'bat' inside 'battalion'; NULL-marked rows yield
    # NULL prompts, which filter_prompts_by_length routes to its dropped
    # side table — no silent caps, no corrupted sentences.
    marked = mark_word_jvm(F.col("sentence"), F.col("lemma"))
    offset_span = F.lit(NOTA_LETTER_INDEX) - F.size("definitions")
    offset = (
        _phash(F.col("sense_id"), F.col("sentence"), salt=f"{seed}:off")
        % F.greatest(offset_span, F.lit(1))
    ).cast("int")
    correct_idx = F.array_position(F.col("sense_ids"), F.col("sense_id")).cast("int")
    with_meta = joined.select(
        "lemma",
        "pos",
        F.col("sense_id").alias("correct_sense_id"),
        marked.alias("marked_sentence"),
        "definitions",
        offset.alias("start_offset"),
        (offset + correct_idx - 1).alias("correct_letter_index"),
    )
    return build_prompts(
        with_meta,
        word_col="lemma",
        sentence_col="marked_sentence",
        defs_col="definitions",
        start_offset_col="start_offset",
    )
