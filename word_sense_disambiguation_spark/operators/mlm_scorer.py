"""Batched multiple-choice prompt scorer — the faithful re-expression of the
reference's MLM scoring stage (T10-T12).

Reference shape (``/root/reference/wsd/masked_language_model.py:88-147``):
prompts in -> per-prompt probability vector over the 128 answer letters out,
with (a) a model loaded once per process (``@cache``, ``:39``), (b) prompts
sorted by length and scored in chunks to minimize padding waste
(``:113-126``), (c) results un-sorted back to input order.

Spark shape: an **iterator-of-batches pandas UDF** (``mapInPandas``) —
the iterator form exists precisely so per-executor init happens once per
worker, not once per batch; inside each Arrow batch we sort by prompt
length, chunk, score, and un-sort, which is the reference's bucketing
verbatim. Upstream, ``sortWithinPartitions(prompt_len)`` gives the
partition-level analogue (co-locating similar lengths across batches).

The default model is a deterministic gloss-overlap scorer (no ML runtime in
this container): it *reads the prompt text only* — sentence line + lettered
choice lines — exactly like the real model would, and puts probability mass
on the letter whose choice text overlaps the marked sentence most. Swap
``load_scorer`` for a real ModernBERT with the identical signature on a GPU
cluster; every Spark-side contract (batching, vector width 128, NOTA slot
127) is unchanged.
"""

from __future__ import annotations

import math
import re
from collections.abc import Callable, Iterator
from functools import cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from word_sense_disambiguation_spark.functions.letters import (
    NOTA_LETTER_INDEX,
    NUM_LETTERS,
    build_letters,
)

_CHUNK_SIZE = 32

_SENTENCE_RE = re.compile(r"^Sentence: (.*)$", re.MULTILINE)
_CHOICE_RE = re.compile(r"^(.)\. (.*)$", re.MULTILINE)
_WORD_RE = re.compile(r"[a-z0-9']+")


@cache
def load_scorer() -> Callable[[list[str]], np.ndarray]:
    """Executor-local scorer singleton (the reference's ``load_model()``).

    Returns ``score(prompts) -> float32 (n, NUM_LETTERS)`` probability
    matrix. Deterministic stand-in: logit per lettered choice = token
    overlap between the choice text and the sentence line; the NOTA line
    gets a fixed prior logit; softmax over occupied letters.
    """
    from word_sense_disambiguation_spark.functions.text import FUNCTION_WORDS

    letter_index = {c: i for i, c in enumerate(build_letters().letters)}
    word_re = re.compile(r"^What is the meaning of \*(.+?)\*")
    fw = frozenset(FUNCTION_WORDS)  # hoisted: no per-prompt 150-entry copy

    def score_one(prompt: str) -> np.ndarray:
        logits = np.full(NUM_LETTERS, -np.inf, dtype=np.float64)
        m = _SENTENCE_RE.search(prompt)
        # the target word and function words carry no sense signal (every
        # gloss mentions the word; articles appear everywhere) — a trained
        # model learns to ignore them, the stand-in must too.
        # (S - (fw | {w})) == (S - fw) - {w}: same token set, one copy less.
        wm = word_re.search(prompt)
        sent_tokens = (
            set(_WORD_RE.findall((m.group(1) if m else "").lower())) - fw
        )
        if wm:
            sent_tokens.discard(wm.group(1).lower())
        for lm in _CHOICE_RE.finditer(prompt):
            letter, text = lm.group(1), lm.group(2)
            idx = letter_index.get(letter)
            if idx is None:
                continue
            if idx == NOTA_LETTER_INDEX:
                logits[idx] = 1.0  # fixed reject prior
                continue
            choice_tokens = set(_WORD_RE.findall(text.lower()))
            overlap = len(choice_tokens & sent_tokens)
            logits[idx] = 3.0 * overlap
        # softmax over occupied slots
        mx = logits.max()
        if not math.isfinite(mx):
            return np.zeros(NUM_LETTERS, dtype=np.float32)
        e = np.exp(logits - mx)
        e[~np.isfinite(e)] = 0.0
        s = e.sum()
        return (e / s if s > 0 else e).astype(np.float32)

    def score(prompts: list[str]) -> np.ndarray:
        return np.stack([score_one(p) for p in prompts])

    return score


def dyadic_overlap_scorer() -> Callable[[list[str]], np.ndarray]:
    """Hash-gate scorer factory: the ``scorer_factory`` swap-in that makes
    the FULL prompt path float-replayable in SQL.

    Per prompt it parses exactly what the default scorer parses — the
    ``Sentence:`` line and the lettered choice lines (reference chunk
    iteration, ``/root/reference/wsd/masked_language_model.py:88-147``) —
    but emits probabilities as DYADIC RATIONALS instead of a softmax:
    ``p(choice) = min(|choice_tokens ∩ sentence_tokens|, 63) / 64`` (plain
    token-set overlap, no stop-word profile) and a fixed NOTA prior of
    ``1/64``. Every value is a multiple of 2^-6 below 1, hence exact in
    BOTH float32 (Spark's vector element type) and float64 (DuckDB), and
    every decode-stage sum of <= 128 such terms stays exact — so argmax,
    the strict-``>`` NOTA rule and the single renormalizing IEEE division
    are bit-identical across engines. This is the verification analogue
    of the real model, not a quality stand-in: use ``load_scorer`` (or a
    real ModernBERT factory) for actual disambiguation.
    """
    letter_index = {c: i for i, c in enumerate(build_letters().letters)}

    def score(prompts: list[str]) -> np.ndarray:
        out = np.zeros((len(prompts), NUM_LETTERS), dtype=np.float32)
        for r, prompt in enumerate(prompts):
            m = _SENTENCE_RE.search(prompt)
            sent_tokens = set(
                _WORD_RE.findall((m.group(1) if m else "").lower())
            )
            for lm in _CHOICE_RE.finditer(prompt):
                letter, text = lm.group(1), lm.group(2)
                idx = letter_index.get(letter)
                if idx is None:
                    continue
                if idx == NOTA_LETTER_INDEX:
                    out[r, idx] = np.float32(1.0 / 64.0)
                    continue
                overlap = len(set(_WORD_RE.findall(text.lower())) & sent_tokens)
                out[r, idx] = np.float32(min(overlap, 63) / 64.0)
        return out

    return score


def score_prompts(
    df: DataFrame,
    prompt_col: str = "prompt",
    id_cols: tuple[str, ...] = ("mention_id",),
    scorer_factory: Callable[[], Callable[[list[str]], np.ndarray]] | None = None,
) -> DataFrame:
    """prompts -> ``probabilities array<float>`` (width NUM_LETTERS).

    Physical layout mirrors the reference: length sort (partition-level via
    ``sortWithinPartitions``, batch-level inside the UDF), chunked scoring,
    order restored by carried id columns (not positional re-zip — rows have
    identities here, reference ``:93-97`` comment).
    Rows with null prompts short-circuit to a zero vector without touching
    the scorer (the no-definitions path).

    ``scorer_factory`` is THE model swap-in point: any picklable zero-arg
    callable returning ``score(prompts) -> float32 (n, NUM_LETTERS)`` —
    e.g. a ModernBERT loader on a GPU cluster — slots in with no other
    change; it is invoked once per python worker (the reference's
    ``@cache load_model()`` discipline). The default is the deterministic
    gloss-overlap stand-in. The contract (executor-local init, batching,
    vector width, NOTA slot untouched by the scorer) is pinned by
    ``tests/test_mlm_scorer.py::test_scorer_factory_swap_in``.
    """
    passthrough = [c for c in df.columns if c != prompt_col]
    factory = scorer_factory if scorer_factory is not None else load_scorer

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        scorer = factory()  # once per python worker
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            probs: list[np.ndarray | None] = [None] * n
            valid = [
                i for i, p in enumerate(pdf[prompt_col]) if isinstance(p, str)
            ]
            # length-bucketed chunks (reference _BUCKET_CHUNK_SIZE logic)
            valid.sort(key=lambda i: len(pdf[prompt_col].iloc[i]))
            for s in range(0, len(valid), _CHUNK_SIZE):
                chunk = valid[s : s + _CHUNK_SIZE]
                mat = scorer([pdf[prompt_col].iloc[i] for i in chunk])
                for j, i in enumerate(chunk):
                    probs[i] = mat[j]
            zero = np.zeros(NUM_LETTERS, dtype=np.float32)
            out = pdf[passthrough].copy()
            out["probabilities"] = [
                (p if p is not None else zero).tolist() for p in probs
            ]
            yield out

    schema_fields = ", ".join(
        f"{name} {dtype}" for name, dtype in df.dtypes if name != prompt_col
    )
    out_schema = f"{schema_fields}, probabilities array<float>"
    return (
        df.withColumn("_plen", F.length(F.coalesce(F.col(prompt_col), F.lit(""))))
        .sortWithinPartitions("_plen")
        .drop("_plen")
        .mapInPandas(run, schema=out_schema)
    )


def decode_probabilities(
    scored: DataFrame,
    n_defs_col: str = "n_defs",
    start_offset_col: str | None = None,
) -> DataFrame:
    """Probability vectors -> (choice_index, is_nota, confidence) — T12 as
    pure JVM array expressions (``_result_from_probs`` semantics,
    ``/root/reference/wsd/word_sense_disambiguation.py:194-217``):
    choices live at letters [offset, offset + n); NOTA at the fixed last
    slot; confidence renormalized over valid choices + NOTA.
    """
    off = (F.col(start_offset_col) if start_offset_col else F.lit(0)).cast("int")
    n = F.col(n_defs_col).cast("int")
    choice_slice = F.slice(F.col("probabilities"), off + 1, n)
    nota_p = F.element_at(F.col("probabilities"), NOTA_LETTER_INDEX + 1)
    best_p = F.array_max(choice_slice)
    total = (
        F.aggregate(
            choice_slice, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        )
        + nota_p.cast("double")
    )
    # strict >: the reference argmaxes over [choices..., NOTA] with
    # list.index(max), so a choice slot wins an exact probability tie
    # (observable with float32 ties, e.g. uniform vectors).
    is_nota = (nota_p > best_p) | (n == 0)
    choice_idx = F.array_position(choice_slice, best_p).cast("int") - 1
    winner = F.when(is_nota, nota_p.cast("double")).otherwise(best_p.cast("double"))
    return scored.select(
        "*",
        F.when(~is_nota, choice_idx).alias("choice_index"),
        is_nota.alias("is_nota_pred"),
        F.when(total > 0, winner / total).otherwise(F.lit(0.0)).alias("confidence"),
    )
