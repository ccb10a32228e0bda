"""Letter dimension + prompt construction + training-example generation
(reference T7-T9, T18 semantics; mirrors wsd/test_letters.py and
wsd/test_word_sense_disambiguation.py prompt invariants)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from word_sense_disambiguation_spark.functions.letters import (
    NOTA_LETTER_INDEX,
    NUM_LETTERS,
    build_letters,
)
from word_sense_disambiguation_spark.operators.prompts import (
    build_prompts,
    training_examples,
)


def test_letterset_deterministic_and_complete():
    a = build_letters()
    b = build_letters()
    assert a is b or a == b  # cached + equal
    assert len(a.letters) == NUM_LETTERS
    assert len(set(a.token_ids)) == NUM_LETTERS
    # familiar letters first; NOTA slot exists
    assert a.letters[0] == "A"
    assert a.letters[:52] == tuple(
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    )
    # excluded symbols never appear (clash with template/marker syntax)
    assert "." not in a.letters and "*" not in a.letters and "'" not in a.letters
    assert NOTA_LETTER_INDEX == 127


def test_build_prompts_layout(spark):
    df = spark.createDataFrame(
        [
            ("bank", "I sat by the *bank*", ["money institution", "river edge"], 0),
            ("empty", "no *candidates* here", [], 0),
            ("big", "way too *many*", [f"d{i}" for i in range(5)], 125),  # collides
        ],
        schema="surface string, marked_sentence string, definitions array<string>, off int",
    )
    out = build_prompts(df, start_offset_col="off").collect()
    p = out[0].prompt
    assert p.startswith("What is the meaning of *bank* in this sentence?")
    assert "Sentence: I sat by the *bank*" in p
    assert "A. money institution" in p and "B. river edge" in p
    nota_letter = build_letters().letters[NOTA_LETTER_INDEX]
    assert f"{nota_letter}. none of the above" in p
    assert p.endswith("Answer: [unused0] [MASK]")
    # empty candidate set and offset collisions yield null prompts
    assert out[1].prompt is None
    assert out[2].prompt is None


def test_length_filter(spark, sworld):
    """T19: over-budget and null prompts land in the dropped side table."""
    from word_sense_disambiguation_spark.operators.prompts import (
        filter_prompts_by_length,
    )

    ex = training_examples(sworld["senses"], seed=42)
    kept, dropped = filter_prompts_by_length(ex, max_tokens=2048)
    assert kept.count() == ex.count() and dropped.count() == 0
    kept2, dropped2 = filter_prompts_by_length(ex, max_tokens=10)
    assert kept2.count() == 0 and dropped2.count() == ex.count()


def test_training_examples(spark, sworld):
    ex = training_examples(sworld["senses"], seed=42).cache()
    n = ex.count()
    # 3 examples per sense
    assert n == sworld["senses"].count() * 3
    rows = ex.limit(200).collect()
    for r in rows:
        assert r.prompt is not None
        assert r.marked_sentence.count("*") == 2
        assert 0 <= r.start_offset
        assert r.start_offset + len(r.definitions) <= NOTA_LETTER_INDEX
        assert r.start_offset <= r.correct_letter_index < r.start_offset + len(r.definitions)
        # the letter at correct_letter_index letters the correct definition
        letters = build_letters().letters
        letter = letters[r.correct_letter_index]
        gold_def = r.definitions[r.correct_letter_index - r.start_offset]
        assert f"{letter}. {gold_def}" in r.prompt
    # deterministic across invocations
    ex2 = training_examples(sworld["senses"], seed=42)
    assert ex.exceptAll(ex2).count() == 0
    # different seed shifts offsets
    ex3 = training_examples(sworld["senses"], seed=7)
    diff = (
        ex.select("correct_sense_id", "marked_sentence", "start_offset")
        .exceptAll(ex3.select("correct_sense_id", "marked_sentence", "start_offset"))
        .count()
    )
    assert diff > 0


def test_jvm_marking_identical_to_python_contract(spark):
    """mark_word_jvm must agree with mark_word_in_sentence on adversarial
    cases: boundary-only matches, case-insensitive first occurrence with
    original casing kept, NULL exactly where python raises."""
    from word_sense_disambiguation_spark.functions.text import (
        mark_word_in_sentence,
    )
    from word_sense_disambiguation_spark.operators.prompts import mark_word_jvm

    cases = [
        ("the artist painted art daily", "art"),      # not inside 'artist'
        ("the Art of war", "art"),                    # case-insensitive, keep 'Art'
        ("battalion moved to the bat cave", "bat"),   # not inside 'battalion'
        ("no match here at all", "zebra"),            # python raises -> NULL
        ("already *marked* sentence with bank", "bank"),  # premarked -> NULL
        ("bank on the river bank", "bank"),           # first occurrence only
        ("a 100th runner and 100 meters", "100"),     # '100' not in '100th'
        ("c++ is mentioned as c++ once", "c++"),      # regex metachars escaped
    ]
    df = spark.createDataFrame(cases, "sentence string, word string")
    got = {
        (r.sentence, r.word): r.marked
        for r in df.withColumn(
            "marked", mark_word_jvm("sentence", "word")
        ).collect()
    }
    for sentence, word in cases:
        try:
            expect = mark_word_in_sentence(sentence, word)
        except ValueError:
            expect = None
        assert got[(sentence, word)] == expect, (sentence, word)


def test_training_examples_mark_word_boundaries(spark):
    """A lemma that appears only inside a longer word must yield a dropped
    (NULL-prompt) example, never a corrupted sentence."""
    from word_sense_disambiguation_spark.operators.prompts import (
        filter_prompts_by_length,
    )

    senses = spark.createDataFrame(
        [
            ("art", "n", "s1", 0, "art one", "art alt", ["the artist left early"]),
            ("art", "n", "s2", 1, "art two", "art alt2", ["fine art hung there"]),
        ],
        "lemma string, pos string, sense_id string, sense_rank int, "
        "source_definition string, alternative_definition string, "
        "examples array<string>",
    )
    out = training_examples(senses, seed=42)
    kept, dropped = filter_prompts_by_length(out)
    marked = {r.marked_sentence for r in kept.collect()}
    assert marked == {"fine *art* hung there"}
    assert dropped.count() == 1  # 'artist' example has no markable 'art'


def test_letterset_with_mock_bpe_tokenizer():
    """The pluggable token_id probe must drive the set exactly like the
    reference's single-token-under-tokenizer rule: symbols the tokenizer
    splits (probe -> None) are skipped, ids (not codepoints) dedup, and
    training/inference agree when injecting the same probe."""
    from word_sense_disambiguation_spark.functions.letters import (
        NUM_LETTERS,
        NotEnoughLettersError,
        build_letters,
    )

    def mock_bpe(sym: str) -> int | None:
        cp = ord(sym)
        if 0x0400 <= cp <= 0x04FF:
            return None  # this BPE splits every Cyrillic char -> multi-token
        if sym in "!@":
            return 7000  # '!' and '@' collide on one merged token id
        return 10_000 + cp

    ls = build_letters(mock_bpe)
    assert len(ls.letters) == NUM_LETTERS
    assert len(set(ls.token_ids)) == NUM_LETTERS
    # no Cyrillic admitted; the id collision keeps '!' and drops '@'
    assert not any(0x0400 <= ord(c) <= 0x04FF for c in ls.letters)
    assert "!" in ls.letters and "@" not in ls.letters
    # deterministic agreement: same probe object -> same mapping
    assert build_letters(mock_bpe) == ls
    # Greek backfills the slots Cyrillic lost, keeping priority order:
    # the default-probe set is a different mapping
    assert ls != build_letters()

    # a probe admitting too few symbols fails loudly, never silently short
    def tiny(sym: str) -> int | None:
        return ord(sym) if sym.isdigit() else None

    try:
        build_letters(tiny)
        raise AssertionError("expected NotEnoughLettersError")
    except NotEnoughLettersError as e:
        assert "10" in str(e) and "128" in str(e)


def test_eval_examples_from_corpus(spark, sworld):
    """build_eval_examples_from_wn parity: candidates in rank order via the
    inference-time join, gold letter at the gold index, skips surfaced as a
    reasoned side table, and the prompt path decodes the gold letter."""
    from word_sense_disambiguation_spark.operators.evaluation import (
        eval_examples_from_corpus,
    )
    from word_sense_disambiguation_spark.operators.mlm_scorer import (
        decode_probabilities,
        score_prompts,
    )

    corpus = sworld["gold_pairs"]
    kept, skipped = eval_examples_from_corpus(corpus, sworld["senses"])
    n_nota = corpus.filter("is_nota").count()
    assert n_nota > 0
    assert (
        skipped.filter(F.col("skip_reason") == "gold_not_in_inventory").count()
        == n_nota
    )
    assert kept.count() == corpus.count() - n_nota
    assert kept.filter(F.col("prompt").isNull()).count() == 0
    # the gold sense sits exactly at the correct letter's index
    bad = kept.filter(
        F.element_at("sense_ids", F.col("correct_letter_index") + 1)
        != F.col("correct_sense_id")
    ).count()
    assert bad == 0

    # letter-budget skips are reported, not dropped
    _k2, s2 = eval_examples_from_corpus(corpus, sworld["senses"], max_definitions=2)
    assert s2.filter(F.col("skip_reason") == "over_letter_budget").count() > 0

    # end-to-end: the batched scorer + decoder recover the gold letter
    scored = score_prompts(kept.drop("sense_ids"), id_cols=("word",))
    dec = decode_probabilities(scored, n_defs_col="n_defs")
    n = dec.count()
    good = dec.filter(
        ~F.col("is_nota_pred")
        & (F.col("choice_index") == F.col("correct_letter_index"))
    ).count()
    assert good / n >= 0.95, (good, n)


def test_jvm_marking_identity_randomized(spark):
    """One batched Spark pass over 300 seeded-random (sentence, word)
    cases — including absent words and premarked sentences — must agree
    cell-for-cell with the python contract."""
    import random

    from word_sense_disambiguation_spark.functions.text import (
        mark_word_in_sentence,
    )
    from word_sense_disambiguation_spark.operators.prompts import mark_word_jvm

    rng = random.Random(42)
    vocab = ["art", "artist", "bat", "battalion", "Bank", "bank", "c++",
             "100", "100th", "tie", "untie", "rank", "franks"]
    cases = []
    for i in range(300):
        words = [rng.choice(vocab) for _ in range(rng.randrange(2, 9))]
        sentence = " ".join(words)
        if rng.random() < 0.1:
            sentence = sentence.replace(" ", " *x* ", 1)  # premarked
        target = rng.choice(vocab)
        cases.append((sentence, target))
    df = spark.createDataFrame(cases, "sentence string, word string")
    got = {
        (r.sentence, r.word): r.marked
        for r in df.withColumn("marked", mark_word_jvm("sentence", "word")).collect()
    }
    for sentence, word in cases:
        try:
            expect = mark_word_in_sentence(sentence, word)
        except ValueError:
            expect = None
        assert got[(sentence, word)] == expect, (sentence, word)
