"""Unit tests for the pure text primitives (reference test layer 1/6,
SURVEY §5: operator-level units + prompt invariants)."""

import pytest

from word_sense_disambiguation_spark.functions.text import (
    SentenceAlreadyMarkedError,
    WordNotFoundError,
    extract_text,
    mark_word_in_sentence,
    norm_surface,
    pos_tag,
    tokenize,
    wrap_html,
)


def test_html_roundtrip_byte_identical():
    texts = [
        "plain text",
        "with <tags> & ampersands",
        "unicode: café — 中文",
        "quotes \"double\" and 'single'",
        "",
    ]
    for t in texts:
        assert extract_text(wrap_html(t, title="x<y&z")) == t


def test_tokenize_offsets():
    toks = tokenize("The bank's vault, opened at 9am.")
    words = [t[0] for t in toks]
    assert words == ["The", "bank's", "vault", ",", "opened", "at", "9am", "."]
    for word, _pos, start, end in toks:
        assert end - start == len(word)
    # positions are sequential
    assert [t[1] for t in toks] == list(range(len(toks)))


def test_mark_word_semantics():
    # first word-boundary, case-insensitive occurrence (reference
    # wsd/prompt.py:26-50 contract)
    assert (
        mark_word_in_sentence("The Bank near the bank", "bank")
        == "The *Bank* near the bank"
    )
    # boundary: '100' must not match inside '100th'
    assert (
        mark_word_in_sentence("the 100th of 100 cases", "100")
        == "the 100th of *100* cases"
    )
    with pytest.raises(WordNotFoundError):
        mark_word_in_sentence("no such word here", "bank")
    with pytest.raises(SentenceAlreadyMarkedError):
        mark_word_in_sentence("already *marked* text", "marked")
    assert mark_word_in_sentence("a bank", "bank").count("*") == 2


def test_pos_tag_deterministic_and_consistent():
    assert pos_tag("the") == "DET"
    assert pos_tag(",") == "PUNCT"
    assert pos_tag("9am") == "NUM"
    assert pos_tag("Bank") == pos_tag("bank")  # case-insensitive via lemma
    # stable across calls
    assert pos_tag("bank") == pos_tag("bank")


def test_norm_surface():
    assert norm_surface("  New   YORK ") == "new york"
