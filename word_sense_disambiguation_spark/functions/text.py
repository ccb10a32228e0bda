"""Pure, versioned text functions: extraction, tokenization, marking, POS.

These are the deterministic primitives every stage builds on. They are plain
Python on purpose — the Spark operators wrap them in Arrow-batched pandas
UDFs, and the data generator + tests call them directly, so train-time and
inference-time text handling cannot drift apart (the reference enforces the
same single-source-of-truth rule for its marking function,
``/root/reference/wsd/prompt.py:26-50``).

Extraction invariant (BASELINE.json ``input_hint``): ``extract_text(html)``
is byte-identical to the ``text`` column for every url. The html wrapper is
produced by :func:`wrap_html` and inverted exactly by :func:`extract_text`.
"""

from __future__ import annotations

import hashlib
import html as _html
import re

EXTRACTION_VERSION = 1

# --- html <-> text ---------------------------------------------------------

_HTML_TEMPLATE = (
    "<html><head><meta charset=\"utf-8\"><title>{title}</title></head>"
    "<body><article>{body}</article></body></html>"
)
_BODY_RE = re.compile(r"<article>(.*?)</article>", re.DOTALL)


def wrap_html(text: str, title: str = "") -> bytes:
    """Deterministic html wrapper around ``text`` (UTF-8 bytes).

    Escapes the body so arbitrary text (including ``<`` and ``&``) round-trips
    byte-identically through :func:`extract_text`.
    """
    return _HTML_TEMPLATE.format(
        title=_html.escape(title, quote=False), body=_html.escape(text, quote=False)
    ).encode("utf-8")


def extract_text(html_bytes: bytes) -> str:
    """Inverse of :func:`wrap_html`: byte-identical body text per url."""
    m = _BODY_RE.search(html_bytes.decode("utf-8"))
    if m is None:
        return ""
    return _html.unescape(m.group(1))


def text_sha256(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


# --- tokenization ----------------------------------------------------------

# Word tokens: alphanumeric runs with optional internal apostrophe
# (``don't`` is one token); everything else non-space is punctuation.
# The whitespace class is explicit ASCII, NOT \s: python \s is Unicode-aware
# while Java's is not, so \s would tokenize U+00A0 differently in the pandas
# and JVM extractors. With the explicit class, exotic whitespace becomes a
# PUNCT token in BOTH paths — row-identity over parity-breaking semantics.
# The vertical tab is spelled \x0B, never \v: Java regex reads \v as the
# vertical-whitespace CLASS (U+000A-U+000D, U+0085, U+2028, U+2029) while
# Python re and DuckDB RE2 read it as U+000B only — with \v, text
# containing U+0085/U+2028/U+2029 (real-web codepoints) tokenizes
# differently per engine. \x0B means exactly U+000B in all three.
TOKEN_PATTERN = r"[A-Za-z0-9]+(?:'[A-Za-z0-9]+)?|[^ \t\n\r\f\x0BA-Za-z0-9]"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# Explicit ASCII whitespace for ANY expression mirrored into a DuckDB
# oracle — never \s there: Java \s is [ \t\n\x0B\f\r] while DuckDB's RE2
# \s omits U+000B, so a mirrored \s silently diverges on vertical tabs
# (the same engine-divergence class as \v above). WS composes into larger
# classes ("[^A-Za-z0-9" + WS + "]"); WS_CLASS is the class itself.
WS = r" \t\n\r\f\x0B"
WS_CLASS = r"[ \t\n\r\f\x0B]"


def tokenize(text: str) -> list[tuple[str, int, int, int]]:
    """Deterministic tokenizer: ``(word, position, start_char, end_char)``.

    Mirrors the token row shape of the reference
    (``/root/reference/wsd/word_sense_disambiguation.py:294-315``) minus the
    model-derived fields; ``end_char = start_char + len(word)``.
    """
    return [
        (m.group(0), i, m.start(), m.end())
        for i, m in enumerate(_TOKEN_RE.finditer(text))
    ]


def lemma_of(word: str) -> str:
    """Lowercase lemma (reference lowers spaCy lemmas, ``...py:303``)."""
    return word.lower()


# --- POS assignment --------------------------------------------------------

# Fixed function-word list — these never become mentions (the analogue of
# spaCy tagging them DET/ADP/...; reference keeps only content POS,
# ``/root/reference/wsd/word_sense_disambiguation.py:279-291,312``).
FUNCTION_WORDS = frozenset(
    """a an the and or but if then than of in on at by for with to from as is
    are was were be been being it its this that these those he she they we you
    i his her their our your not no nor so yet do does did has have had will
    would can could shall should may might must there here when where which
    who whom what why how all any some such own same more most other into over
    under again once during before after above below between out off up down
    about against""".split()
)

# spaCy-style POS tags the reference considers content words, and the fixed
# spaCy->WordNet map (``/root/reference/wsd/word_sense_disambiguation.py:279-291``).
SPACY_TO_WORDNET_POS: dict[str, str] = {
    "NOUN": "n",
    "PROPN": "n",
    "NUM": "n",
    "INTJ": "n",
    "VERB": "v",
    "ADJ": "a",
    "ADV": "r",
}

_CONTENT_POS_POOL = ["NOUN", "NOUN", "NOUN", "VERB", "VERB", "ADJ", "ADV"]


def _md5_int(s: str) -> int:
    """Portable 32-bit hash (same value computable in Spark via
    ``conv(substr(md5(x),1,8),16,10)`` and in DuckDB via
    ``('0x'||substr(md5(x),1,8))::BIGINT``)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def pos_tag(word: str) -> str:
    """Deterministic POS for the synthetic-English world.

    The reference gets POS from spaCy; this engine's synthetic corpus
    assigns each lemma a stable POS by portable hash, so the data
    generator, the tokenizer, and the sense inventory always agree —
    the same self-consistency the reference gets from WordNet supplying
    both candidates and gold labels (``/root/reference/wsd/benchmark.py``).
    """
    lemma = lemma_of(word)
    # ASCII-strict on purpose: the JVM fast path classifies via
    # rlike '^[a-z0-9]', and the two extractors must stay row-identical on
    # ANY input — a Unicode-aware isalnum() here would make 'é' a mention
    # in this path but PUNCT in the SQL path.
    if not lemma or lemma[0] not in "0123456789abcdefghijklmnopqrstuvwxyz":
        return "PUNCT"
    if lemma in FUNCTION_WORDS:
        return "DET"
    if lemma[0] in "0123456789":
        return "NUM"
    return _CONTENT_POS_POOL[_md5_int("pos:" + lemma) % len(_CONTENT_POS_POOL)]


def wordnet_pos(word: str) -> str | None:
    return SPACY_TO_WORDNET_POS.get(pos_tag(word))


# --- marking ---------------------------------------------------------------


class WordNotFoundError(ValueError):
    """No word-boundary match of *word* in *sentence* (reference
    ``wsd/prompt.py:11-17``)."""


class SentenceAlreadyMarkedError(ValueError):
    """Sentence already contains the ``*`` marker (reference
    ``wsd/prompt.py:19-23``)."""


def mark_word_in_sentence(sentence: str, word: str) -> str:
    """Mark the first word-boundary, case-insensitive occurrence with ``*``.

    Same contract as the reference (``/root/reference/wsd/prompt.py:26-50``):
    exactly one marked span, errors on pre-marked sentences and on no match;
    ``100`` does not match inside ``100th``.
    """
    if "*" in sentence:
        raise SentenceAlreadyMarkedError(sentence)
    m = re.search(r"\b" + re.escape(word) + r"\b", sentence, flags=re.IGNORECASE)
    if m is None:
        raise WordNotFoundError(f"{word!r} not in {sentence!r}")
    s, e = m.span()
    marked = sentence[:s] + "*" + sentence[s:e] + "*" + sentence[e:]
    assert marked.count("*") == 2, marked
    return marked


def norm_surface(surface: str) -> str:
    """Normalized surface form used as a blocking key (explicit ASCII
    whitespace — see the WS invariant above)."""
    return re.sub(WS_CLASS + "+", " ", surface.lower()).strip(" ")
