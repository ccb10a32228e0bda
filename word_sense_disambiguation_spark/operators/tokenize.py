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
