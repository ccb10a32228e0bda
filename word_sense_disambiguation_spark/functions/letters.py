"""Answer-letter dimension: 128 deterministic single-symbol option labels.

SEMANTIC MANDATE: the pool contents, their priority order, the three
excluded symbols, and the reserved last slot are fixture-level constants of
the reference contract (``/root/reference/wsd/letters.py:33-85``) — prompts
rendered here must letter their options identically, so those values are
kept verbatim. Everything else (structure, naming, selection loop) is this
engine's own.

Where the reference asks its HuggingFace tokenizer which symbols encode to
one token when space-prefixed, this engine has no bundled tokenizer; the
probe is injected instead. ``token_id(symbol)`` must return the symbol's
single-token id under the deployment tokenizer, or ``None`` when the
symbol is multi-token/unknown there — the default probe (codepoint) admits
everything, which is correct for the synthetic world. Training and
inference must inject the SAME probe to agree on the mapping; swapping in
a real tokenizer is a one-argument change, exercised by the mock-BPE test.

Scale note: this is a 128-row dimension — always a broadcast/literal
column, never a join shuffle.
"""

from __future__ import annotations

import itertools
import string
from collections.abc import Callable
from dataclasses import dataclass
from functools import cache

NUM_LETTERS = 128
# Last slot is the fixed none-of-the-above label: a single consistent
# reject symbol, rather than NOTA rotating with each prompt's option count.
NOTA_LETTER_INDEX = NUM_LETTERS - 1

# Mandated pool constants (priority order: most readable first). The symbol
# string deliberately omits '.' (option-template separator), '*' (marked-
# word delimiter) and "'" (reads as a contraction next to a gloss).
_SYMBOLS = "!@#$%^&+=<>?/|~`()[]{}_-"


def _codepoint_span(first: int, last: int, *, skip: int | None = None) -> str:
    return "".join(
        chr(cp) for cp in range(first, last + 1) if cp != skip
    )


_POOL_ORDER: tuple[str, ...] = (
    string.ascii_uppercase + string.ascii_lowercase,
    string.digits,
    _SYMBOLS,
    _codepoint_span(0x0391, 0x03A9, skip=0x03A2),  # Greek capitals (no U+03A2)
    _codepoint_span(0x03B1, 0x03C9),               # Greek small
    _codepoint_span(0x0410, 0x042F),               # Cyrillic capitals
    _codepoint_span(0x0430, 0x044F),               # Cyrillic small
)


class NotEnoughLettersError(RuntimeError):
    def __init__(self, found: int, needed: int):
        super().__init__(f"only {found} usable letters, need {needed}")


@dataclass(frozen=True)
class LetterSet:
    letters: tuple[str, ...]
    token_ids: tuple[int, ...]

    def __len__(self) -> int:  # pragma: no cover - convenience
        return len(self.letters)


@cache
def build_letters(token_id: Callable[[str], int | None] = ord) -> LetterSet:
    """First NUM_LETTERS symbols (in pool priority order) that the probe
    maps to distinct non-None token ids. Deterministic per probe; raises
    loudly rather than degrading when the probe admits too few."""
    chosen: dict[int, str] = {}
    for symbol in itertools.chain.from_iterable(_POOL_ORDER):
        tid = token_id(symbol)
        if tid is None or tid in chosen:
            continue
        chosen[tid] = symbol
        if len(chosen) == NUM_LETTERS:
            return LetterSet(tuple(chosen.values()), tuple(chosen.keys()))
    raise NotEnoughLettersError(len(chosen), NUM_LETTERS)
