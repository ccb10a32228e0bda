"""Deterministic 128-slot answer-letter dimension (reference T9).

Re-expresses ``/root/reference/wsd/letters.py:33-85``: select exactly
NUM_LETTERS answer symbols from priority-ordered pools (Latin -> digits ->
safe symbols -> Greek -> Cyrillic), deduplicate, fail loudly if short, and
reserve the LAST slot for none-of-the-above. The reference dedups by
tokenizer token-id; with no tokenizer in this engine the identity is the
codepoint itself, and a pluggable ``token_id`` function keeps the contract
(training and inference must call with the same function to agree —
the same rule the reference states).

The result is a tiny dimension: broadcast it (``spark.sparkContext
.broadcast`` or a literal map column), never join-shuffle on it.
"""

from __future__ import annotations

import string
from dataclasses import dataclass
from functools import cache

NUM_LETTERS = 128
NOTA_LETTER_INDEX = NUM_LETTERS - 1


class NotEnoughLettersError(RuntimeError):
    def __init__(self, found: int, needed: int):
        super().__init__(f"only {found} usable letters, need {needed}")


@dataclass(frozen=True)
class LetterSet:
    letters: tuple[str, ...]
    token_ids: tuple[int, ...]


def _candidate_pools() -> list[list[str]]:
    """Priority-ordered pools; exclusions mirror the reference
    (``wsd/letters.py:42-46``): '.' clashes with the option template, '*'
    with the marked-word syntax, ''' with contractions."""
    latin = list(string.ascii_uppercase + string.ascii_lowercase)
    digits = list(string.digits)
    safe_symbols = list("!@#$%^&+=<>?/|~`()[]{}_-")
    greek_upper = [chr(c) for c in range(0x0391, 0x03A9 + 1) if c != 0x03A2]
    greek_lower = [chr(c) for c in range(0x03B1, 0x03C9 + 1)]
    cyr_upper = [chr(c) for c in range(0x0410, 0x042F + 1)]
    cyr_lower = [chr(c) for c in range(0x0430, 0x044F + 1)]
    return [latin, digits, safe_symbols, greek_upper, greek_lower, cyr_upper, cyr_lower]


@cache
def build_letters(token_id=ord) -> LetterSet:
    """Deterministic for a given ``token_id`` function (default: codepoint)."""
    letters: list[str] = []
    ids: list[int] = []
    seen: set[int] = set()
    for pool in _candidate_pools():
        for c in pool:
            tid = token_id(c)
            if tid is None or tid in seen:
                continue
            letters.append(c)
            ids.append(tid)
            seen.add(tid)
            if len(letters) >= NUM_LETTERS:
                break
        if len(letters) >= NUM_LETTERS:
            break
    if len(letters) < NUM_LETTERS:
        raise NotEnoughLettersError(len(letters), NUM_LETTERS)
    return LetterSet(tuple(letters), tuple(ids))
