"""Archival American Soundex as a PORTABLE SQL expression.

Classic record-linkage phonetic blocking (Russell/Odell; the canonical
treatment is Fellegi-Sunter-era census matching): names that sound alike
share a 4-char key, so "Ashcraft"/"Ashcroft" land in one block without any
pairwise string distance. This is the phonetic member of the engine's
blocking family next to surface-key equi-blocking and MinHash-LSH
(``operators/blocking.py``) — the reference's analogue of a cheap
candidate key is its ``(lemma, pos)`` definition lookup
(``/root/reference/wsd/word_sense_disambiguation.py:384-387``).

Portability contract (the engine-wide oracle discipline): the key is
defined ONCE as a SQL expression template built from only
``upper/translate/regexp_replace/substr/concat/rpad/CASE`` — functions
with verified-identical semantics in Spark SQL and DuckDB (including
"``translate`` deletes source chars whose replacement is exhausted",
empirically pinned in tests). The SAME template drives ``F.expr`` on the
Spark side and the DuckDB oracle, so the two engines cannot drift; the
single dialect knob is DuckDB's ``'g'`` flag (its ``regexp_replace``
replaces only the first match by default — pinned in test). No regex
backreferences in replacements (Java wants ``$1``, RE2 wants ``\\1`` —
the other place the regex dialects diverge); run-collapsing uses six
literal per-digit patterns instead.

Rules implemented (archival American Soundex, verified against the
canonical published examples Robert/Rupert→R163, Ashcraft/Ashcroft→A261,
Tymczak→T522, Pfister→P236, Honeyman→H555):

* letters only, case-insensitive; empty after stripping → NULL;
* B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6;
* H and W are DELETED before run-collapsing (so same-code consonants
  separated by h/w collapse: the Ashcraft rule);
* vowels A E I O U Y code to '0', which breaks runs (Tymczak rule) and
  is then removed;
* the first letter's own code participates in collapsing (Pfister rule)
  and is then dropped — unless the first letter is H/W, which never
  emitted a code;
* result = first letter + first 3 surviving digits, zero-padded.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# B F P V -> 1 | C G J K Q S X Z -> 2 | D T -> 3 | L -> 4 | M N -> 5 |
# R -> 6 | vowels+Y -> 0 (run breaker) | H W -> deleted (no target char).
SDX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
SDX_TO = "111122222222334556000000"


def _collapse_runs(expr: str, g: str) -> str:
    """Collapse adjacent repeats of each code digit — six literal
    patterns, no backreference replacement (portability contract)."""
    for d in "123456":
        expr = f"regexp_replace({expr}, '{d}{d}+', '{d}'{g})"
    return expr


def soundex_sql(col_expr: str, dialect: str = "spark") -> str:
    """The Soundex key of ``col_expr`` as ONE portable SQL string.

    The identical template drives both engines; the single dialect knob
    is DuckDB's ``'g'`` regexp_replace flag (DuckDB replaces only the
    FIRST match by default where Spark replaces all — the engine-wide
    oracle convention, same as the whitespace-collapse oracles in
    ``__spark_entry__``).
    """
    g = ", 'g'" if dialect == "duckdb" else ""
    u = f"upper(regexp_replace({col_expr}, '[^A-Za-z]', ''{g}))"
    first = f"substr({u}, 1, 1)"
    # Code the first letter and the tail with one map; concat puts the
    # first letter's code adjacent to the tail's leading run so the
    # collapse merges them (Pfister). H/W first letters emit no code, so
    # nothing is dropped for them afterwards.
    fcode = f"translate({first}, '{SDX_FROM}', '{SDX_TO}')"
    coded = f"translate(substr({u}, 2), '{SDX_FROM}', '{SDX_TO}')"
    collapsed = _collapse_runs(f"concat({fcode}, {coded})", g)
    body = (
        f"CASE WHEN {first} IN ('H', 'W') THEN {collapsed} "
        f"ELSE substr({collapsed}, 2) END"
    )
    digits = f"replace({body}, '0', '')"
    return (
        f"CASE WHEN {u} = '' THEN NULL "
        f"ELSE concat({first}, rpad(substr({digits}, 1, 3), 3, '0')) END"
    )


def soundex_col(col_expr: str) -> Column:
    """Soundex as a Spark Column (pure codegen — no UDF, no shuffle).

    ``col_expr`` is a column name or SQL expression string — the same
    string the oracle side passes to :func:`soundex_sql`."""
    return F.expr(soundex_sql(col_expr))


_LETTERS_RE = re.compile(r"[^A-Za-z]")
_RUN_RES = [re.compile(f"{d}{d}+") for d in "123456"]
# str.maketrans needs equal-length map strings; H/W (the last two source
# chars, unmapped in SDX_TO) go in the delete argument instead.
_SDX_TRANS = str.maketrans(SDX_FROM[:24], SDX_TO, "HW")


def soundex_py(s: str | None) -> str | None:
    """Python reference implementation — mirrors :func:`soundex_sql`
    operation for operation; the property test pins the three-way
    (Spark == DuckDB == python) identity on random strings."""
    if s is None:
        return None
    u = _LETTERS_RE.sub("", s).upper()
    if not u:
        return None
    first = u[0]
    collapsed = (first + u[1:]).translate(_SDX_TRANS)
    for rx in _RUN_RES:
        collapsed = rx.sub(lambda m: m.group(0)[0], collapsed)
    body = collapsed if first in ("H", "W") else collapsed[1:]
    digits = body.replace("0", "")
    return first + digits[:3].ljust(3, "0")
