"""Soundex phonetic blocking: archival fixtures, three-way engine
identity, and the skew-cap contract."""

from __future__ import annotations

import random

import duckdb

from word_sense_disambiguation_spark.functions.phonetic import (
    soundex_col,
    soundex_py,
    soundex_sql,
)
from word_sense_disambiguation_spark.operators.blocking import phonetic_key_pairs

# The canonical published examples (National Archives soundex spec):
# every special rule is covered — h/w collapse (Ashcraft), vowel
# separation (Tymczak), first-letter-code collapse (Pfister), padding
# (Lee), first-letter H/W (Whitney).
ARCHIVAL = {
    "Robert": "R163",
    "Rupert": "R163",
    "Ashcraft": "A261",
    "Ashcroft": "A261",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Jackson": "J250",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Whitney": "W350",
    "O'Brien": "O165",
    "Hw": "H000",
    "a": "A000",
    "": None,
    "123": None,
}


def test_soundex_python_archival():
    for s, want in ARCHIVAL.items():
        assert soundex_py(s) == want, s
    assert soundex_py(None) is None


def test_soundex_spark_matches_python_archival_and_fuzz(spark):
    rng = random.Random(7)
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ '-0189"
    fuzz = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 14)))
        for _ in range(300)
    ]
    vals = list(ARCHIVAL) + fuzz
    df = spark.createDataFrame([(s,) for s in vals], "s string").select(
        "s", soundex_col("s").alias("k")
    )
    got = {r.s: r.k for r in df.collect()}
    for s in vals:
        assert got[s] == soundex_py(s), repr(s)


def test_soundex_duckdb_template_matches_python():
    """The dialect='duckdb' rendering of the SAME template must agree
    with the python reference — the oracle-side half of the three-way
    identity (the Spark half is the test above)."""
    con = duckdb.connect()
    vals = [s for s in ARCHIVAL]
    con.sql(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("('" + s.replace("'", "''") + "')" for s in vals)
        + ") v(s)"
    )
    rows = dict(con.sql(f"SELECT s, {soundex_sql('s', 'duckdb')} FROM t").fetchall())
    for s in vals:
        assert rows[s] == soundex_py(s), repr(s)


def test_phonetic_key_pairs_blocks_and_cap(spark):
    rows = [
        (1, "Ashcraft"),
        (2, "Ashcroft"),
        (3, "Robert"),
        (4, "Rupert"),
        (5, "Rubert"),
        (6, "Zzz"),  # singleton -> no pairs
        (7, "123"),  # NULL key -> never pairs
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs, oversized = phonetic_key_pairs(df, "id", "name", max_block_size=16)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2), (3, 4), (3, 5), (4, 5)}
    assert oversized.count() == 0

    # Cap: the R163 block (3 members) is excluded at max_block_size=2 and
    # surfaced in the side table with its size — never silently dropped.
    pairs2, oversized2 = phonetic_key_pairs(df, "id", "name", max_block_size=2)
    assert {(r.id_a, r.id_b) for r in pairs2.collect()} == {(1, 2)}
    over = oversized2.collect()
    assert [(r.phonetic_key, r.block_size) for r in over] == [("R163", 3)]


def test_phonetic_key_is_pure_codegen(spark):
    """No python evaluation anywhere in the pair plan: the key is a
    translate/regexp expression chain, the cap an aggregate + anti-join."""
    df = spark.createDataFrame([(1, "Robert"), (2, "Rupert")], "id long, name string")
    pairs, _ = phonetic_key_pairs(df, "id", "name")
    plan = pairs._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "EvalPython" not in plan
    assert "translate" in plan
