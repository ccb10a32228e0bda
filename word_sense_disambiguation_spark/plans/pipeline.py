"""End-to-end pipeline DAG: pages -> mentions -> candidates -> assignments.

The Spark re-expression of the reference's request lifecycle
(``/root/reference/wsd/word_sense_disambiguation.py:375-403``, SURVEY §3.1):
one linear DataFrame DAG whose only shuffles are (a) the per-mention window
in :func:`assign_senses` and (b) nothing else — the inventory join is
broadcast, tokenization/context is a single scan. At cluster scale the plan
is embarrassingly page-parallel until the tiny candidate-set aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from word_sense_disambiguation_spark.operators.candidates import candidates_for_mentions
from word_sense_disambiguation_spark.operators.scoring import (
    assign_senses,
    score_candidates,
)
from word_sense_disambiguation_spark.operators.tokenize import (
    mentions_from_pages,
    mentions_from_pages_sql,
)


def sense_assignments(
    pages: DataFrame, senses: DataFrame, use_html: bool = False
) -> DataFrame:
    """pages + inventory -> per-mention sense assignments (the flagship query).

    Uses the JVM-only mention extractor (whole-stage codegen, scales with
    cores) unless ``use_html`` demands python-side byte extraction; the two
    extractors are row-identical (tested), so the choice is purely physical.
    """
    if use_html:
        mentions = mentions_from_pages(pages, use_html=True)
    else:
        mentions = mentions_from_pages_sql(pages)
    cands = candidates_for_mentions(mentions, senses)
    scored = score_candidates(cands)
    return assign_senses(scored)
