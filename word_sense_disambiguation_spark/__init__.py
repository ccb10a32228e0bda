"""PySpark-native entity-resolution / word-sense-disambiguation engine.

A from-scratch Spark re-expression of the semantics of the reference
``sign/word-sense-disambiguation`` service (see SURVEY.md): a three-stage
record-linkage pipeline over Common-Crawl-style web-page tables —

1. **blocking**   — normalized surface-form keys + MinHash-LSH banding,
2. **scoring**    — vectorized (Arrow) pairwise scoring: Lesk gloss overlap,
   Jaro-Winkler / Levenshtein / embedding cosine,
3. **clustering** — iterative large-star/small-star connected components
   assigning canonical entity ids,

plus the training-data-pipeline operators a 100 TB corpus needs (dedup,
similarity search, text quality analysis).

Everything is DataFrame-first: built-in ``pyspark.sql.functions`` on the hot
path, Arrow-batched pandas UDFs only where Spark has no native operator.
"""

__version__ = "0.1.0"
