"""trello_github_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL pipeline
(dashhive/trello-github-etl, surveyed in SURVEY.md), extended with
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Design principles (100 TB north star):
- Declarative DataFrame/SQL plans; Catalyst + AQE pick physical strategy.
- Broadcast joins for small dimensions; shuffle only on real keys.
- Built-in JVM functions in the hot path; Arrow-batched pandas UDFs
  only where semantics genuinely require imperative logic.
- No driver-side row loops; no collect() inside operators.
"""

__version__ = "0.1.0"
