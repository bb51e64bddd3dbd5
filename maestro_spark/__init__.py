"""maestro_spark — a PySpark-native full-text indexing + BM25 query engine.

A from-scratch re-expression of overture-stack/maestro's indexing pipeline
(document build, exclusion rules, conflict detection, idempotent upsert,
delete, partitioned bulk writes, failure bookkeeping — see SURVEY.md §2)
with the Elasticsearch side (tokenize → postings → compress → merge →
BM25 top-k) rebuilt natively on Spark DataFrames + vectorized Arrow UDFs.

Reference semantics: /root/reference (maestro @ 2025-05-09). This is NOT a
port — the reference is cited in docstrings as ``file:line`` for parity
checking only.
"""

__version__ = "0.1.0"

from maestro_spark.session import get_spark  # noqa: F401
