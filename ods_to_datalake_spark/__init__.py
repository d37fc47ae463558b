"""ods_to_datalake_spark — a PySpark-native ODS→data-lake analytics engine.

A brand-new, idiomatic-Spark implementation of the query and data-processing
capabilities of the reference repo santitee/ods_to_datalake (see SURVEY.md),
generalized into reusable, 100-TB-scale operators, plus LLM-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal plumbing).

Design rules (see SURVEY.md §4, §7):
- DataFrame/SQL only; no RDDs in the hot path.
- Built-in `pyspark.sql.functions` first; Arrow-batched pandas UDFs only
  where built-ins genuinely can't express the semantics.
- Declarative plans → Catalyst does pushdown/pruning/broadcast; we add
  explicit `broadcast()` on known-small dims and partition-layout policy
  at the writer.
"""

from ods_to_datalake_spark.session import build_session, get_session

__all__ = ["build_session", "get_session"]
__version__ = "0.1.0"
