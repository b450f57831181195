"""postgres_cdc_reconciliation_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference system ``holdersav20001/postgres-cdc-reconciliation``
(a Postgres → Debezium → Kafka → Postgres CDC reconciliation stack), plus the
large-scale data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB training-data pipeline needs.

Design principles (see SURVEY.md):
- Declarative DataFrame/SQL plans; let Catalyst+AQE pick physical strategy.
- Zero row-at-a-time Python UDFs on the hot path; Arrow/pandas UDFs only where
  built-ins cannot express the semantics (embeddings, multimodal decode).
- LSN (Postgres log sequence number) encoded as BIGINT for free ordering,
  joins, and byte-distance arithmetic.
- All "now"-relative logic is parameterized by ``as_of`` for determinism.
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
