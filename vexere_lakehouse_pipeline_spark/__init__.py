"""vexere_lakehouse_pipeline_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the capabilities of the
reference lakehouse pipeline (KhangToof/vexere-lakehouse-pipeline): a
medallion (bronze/silver/gold) lakehouse with a cleaning/conforming
operator library, an 8-query analytics layer, text/NLP column operators,
plus large-scale training-data operators (dedup, similarity search,
text analysis, multimodal column plumbing).

Design stance (SURVEY.md §7.1): a library of composable operators over
the DataFrame API.  All query logic is declarative — Catalyst picks the
physical plan — and everything stays JVM-side (native Column
expressions) except where Python is unavoidable, in which case
Arrow-batched pandas UDFs are used.
"""

from vexere_lakehouse_pipeline_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
