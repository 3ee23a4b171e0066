"""Column-level function library.

Everything here returns pyspark ``Column`` expressions built from
built-in functions — JVM-side, codegen-friendly — replacing the
reference's row-at-a-time Python UDFs (SURVEY.md §2.8).
"""

from vexere_lakehouse_pipeline_spark.functions.cleaning import (
    bus_type_category,
    normalize_place,
    parse_duration_hours,
    parse_price_vnd,
)
from vexere_lakehouse_pipeline_spark.functions.text import (
    bpe_ish_token_count,
    detect_language,
    document_fingerprint,
    quality_features,
    tokenize,
    whitespace_token_count,
)
from vexere_lakehouse_pipeline_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "normalize_place",
    "parse_duration_hours",
    "parse_price_vnd",
    "bus_type_category",
    "tokenize",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "detect_language",
    "quality_features",
    "document_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
