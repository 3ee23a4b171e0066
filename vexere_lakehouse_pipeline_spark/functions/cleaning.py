"""Cleaning / conforming expressions for the vexere silver layer.

The reference implements these as row-at-a-time Python UDFs
(`convert/to_silver.py:16-75` — `standardize_string`,
`convert_duration`, `remove_price_chars`) plus a 9-branch `when`
categorizer (`convert/to_silver.py:117-128`).  Python row UDFs force a
`BatchEvalPython` node — every row pickled across the JVM/Python
boundary, whole-stage codegen broken (SURVEY.md §4).  All four are
fully expressible as native Column chains, which is what this module
does; at 100 TB that is the difference between a codegen'd scan and a
Python-bound pipeline.

Order sensitivity: the normalizer's rules are an *ordered* rewrite
list (generic abbreviation expansion first, then specific fixups, then
charset scrub, then whitespace collapse).  They are encoded as data so
tests can verify rule-by-rule parity against a pure-Python oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Vietnamese lowercase diacritic alphabet (used in the charset scrub).
VIETNAMESE_CHARS = (
    "áàảãạăắằẳẵặâấầẩẫậéèẻẽẹêếềểễệíìỉĩịóòỏõọ"
    "ôốồổỗộơớờởỡợúùủũụưứừửữựýỳỷỹỵđ"
)

# Ordered rewrite rules: (java_regex, replacement).
# Semantics follow convert/to_silver.py:22-46 (canonical plugin ordering —
# generic rules, then specific fixups).  Java regex notes:
#  - `\b` is Unicode-aware in BOTH Java and Python `re`, so the boundary
#    patterns agree on these tokens.  Java's `\w` (used in a lookbehind
#    below) is ASCII-only though, unlike Python's: a diacritic letter
#    directly touching an abbreviation (e.g. "bộql1") is expanded by a
#    Python re-implementation but not by Spark.  Real place names always
#    separate with whitespace/punctuation, and the unit tests pin the
#    Spark behavior as canonical.
#  - Python backrefs `\2` become `$2` in Java replacement strings.
NORMALIZE_GENERIC_RULES: tuple[tuple[str, str], ...] = (
    (r"\b(q([0-9]+))\b", "quận $2"),
    (r"(?<=\w)(ql\s*([0-9]+[a-z]?))\b", " quốc lộ $2"),
    (r"\b(ql\s*([0-9]+[a-z]?))\b", "quốc lộ $2"),
    (r"\btp\b", "thành phố"),
    (r"\bvp\b", "văn phòng"),
    (r"\bkcn\b", "khu công nghiệp"),
    (r"\bhcm\b", "hồ chí minh"),
    (r"\bbx\b", "bến xe"),
    (r"\btx\b", "thị xã"),
    (r"\bsg\b", "sài gòn"),
    (r"\bubnd\b", "uỷ ban nhân dân"),
    (r"\btt\b", ""),
    (r"\bcd\b", ""),
)

NORMALIZE_SPECIFIC_RULES: tuple[tuple[str, str], ...] = (
    (r"\bsai gon nga tư ga\b", "sài gòn ngã 4 ga"),
    (r"\bsai gon\b", "sài gòn"),
    (r"\bngã tư an sươngquốc lộ 1a\b", "ngã tư an sương quốc lộ 1a"),
    (r"sg sài gòn", "sài gòn"),
    (r"sài gòn sài gòn", "sài gòn"),
)


def normalize_place(col: Column | str) -> Column:
    """Vietnamese place-name normalizer (U1) as a native expression chain.

    lowercase → ordered abbreviation expansions → specific fixups →
    strip chars outside [a-z0-9\\s] + Vietnamese diacritics → collapse
    whitespace → trim.  Null-safe (regexp_replace propagates null).
    """
    out = F.lower(F.col(col) if isinstance(col, str) else col)
    for pattern, repl in NORMALIZE_GENERIC_RULES + NORMALIZE_SPECIFIC_RULES:
        out = F.regexp_replace(out, pattern, repl)
    # Charset scrub is case-insensitive in the reference; input is already
    # lowercased, so (?i) only matters for uppercase diacritics — keep it.
    out = F.regexp_replace(out, f"(?i)[^a-z0-9\\s{VIETNAMESE_CHARS}]", "")
    out = F.regexp_replace(out, r"\s+", " ")
    return F.trim(out)


def parse_duration_hours(col: Column | str, decimals: int = 2) -> Column:
    """``"5h30m" | "5h" | "45m"`` → fractional hours (U2).

    Mirrors `re.match(r"(\\d+)h?(\\d*)m?")` semantics
    (convert/to_silver.py:61-69): the first number is hours *even when
    suffixed with m* ("45m" → 45 hours — a reference quirk kept for
    parity); a second number is minutes; no leading digits → null.
    """
    c = F.col(col) if isinstance(col, str) else col
    hours = F.regexp_extract(c, r"^(\d+)h?(\d*)m?", 1)
    minutes = F.regexp_extract(c, r"^(\d+)h?(\d*)m?", 2)
    result = F.when(
        hours != "",
        hours.cast("double")
        + F.coalesce(F.nullif(minutes, F.lit("")).cast("double"), F.lit(0.0)) / 60.0,
    )
    return F.round(result, decimals).cast("float")


def parse_price_vnd(col: Column | str) -> Column:
    """``"150.000đ"`` → 150000 int; empty/no-digits → null (U3,
    convert/to_silver.py:71-75)."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_replace(c, "[^0-9]", "")
    return F.nullif(digits, F.lit("")).cast("int")


def bus_type_category(type_bus_lower: Column | str) -> Column:
    """9-branch seat-type categorizer (convert/to_silver.py:117-128).

    Input must already be lowercased (the silver flow lowercases
    Type_Bus first).  Branch order is semantic — e.g. plain "giường
    nằm" must be tested before the limousine branches.
    """
    c = F.col(type_bus_lower) if isinstance(type_bus_lower, str) else type_bus_lower
    return (
        F.when(
            c.like("%giường nằm%") & ~c.like("%limousine%"), "giường nằm"
        )
        .when(c.like("%huyndai solati 11 chỗ%"), "limousine ghế ngồi")
        .when(c.like("%limousine%") & c.like("%ghế ngồi%"), "limousine ghế ngồi")
        .when(
            c.like("%limousine%") & c.like("%giường nằm có wc%"),
            "limousine giường nằm có WC",
        )
        .when(
            c.like("%limousine%") & (c.like("%giường nằm%") | c.like("%giường%")),
            "limousine giường nằm",
        )
        .when(c.rlike(r"limousine.*[0-9]+\s*chỗ"), "limousine giường nằm")
        .when(c.like("%phòng%"), "limousine giường phòng")
        .when(c.like("%ghế ngồi%"), "ghế ngồi")
        .otherwise("khác")
    )


def daypart(hour_col: Column) -> Column:
    """Hour → daypart bucket tag (gold cau_1, convert/to_gold.py:35-40)."""
    return (
        F.when(hour_col.between(0, 5), "00h-05h")
        .when(hour_col.between(6, 11), "06h-11h")
        .when(hour_col.between(12, 17), "12h-17h")
        .when(hour_col.between(18, 23), "18h-23h")
    )


def conform_ticket_columns(df):
    """The canonical raw-ticket conform chain (to_silver.py:110-134
    semantics, UDF-free): typed date, normalized places, parsed
    duration/price, lowercased type + 9-way category.  ONE definition
    shared by the batch pipeline (plans/pipeline.ticket_to_silver) and
    the streaming variant (streaming/ingest.stream_tickets_to_silver)
    so the two silver paths can never drift."""
    from pyspark.sql import functions as F

    return (
        df.withColumn("Start_Date", F.to_date("Start_Date", "dd-MM-yyyy"))
        .withColumn("Departure_Place", normalize_place("Departure_Place"))
        .withColumn("Arrival_Place", normalize_place("Arrival_Place"))
        .withColumn("Duration", parse_duration_hours("Duration"))
        .withColumn("Price", parse_price_vnd("Price"))
        .withColumn("Type_Bus", F.lower(F.col("Type_Bus")))
        .withColumn("Bus_Type_Category", bus_type_category(F.col("Type_Bus")))
    )
