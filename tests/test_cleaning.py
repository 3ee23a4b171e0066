"""Unit tests for the silver cleaning expressions (U1-U3 + categorizer)
against pure-Python oracles re-implementing the reference semantics
(convert/to_silver.py:16-75,117-128)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.functions.cleaning import (
    NORMALIZE_GENERIC_RULES,
    NORMALIZE_SPECIFIC_RULES,
    VIETNAMESE_CHARS,
    bus_type_category,
    normalize_place,
    parse_duration_hours,
    parse_price_vnd,
)


def python_normalize(text: str | None) -> str | None:
    """Pure-Python oracle with the reference's exact semantics."""
    if text is None:
        return None
    text = text.lower()
    for pattern, repl in NORMALIZE_GENERIC_RULES + NORMALIZE_SPECIFIC_RULES:
        text = re.sub(pattern, repl.replace("$2", r"\2"), text)
    text = re.sub(
        rf"[^a-z0-9\s{VIETNAMESE_CHARS}]", "", text, flags=re.IGNORECASE
    )
    return re.sub(r"\s+", " ", text).strip()


PLACE_CASES = [
    "BX Miền Tây",
    "VP Q5",
    "Ngã 4 ga QL1A",
    "tp hcm",
    "Bến xe Q9, TP.HCM",
    "sai gon nga tư ga",
    "sg sài gòn",
    "sài gòn sài gòn!!!",
    "KCN Tân Bình - tt chợ",
    "UBND TX Cai Lậy",
    "vanql1a suffix",  # lookbehind branch: ql glued to a word
    "  nhiều   khoảng   trắng  ",
    "ĐẶC BIỆT: chữ Hoa Có Dấu",
    "cd tt q12 ql 22",
    "",
]


def test_normalize_place_matches_python_oracle(spark):
    df = spark.createDataFrame([(s,) for s in PLACE_CASES], ["raw"])
    got = [
        r["norm"]
        for r in df.select(normalize_place("raw").alias("norm")).collect()
    ]
    want = [python_normalize(s) for s in PLACE_CASES]
    assert got == want


def test_normalize_place_idempotent(spark):
    df = spark.createDataFrame([(s,) for s in PLACE_CASES], ["raw"])
    once = df.select(normalize_place("raw").alias("x"))
    twice = once.select(normalize_place("x").alias("x"))
    assert [r["x"] for r in once.collect()] == [r["x"] for r in twice.collect()]


def test_normalize_null_safe(spark):
    df = spark.createDataFrame([(None,)], "raw string")
    assert df.select(normalize_place("raw").alias("n")).first()["n"] is None


DURATION_CASES = {
    "5h30m": 5.5,
    "5h": 5.0,
    "5h5m": pytest.approx(5.08, abs=0.005),
    # Reference quirk: re.match(r"(\d+)h?(\d*)m?") reads the first number
    # as hours even for "45m" → 45.0 (SURVEY §2.8 U2).
    "45m": 45.0,
    "Không rõ": None,
    "": None,
    None: None,
    "2h61m": pytest.approx(3.02, abs=0.005),
}


def test_parse_duration(spark):
    rows = [(k,) for k in DURATION_CASES]
    df = spark.createDataFrame(rows, "raw string")
    got = {
        r["raw"]: r["hours"]
        for r in df.select(
            "raw", parse_duration_hours("raw").alias("hours")
        ).collect()
    }
    for k, v in DURATION_CASES.items():
        assert got[k] == v, k


PRICE_CASES = {
    "150.000đ": 150000,
    "1.200.000 đ": 1200000,
    "Không rõ": None,
    "": None,
    None: None,
    "abc": None,
    "99đ": 99,
}


def test_parse_price(spark):
    df = spark.createDataFrame([(k,) for k in PRICE_CASES], "raw string")
    got = {
        r["raw"]: r["p"]
        for r in df.select("raw", parse_price_vnd("raw").alias("p")).collect()
    }
    for k, v in PRICE_CASES.items():
        assert got[k] == v, k


CATEGORY_CASES = {
    # one per branch (convert/to_silver.py:117-128), lowercased inputs
    "giường nằm 40 chỗ": "giường nằm",
    "huyndai solati 11 chỗ": "limousine ghế ngồi",
    "limousine ghế ngồi": "limousine ghế ngồi",
    "limousine giường nằm có wc": "limousine giường nằm có WC",
    "limousine giường nằm": "limousine giường nằm",
    "limousine giường massage": "limousine giường nằm",
    "limousine 22 chỗ": "limousine giường nằm",
    "limousine 22 phòng (có wc)": "limousine giường phòng",
    "ghế ngồi 29 chỗ": "ghế ngồi",
    "xe 16 chỗ": "khác",
}


def test_bus_type_category(spark):
    df = spark.createDataFrame(
        [(k,) for k in CATEGORY_CASES], "type_bus string"
    )
    got = {
        r["type_bus"]: r["cat"]
        for r in df.select(
            "type_bus", bus_type_category(F.col("type_bus")).alias("cat")
        ).collect()
    }
    assert got == CATEGORY_CASES


def test_redact_pii_urls_and_emails(spark):
    from vexere_lakehouse_pipeline_spark.functions.text import redact_pii

    rows = spark.createDataFrame(
        [
            ("contact bob@example.com or visit https://ex.com/a?b=1 now",),
            ("no pii here",),
            ("mail.to+x@sub-domain.example.org",),
            ("https://a.b/c bob@x.io trailing",),
        ],
        ["text"],
    ).select(redact_pii("text").alias("out"))
    got = [r.out for r in rows.collect()]
    assert got == [
        "contact <EMAIL> or visit <URL> now",
        "no pii here",
        "<EMAIL>",
        "<URL> <EMAIL> trailing",
    ]


def test_punct_ratio_not_inflated_by_vietnamese_diacritics(spark):
    from vexere_lakehouse_pipeline_spark.functions.text import quality_features

    rows = spark.createDataFrame(
        [("hà nội!",), ("ha noi!",)], ["text"]
    ).select(quality_features("text").alias("q")).collect()
    vi, ascii_ = rows[0]["q"], rows[1]["q"]
    # one '!' in 7 chars for both — diacritics must not count as punct
    assert vi["punct_ratio"] == ascii_["punct_ratio"]
