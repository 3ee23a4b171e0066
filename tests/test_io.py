"""Contract-enforced IO layer tests (S1-S3, S7)."""

from __future__ import annotations

import json
import os

from vexere_lakehouse_pipeline_spark import io as vio
from vexere_lakehouse_pipeline_spark.catalog import (
    RAW_REVIEW_SCHEMA,
    RAW_TICKET_SCHEMA,
)


def test_read_csv_with_contract(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text(
        "Bus_Key,Bus_Name,Start_Date,Route,Departure_Time,Arrival_Time,"
        "Departure_Place,Arrival_Place,Duration,Type_Bus,Price\n"
        '1,Phương Trang,01-05-2025,TP.HCM - Can Tho,06:30,10:00,"BX Miền Tây",'
        '"BX Cần Thơ",3h30m,Giường nằm 40 chỗ,150.000đ\n'
    )
    df = vio.read_csv(spark, str(p), RAW_TICKET_SCHEMA)
    assert df.schema == RAW_TICKET_SCHEMA
    row = df.first()
    assert row["Bus_Name"] == "Phương Trang"
    assert row["Price"] == "150.000đ"


def test_read_json_line_and_multiline(spark, tmp_path):
    rows = [
        {"Bus_Name": "A", "Customer_Name": "x", "Stars": 5,
         "Comment": "good", "Date": "01/05/2025 10:00"},
        {"Bus_Name": "B", "Customer_Name": "y", "Stars": 1,
         "Comment": "bad", "Date": "02/05/2025 11:00"},
    ]
    nd = tmp_path / "nd.json"
    nd.write_text("\n".join(json.dumps(r) for r in rows))
    ml = tmp_path / "ml.json"
    ml.write_text(json.dumps(rows, indent=2))
    a = vio.read_json(spark, str(nd), RAW_REVIEW_SCHEMA)
    b = vio.read_json(spark, str(ml), RAW_REVIEW_SCHEMA, multi_line=True)
    assert a.count() == b.count() == 2
    assert a.schema == b.schema == RAW_REVIEW_SCHEMA


def test_write_single_json(spark, tmp_path):
    df = spark.range(5).selectExpr("id", "id * 2 AS double_id")
    out = str(tmp_path / "out")
    vio.write_single_json(df, out)
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) == 1
    back = spark.read.json(out)
    assert back.count() == 5
