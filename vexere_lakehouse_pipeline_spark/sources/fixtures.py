"""Deterministic synthetic producers for the bronze contracts.

Shapes per FIXTURES.md (derived from the crawlers' real output:
crawl/crawl_ticket.py:106, crawl_faci.py:297-301,
crawl_reviews.py:434-441).  Seeded — same inputs → same rows — so
pipeline tests are golden-stable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession

from vexere_lakehouse_pipeline_spark.catalog import (
    BUS_IDS_SCHEMA,
    RAW_FACILITY_SCHEMA,
    RAW_REVIEW_SCHEMA,
    RAW_TICKET_SCHEMA,
)

OPERATORS = [
    "Phương Trang", "Thành Bưởi", "Kim Hoàng", "Huệ Nghĩa", "Tuấn Hưng",
    "Mai Linh", "Hùng Cường", "Việt Đức", "Khải Nam", "Ngọc Ánh",
]

ROUTES = [
    "TP.HCM - Can Tho", "TP.HCM - An Giang", "TP.HCM - Tien Giang",
    "TP.HCM - Kien Giang", "TP.HCM - Hau Giang", "TP.HCM - Long An",
    "TP.HCM - Tra Vinh", "TP.HCM - Soc Trang", "TP.HCM - Dong Thap",
    "TP.HCM - Vinh Long", "TP.HCM - Bac Lieu", "TP.HCM - Ca Mau",
    "TP.HCM - Ben Tre",
]

PLACES = [
    "BX Miền Tây", "VP Q5", "Ngã 4 ga QL1A", "tp hcm", "Bến xe Q9, TP.HCM",
    "KCN Tân Bình", "UBND TX Cai Lậy", "sg sài gòn", "BX An Sương",
]

TYPE_BUSES = [
    "Giường nằm 40 chỗ", "Limousine ghế ngồi", "Limousine 22 Phòng (có WC)",
    "Huyndai Solati 11 chỗ", "Ghế ngồi 29 chỗ", "Xe 16 chỗ",
    "Limousine giường nằm có WC", "Limousine Giường nằm 34 chỗ",
]

FACILITIES = [f"Facility {i:02d}" for i in range(1, 22)]  # exactly 21 (cau_8)

VI_COMMENTS = [
    "xe chạy êm, tài xế thân thiện", "ghế thoải mái nhưng hơi chậm",
    "dịch vụ tốt, sẽ đi lại", "xe trễ giờ, không hài lòng",
]
EN_COMMENTS = [
    "great trip, very comfortable", "the bus was late and crowded",
    "friendly driver and clean seats", "no comment",
]


def messy_ticket_row(rng: random.Random, key: int, day: str) -> tuple:
    """ONE raw ticket row in the crawler's messy string shape —
    the single source of truth shared by the batch fixture below and
    the executor-side generator in sources/ticket_source.py (two
    copies would drift apart on the mess probabilities/formats)."""
    op = rng.choice(OPERATORS)
    h, m = rng.randrange(24), rng.choice(("00", "15", "30", "45"))
    dur_h, dur_m = rng.randrange(1, 8), rng.randrange(60)
    price = rng.randrange(90, 1300) * 1000
    return (
        str(key),
        op,
        day,
        rng.choice(ROUTES),
        "Không rõ" if rng.random() < 0.03 else f"{h:02d}:{m}",
        f"{(h + dur_h) % 24:02d}:{m}",
        rng.choice(PLACES),
        rng.choice(PLACES),
        rng.choice((f"{dur_h}h{dur_m}m", f"{dur_h}h", "Không rõ", ""))
        if rng.random() < 0.1
        else f"{dur_h}h{dur_m}m",
        rng.choice(TYPE_BUSES),
        "Không rõ" if rng.random() < 0.02 else f"{price:,}đ".replace(",", "."),
    )


def raw_tickets(spark: SparkSession, days: tuple[str, ...] = ("01-05-2025",),
                rows_per_day: int = 240, seed: int = 42) -> DataFrame:
    """Messy raw ticket rows (all strings) for the given dd-MM-yyyy days."""
    rng = random.Random(seed)
    rows = []
    key = 0
    for day in days:
        for _ in range(rows_per_day):
            key += 1
            rows.append(messy_ticket_row(rng, key, day))
    return spark.createDataFrame(rows, RAW_TICKET_SCHEMA)


def raw_facilities(spark: SparkSession, seed: int = 42) -> DataFrame:
    """Facility records; Facilities is the raw *string* form — half real
    JSON-ish lists will arrive as arrays in practice, half as
    stringified Python lists (dual-schema branch, to_silver.py:147-152).
    Includes empty-list and [""] rows that silver must filter."""
    rng = random.Random(seed)
    rows = []
    for i, op in enumerate(OPERATORS, start=1):
        n = rng.choice((1, 3, 8, 21))
        facs = rng.sample(FACILITIES, n)
        rows.append((i, op, "[" + ", ".join(f"'{f}'" for f in facs) + "]"))
    rows.append((len(rows) + 1, "Ghost Lines", "[]"))
    rows.append((len(rows) + 1, "Empty Lines", "['']"))
    return spark.createDataFrame(rows, RAW_FACILITY_SCHEMA)


def raw_reviews(spark: SparkSession, seed: int = 42,
                heavy_ops: int = 2, heavy_n: int = 60,
                light_n: int = 10) -> DataFrame:
    """Reviews: >=50 for the first ``heavy_ops`` operators (cau_6 HAVING
    threshold), fewer for the rest; vi and en comments mixed."""
    rng = random.Random(seed)
    rows = []
    for i, op in enumerate(OPERATORS):
        n = heavy_n if i < heavy_ops else light_n
        for j in range(n):
            vi = rng.random() < 0.6
            rows.append(
                (
                    op,
                    rng.choice(("Nguyễn Văn A", "Trần B", "Unknown")),
                    rng.randrange(6),
                    rng.choice(VI_COMMENTS if vi else EN_COMMENTS),
                    f"{rng.randrange(1, 29):02d}/04/2025 10:{j % 60:02d}",
                )
            )
    return spark.createDataFrame(rows, RAW_REVIEW_SCHEMA)


def bus_ids(spark: SparkSession) -> DataFrame:
    """Conformance dimension; deliberately misses the last operator so
    left-join-null semantics are exercised (FIXTURES.md §4)."""
    rows = [
        (op, str(12000 + i)) for i, op in enumerate(OPERATORS[:-1])
    ] + [("Xe Không Vé", "99999")]
    return spark.createDataFrame(rows, BUS_IDS_SCHEMA)
