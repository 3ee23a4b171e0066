from __future__ import annotations

import pytest

from vexere_lakehouse_pipeline_spark.session import build_session

@pytest.fixture(scope="session")
def spark():
    spark = build_session("pytest", shuffle_partitions=8)
    yield spark
