from __future__ import annotations

import json
import os

import pytest

from vexere_lakehouse_pipeline_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    # Test-session knobs (suite-speed, round 11 — the driver's verify
    # gate has a wall-clock budget the full 660-test suite overran):
    #  - VLPS_TEST_CPUS (default 8): tests run tiny data; local[8]
    #    measured ~12% faster than local[32] on a representative file
    #    (less task-scheduling overhead on 32-way repartitions of
    #    50-row frames).  Operators read defaultParallelism
    #    dynamically, so nothing semantic depends on the width.
    #  - VLPS_TEST_SPARK_CONF: JSON dict of extra SQL confs for A/B
    #    experiments on the test session only.
    extra = json.loads(os.environ.get("VLPS_TEST_SPARK_CONF", "{}"))
    cpus = os.environ.get("VLPS_TEST_CPUS", "8")
    spark = build_session(
        "pytest",
        master=f"local[{cpus}]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    yield spark
