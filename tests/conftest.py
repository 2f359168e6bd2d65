from __future__ import annotations

import pytest

from pysparkflow.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(
        app_name="pysparkflow-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/pysparkflow-warehouse"},
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
