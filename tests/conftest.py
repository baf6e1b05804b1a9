from __future__ import annotations

import pytest

from iceberg_diag_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="iceberg-diag-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()
