from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from star_schema_etl_airflow_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
