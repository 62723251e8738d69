from __future__ import annotations

import pytest

from ipeds_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ipeds_etl_spark-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
