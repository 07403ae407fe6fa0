from __future__ import annotations

import pytest

from sfguide_intro_to_cdc_using_snowflake_postgres_connector_dynamic_tables_spark.session import (
    get_spark,
)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()
