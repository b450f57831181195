from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from postgres_cdc_reconciliation_spark.session import get_spark

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    extra = {"spark.sql.warehouse.dir": warehouse}
    import json as _json
    extra.update(_json.loads(os.environ.get("SPARK_GRAFT_TEST_EXTRA_CONF", "{}")))
    s = get_spark(
        app_name="pcr-tests",
        extra_conf=extra,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
