from __future__ import annotations

import os

import duckdb
import pytest

from core2_spark.catalog import TABLES, table_path
from core2_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute fuzz/soak test — excluded from the default "
        "run; opt in with -m slow, --runslow, or SPARK_GRAFT_RUN_SLOW=1",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="also run tests marked slow",
    )


def pytest_collection_modifyitems(config, items):
    """Default `pytest tests/` excludes @pytest.mark.slow (VERDICT r11
    task 2: the full suite grew past the driver's verify budget — the
    r11 driver run was cut off at ~17% with zero failures).  The slow
    tier still runs via -m slow / --runslow / SPARK_GRAFT_RUN_SLOW=1;
    each slow test keeps a fast default-tier sibling where the covered
    machinery is gate-relevant."""
    if (
        config.getoption("--runslow")
        or os.environ.get("SPARK_GRAFT_RUN_SLOW")
        or "slow" in (config.getoption("-m") or "")
    ):
        return
    skip = pytest.mark.skip(
        reason="slow tier: opt in with -m slow / --runslow / "
        "SPARK_GRAFT_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="core2-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(SF_DIR, name)}')"
        )
    yield con
    con.close()
