from __future__ import annotations

import os
import sys

import pytest

# Make the repo root importable (package + __spark_entry__).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from cae_polars_tools_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    spark = get_spark(
        app_name="cae-polars-tools-spark-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_small() -> str:
    return SF_SMALL


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
