from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests


@pytest.fixture(scope="session")
def spark():
    from xmlschemavalidator_spark.session import get_spark

    s = get_spark(app_name="xmlschemavalidator-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


def rows(df, *cols):
    """Collect to a sorted list of tuples for exact assertions."""
    if cols:
        df = df.select(*cols)
    return sorted(tuple(r) for r in df.collect())
