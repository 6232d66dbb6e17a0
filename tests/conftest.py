from __future__ import annotations

import pytest


SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from detecting_and_addressing_change_spark.session import get_spark

    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
