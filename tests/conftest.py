from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def spark():
    from pumle_spark.session import get_spark

    import tempfile

    s = get_spark(
        app_name="pumle_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        # warehouse dir is a static conf — must be set at session build
        extra_conf={"spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark_wh_")},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
