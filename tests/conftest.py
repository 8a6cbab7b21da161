import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmquadtree_bin_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # small + fast for unit tests
    # 16g heap: the all-72 corpus execution + per-operator-codegen fallback
    # churn overflows the old 8g ("GC overhead limit exceeded"); box has 125g
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    s = get_spark(app="oqt-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs(spark):
    from osmquadtree_bin_spark.datagen import gen_docs

    return gen_docs(spark, n_docs=300, seed=42).cache()
