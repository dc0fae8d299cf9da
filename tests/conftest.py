from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from kafka_streams_task_spark.plans import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture()
def sf01_dir(sf_dir):
    """The sf0.01 sibling of the test data dir — for tests whose parameters
    are tuned on the 500-vector corpus (16-list coarse quantization is
    geometrically meaningless on the ~50-vector sf0.001 fixture). Derived
    from the same env-var convention as ``sf_dir`` rather than hardcoded."""
    base = os.path.dirname(sf_dir.rstrip("/"))
    d = os.path.join(base, "sf0.01")
    if not os.path.isdir(d):
        pytest.skip(f"no sf0.01 dataset next to {sf_dir}")
    return d
