from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# delta-spark cannot be vendored in this sandbox (no network, no Delta JVM
# jars anywhere on the image) — make the pure-Python protocol double
# importable as `delta` so the engine's storage_format='delta' branches
# execute in the suite (tests/delta_double/delta/__init__.py documents the
# subset + deviations).  Real delta-spark, when installed, wins by order.
import importlib.util  # noqa: E402

if importlib.util.find_spec("delta") is None:
    sys.path.append(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "delta_double")
    )

from trough_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("TROUGH_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="trough-spark-tests", shuffle_partitions=8)
    yield s
