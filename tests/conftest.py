from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# Spark Python workers are separate interpreters: prepend the sitecustomize
# shim dir + repo root to PYTHONPATH *before* any SparkSession starts so
# workers can self-install the vendored google.protobuf fallback (needed by
# transformWithState's state-server protocol). See compat/protobuf_compat.py.
from kafka_clickhouse_example_spark.compat.protobuf_compat import (  # noqa: E402
    pythonpath_entries,
)

# entry-wise comparison, not substring: "/root/repo" IS a substring of
# "/root/repo/contrib/pyworker_compat", and a substring test would then
# silently skip appending the repo root — workers couldn't import the
# package and the protobuf shim would no-op with no visible cause.
_existing = [p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep) if p]
_extra = [p for p in pythonpath_entries() if p not in _existing]
if _extra:
    os.environ["PYTHONPATH"] = os.pathsep.join(_extra + _existing)

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from kafka_clickhouse_example_spark.session import get_spark

    spark = get_spark("kce-spark-tests", cpus=8, driver_memory="4g")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness_dir() -> str:
    return SF_CORRECTNESS
