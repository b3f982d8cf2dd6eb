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

_extra = [p for p in pythonpath_entries() if p not in os.environ.get("PYTHONPATH", "")]
if _extra:
    os.environ["PYTHONPATH"] = os.pathsep.join(
        _extra + ([os.environ["PYTHONPATH"]] if os.environ.get("PYTHONPATH") else [])
    )

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
