from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from headson_spark.session import get_spark
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("headson_spark_tests", master="local[8]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts_path(tmp_path_factory):
    from headson_spark.sources.transcripts import write_transcripts
    p = tmp_path_factory.mktemp("data") / "transcripts_sf001.parquet"
    return write_transcripts(str(p), sf=0.001)
