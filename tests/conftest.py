from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from delphi_pdf_parser_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    wh = str(tmp_path_factory.mktemp("spark_warehouse"))
    spark = get_spark(
        "pytest",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": wh},
    )
    yield spark
    spark.stop()
