from __future__ import annotations

import os

import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"
FIXTURES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "fixtures")


@pytest.fixture(scope="session")
def spark():
    from big_data_hw_23_24_spark.session import get_session

    # Small driver heap + fewer shuffle partitions: test data is tiny
    # and pytest runs many jobs; keep scheduling overhead low.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    spark = get_session("tests", master="local[8]",
                        extra_confs={"spark.sql.shuffle.partitions": "8"})
    yield spark


@pytest.fixture(scope="session")
def testn15(spark):
    from big_data_hw_23_24_spark.sources import read_points_csv
    from pyspark.sql import functions as F

    df = read_points_csv(spark, os.path.join(FIXTURES, "testn15.csv"))
    return df.withColumn("pid", F.monotonically_increasing_id()).cache()
