"""plans/lint.py: the product-facing plan linter flags the shapes the
test suite pins — single-reducer windows, cartesians, row-wise Python
UDFs — and stays quiet on the engine's own clean plans."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_hw_23_24_spark.plans.lint import lint


def test_lint_flags_partitionless_window(spark):
    df = spark.range(100).withColumn(
        "r", F.row_number().over(Window.orderBy("id")))
    rules = {f.rule for f in lint(df)}
    assert "partitionless_window" in rules


def test_lint_flags_cartesian_and_row_udf(spark):
    from pyspark.sql.functions import udf

    a, b = spark.range(10), spark.range(10)
    assert {f.rule for f in lint(a.crossJoin(b))} == {"cartesian"}

    plus = udf(lambda x: x + 1, "long")
    df = spark.range(10).select(plus("id").alias("y"))
    assert {f.rule for f in lint(df)} == {"python_row_udf"}


def test_lint_quiet_on_clean_shuffle_plans(spark):
    df = (spark.range(1000)
          .withColumn("k", F.col("id") % 7)
          .groupBy("k").count()
          .withColumn("r", F.row_number().over(
              Window.partitionBy("k").orderBy("count"))))
    assert lint(df) == []


def test_lint_matches_engine_known_cases(spark):
    """The engine's own plans: a vocab-scale query carries exactly the
    declared partitionless window; the bloom-probe query carries
    exactly the bounded BNLJ — the linter reports both (callers
    allowlist), and a clean star join reports neither."""
    from big_data_hw_23_24_spark.queries import _ensure_loaded, _REGISTRY

    _ensure_loaded()
    sf = "/root/testdata/sf0.001"
    vocab = lint(_REGISTRY["vocab_coverage"].spark_fn(spark, sf))
    assert "partitionless_window" in {f.rule for f in vocab}
    bloom = lint(_REGISTRY["parts_size50_revenue_bloom"]
                 .spark_fn(spark, sf))
    assert {f.rule for f in bloom} == {"cartesian"}  # the 1-row probe
    clean = lint(_REGISTRY["revenue_by_nation"].spark_fn(spark, sf))
    assert clean == []
