"""Incremental micro-batch: process only newly-appended source files."""

from pyspark.sql import functions as F

from cartwright_spark.sources.corpus import generate_pages
from cartwright_spark.sources.iceberg_lite import Catalog
from cartwright_spark.streaming.incremental import incremental_stage


def _transform(df):
    return df.select("url", F.length("text").alias("text_len"))


def test_incremental_processing(spark, tmp_path):
    cat = Catalog(str(tmp_path / "inc"))

    # initial source snapshot
    cat.write_table(generate_pages(spark, 100, partitions=2), "pages",
                    stage="pages", stage_key="pages:0")
    s1 = incremental_stage(spark, cat, "pages", "lens", _transform)
    assert s1 is not None and s1["row_count"] == 100

    # no new data → no-op
    assert incremental_stage(spark, cat, "pages", "lens", _transform) is None

    # append a new source snapshot (simulating arrival of new pages)
    cat.write_table(generate_pages(spark, 150, partitions=3), "pages",
                    stage="pages", stage_key="pages:1")
    s2 = incremental_stage(spark, cat, "pages", "lens", _transform)
    assert s2 is not None and s2["row_count"] == 150

    # exactly-once at file granularity: all increments together = 250 rows
    total = sum(s["row_count"] for s in cat.snapshots("lens"))
    assert total == 250
    assert incremental_stage(spark, cat, "pages", "lens", _transform) is None


def test_metrics_observe(spark):
    from cartwright_spark.plans.metrics import StageMetrics
    m = StageMetrics()
    df = spark.range(1000)
    with m.stage("count_stage"):
        observed = m.observe(df.where(F.col("id") % 2 == 0), "count_stage")
        observed.write.format("noop").mode("overwrite").save()
    stats = m.as_dict()
    assert stats["count_stage"]["rows_out"] == 500
    assert stats["count_stage"]["wall_sec"] > 0
