"""Storage-layout evidence for the 100 TB design: bucketed co-located joins
(no exchange) and partition pruning on date-partitioned writes."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    """Bucketing both sides on the join key co-locates matching rows at
    write time — later joins read bucket-aligned files with NO shuffle
    (the 100 TB strategy for repeated joins on url/orderkey)."""
    import shutil

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    # a previous crashed run may leave orphan managed-table dirs behind
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_b", "ord_b"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("li_b"))
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("ord_b"))

    # the sf0.001 dim is small enough that Catalyst would just broadcast it,
    # which hides the bucket alignment this test demonstrates; at real scale
    # neither side is broadcastable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("li_b")
             .join(spark.table("ord_b"),
                   F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus")
             .agg(F.round(F.sum("l_extendedprice"), 2).alias("s")))
        plan = _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # in the formatted tree, parents print above children: everything after
    # the join line is the join's subtree (the scans). No Exchange may
    # appear there — both inputs must come bucket-aligned from disk.
    tree = plan.split("\n\n")[0].splitlines()
    join_lines = [i for i, ln in enumerate(tree) if "Join" in ln]
    assert join_lines, plan
    subtree = "\n".join(tree[join_lines[0]:])
    assert "Exchange" not in subtree, subtree

    # and it returns the same result as the plain (shuffling) join
    plain = (li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
             .groupBy("o_orderstatus")
             .agg(F.round(F.sum("l_extendedprice"), 2).alias("s")))
    assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))


def test_partition_pruning_on_date_partitioned_write(spark, tmp_path):
    """Results partitioned by pub_date prune to the requested partitions at
    scan time (PartitionFilters) — the metrics/eval jobs over a date range
    never touch other days' files."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    out = str(tmp_path / "by_day")
    (ev.withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
     .write.partitionBy("day").mode("overwrite").parquet(out))

    q = (spark.read.parquet(out)
         .filter(F.col("day") == "2024-01-01")
         .groupBy("event_type").count())
    plan = _plan(q)
    assert "PartitionFilters" in plan
    assert "2024-01-01" in plan
    # pruned scan reads only that day's rows
    n_day = q.agg(F.sum("count")).first()[0]
    n_exp = ev.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-01").count()
    assert n_day == n_exp
