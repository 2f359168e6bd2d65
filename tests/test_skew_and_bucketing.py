"""Skew-handling salted join correctness + bucketed-table co-located join
(Exchange elimination — the SCALING.md claims, verified on real plans)."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from pysparkflow.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # hot key 7 holds most rows
    large = spark.createDataFrame(
        [(7, i) for i in range(500)] + [(i % 5, 1000 + i) for i in range(50)],
        "k long, payload long",
    )
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(10)], "k long, name string")
    plain = {(r["k"], r["payload"], r["name"]) for r in large.join(small, "k").collect()}
    salted = {
        (r["k"], r["payload"], r["name"])
        for r in salted_join(large, small, on="k", factor=8).collect()
    }
    assert salted == plain and len(salted) == 550


def test_bucketed_join_eliminates_exchange(spark, sf_dir):
    # warehouse dir is a static conf — the session fixture sets it
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders.write.bucketBy(4, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable(
        "b_orders"
    )
    customer.write.bucketBy(4, "c_custkey").sortBy("c_custkey").mode("overwrite").saveAsTable(
        "b_customer"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan  # co-located: no shuffle
        assert j.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
