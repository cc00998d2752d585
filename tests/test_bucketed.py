"""Bucketed co-located join: assert the join plan has NO shuffle (Exchange).

This is the D2 co-location idea applied to the batch star schema: pay the
shuffle once at write time, never again per query.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark, tmp_path):
    # managed tables land in the session warehouse; isolate per test run
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(warehouse, sf_dir):
    spark = warehouse
    from tranquility_spark.sources.bucketed import bucketed_join, write_bucketed
    from tranquility_spark.sources.files import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 4)
    write_bucketed(li, "b_lineitem", "l_orderkey", 4)

    # at test scale the planner would broadcast (also shuffle-free, but that
    # proves nothing); disable it to exercise the big-big join path bucketing
    # is for — at 100 TB neither side of orders⋈lineitem broadcasts
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey", "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

        # and it is the same result as the plain join
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
