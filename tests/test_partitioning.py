"""sized_partitions (engine/partitioning.py): the data-sized partition
clamp for iterative arc caches."""

from __future__ import annotations

from pysparkflow.engine.partitioning import ROWS_PER_PARTITION, sized_partitions


def test_sized_partitions_clamp(spark):
    df = spark.range(1)
    sess = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # tiny input -> 1 fat partition
    assert sized_partitions(0, df) == 1
    assert sized_partitions(ROWS_PER_PARTITION - 1, df) == 1
    # grows with the data, ~rows/150k
    assert sized_partitions(ROWS_PER_PARTITION * 7, df) == min(sess, 8)
    # never exceeds the session's cluster-tuned setting
    assert sized_partitions(10**12, df) == sess


def test_sized_partitions_respects_session_conf(spark):
    df = spark.range(1)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "500")
        assert sized_partitions(10**12, df) == 500
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
