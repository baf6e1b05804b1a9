"""Salted two-stage aggregation: result equality with the direct
groupBy on a deliberately skewed key distribution, and the fan-out
property (stage-1 groups >> distinct keys for the hot key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_diag_spark.functions.skew import salted_agg


def test_salted_agg_equals_direct(spark):
    # 100k rows, 90% on one hot key — the shape that melts a single
    # reduce task at scale
    df = spark.range(100_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("key"),
        (F.col("id") % 997).alias("v"),
    )
    got = salted_agg(
        df,
        ["key"],
        {
            "cnt": ("sum", F.count("*")),
            "total": ("sum", F.sum("v")),
            "vmin": ("min", F.min("v")),
            "vmax": ("max", F.max("v")),
        },
        n_salts=16,
    )
    want = df.groupBy("key").agg(
        F.count("*").alias("cnt"),
        F.sum("v").alias("total"),
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_stage1_fans_out(spark):
    df = spark.range(10_000).select(F.lit("only").alias("key"), F.col("id").alias("v"))
    salted = df.withColumn("__salt", (F.rand(seed=42) * 16).cast("int"))
    n_groups = salted.select("key", "__salt").distinct().count()
    assert n_groups > 8  # the single hot key splits across salts


def test_skew_audit_known_distribution(spark):
    from iceberg_diag_spark.functions.skew import skew_audit

    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold",)] * 10
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_audit(df, "k", top_k=2).collect()}
    assert len(out) == 2
    assert out[1].key_repr == "hot" and out[1].share_ppm == 700_000
    assert out[2].key_repr == "warm" and out[2].share_ppm == 200_000
    assert out[1].n_keys == 3 and out[1].total_rows == 100


def test_skew_audit_null_key_sentinel(spark):
    # a NULL-heavy key is the classic real-world hot key; it must
    # appear in the audit as the '(null)' sentinel (not vanish, and
    # not depend on engine NULL-ordering at the top-k boundary)
    from iceberg_diag_spark.functions.skew import skew_audit

    rows = [(None,)] * 60 + [("a",)] * 25 + [("b",)] * 15
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_audit(df, "k", top_k=2).collect()}
    assert out[1].key_repr == "(null)" and out[1].share_ppm == 600_000
    assert out[2].key_repr == "a"
    assert out[1].n_keys == 3


def test_join_cardinality_exact_vs_real_join(spark):
    from iceberg_diag_spark.functions.skew import join_cardinality

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (3,), (4,)], "k long"
    )
    row = join_cardinality(left, right, "k").collect()[0]
    real = left.join(right, "k").count()
    assert row.join_rows == real == 7  # 2*3 + 1*1
    assert row.worst_key_repr == "1" and row.worst_key_rows == 6
    assert row.n_left == 4 and row.n_right == 5 and row.n_join_keys == 2


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime-skew evidence: with AQE skew-join enabled, a sort-merge
    join whose left side piles ~99% of rows onto one key must show
    split skewed partitions (`skew=true` on the SMJ) in the FINAL
    adaptive plan — the mechanism that replaces manual salting for
    joins at 100 TB. Thresholds are lowered so test-scale bytes
    qualify; production keeps the defaults."""
    keys = (
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.forceOptimizeSkewedJoin",
    )
    old = {}
    for k in keys:
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "65536",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536"
        )
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.enabled", "false"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # the aggregate downstream requires the join's partitioning;
        # splitting skewed partitions adds a shuffle, which AQE only
        # does when forced — production pipelines set this when the
        # skew save outweighs one extra exchange
        spark.conf.set(
            "spark.sql.adaptive.forceOptimizeSkewedJoin", "true"
        )

        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7))
            .otherwise(F.col("id"))
            .alias("k"),
            # data-dependent pad: a constant would fold away and the
            # column pruner would empty the skewed shuffle
            F.concat(
                F.repeat(F.lit("x"), 100), F.col("id").cast("string")
            ).alias("pad"),
        )
        right = spark.range(0, 2_000).select(
            F.col("id").alias("k"), F.lit(1).alias("v")
        )
        # max(pad) keeps the padding column alive through the join
        # shuffle (else column pruning shrinks the skewed partition
        # below the byte threshold at test scale)
        joined = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.max("pad").alias("p"))
        )
        assert len(joined.collect()) > 0  # same QE → AQE finalizes
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
