"""S7 sink-half contract test. No database or JDBC driver jar ships in this
environment, so the test verifies the full option-plumbing path up to the
JVM boundary (a clean driver-resolution error, not a Python-side failure)
and upgrades itself to a real write+readback round-trip whenever a sqlite
JDBC driver is present on the classpath."""

from __future__ import annotations


def test_write_jdbc_contract(spark, tmp_path):
    from incr_iter_hadoop_spark.sources.readers import write_jdbc

    url = f"jdbc:sqlite:{tmp_path}/t.db"
    df = spark.range(5).withColumnRenamed("id", "k")
    try:
        write_jdbc(df, url, "t", driver="org.sqlite.JDBC")
        wrote = True
    except Exception as e:  # noqa: BLE001 — asserting the failure class
        wrote = False
        msg = str(e)
        # the call must reach JDBC driver resolution on the JVM side — a
        # Python-side TypeError/AttributeError here would mean the plumbing
        # itself is broken
        assert (
            "ClassNotFound" in msg
            or "No suitable driver" in msg
            or "sqlite" in msg.lower()
            or "driver" in msg.lower()
        ), f"unexpected failure class: {msg[:300]}"
    if wrote:
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", "t")
            .option("driver", "org.sqlite.JDBC")
            .load()
        )
        assert back.count() == 5


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S7 both halves against a REAL database: Spark ships the embedded
    Derby engine (metastore dependency), so the partitioned JDBC sink and
    the partitioned JDBC scan round-trip through an actual SQL database —
    the DBOutputFormat/DBInputFormat pair end-to-end, not just plumbing."""
    from pyspark.sql import functions as F

    from incr_iter_hadoop_spark.sources.readers import read_jdbc, write_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbc_rt;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    df = (
        spark.range(100)
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2.5).alias("v"),
            F.concat(F.lit("row"), F.col("id")).alias("name"),
        )
        .repartition(4)  # executors write their partitions concurrently
    )
    write_jdbc(df, url, "RT", mode="overwrite", driver=driver)
    back = read_jdbc(
        spark,
        url,
        "RT",
        driver=driver,
        partitionColumn="k",
        lowerBound="0",
        upperBound="100",
        numPartitions="3",
    )
    assert back.rdd.getNumPartitions() == 3  # the scan really parallelized
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want
