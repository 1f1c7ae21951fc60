"""Sources & sinks (SURVEY §2.1 S1-S11), Spark-first.

The reference's input stack is sorted key-value files:
- S1 TextInputFormat (offset, line)        → ``spark.read.text``
- S2 KeyValueTextInputFormat tab-split     → csv with sep='\\t'
- S3 SequenceFileInputFormat binary KV     → parquet (the canonical
  columnar replacement for sorted-KV; S8 sink likewise)
- S4 typed KV line readers Int/Float/Double/Text
  (lib/IntFloatKVInputFormat.java:18-40 and siblings) → csv + schema
- S7 DBInputFormat/DBOutputFormat JDBC     → ``spark.read.jdbc``
- S9 per-iteration dirs iteration-<i>/part-N (ReduceTask.java:3063-3067)
  → partitioned parquet ``.../iteration=<i>``
- S10 delta triple files (K, V, '+'|'-') (IFile.java:255-330 TrippleWriter)
  → DataFrame with an ``op`` column (CDC change feed)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """S1: one row per line, column ``value`` (offset is an implementation
    detail of the reference's splits; Spark tracks it internally)."""
    return spark.read.text(path)


def read_kv_text(
    spark: SparkSession, path: str, sep: str = "\t", key: str = "k", value: str = "v"
) -> DataFrame:
    """S2: KeyValueTextInputFormat — first sep splits key from value."""
    lines = spark.read.text(path)
    return lines.select(
        F.substring_index("value", sep, 1).alias(key),
        F.expr(
            f"substring(value, length(substring_index(value, '{sep}', 1)) + 2)"
        ).alias(value),
    )


def read_typed_kv(
    spark: SparkSession,
    path: str,
    key_type: str = "bigint",
    value_type: str = "double",
    sep: str = "\t",
) -> DataFrame:
    """S4: typed KV line scan (IntFloatKVInputFormat family) — csv + cast."""
    return (
        spark.read.option("sep", sep)
        .schema(f"k {key_type}, v {value_type}")
        .csv(path)
    )


def read_delta_triples(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """S10: (K, V, op∈'+','-') change feed. Parquet-first; any source works
    as long as the op column is present."""
    df = (
        spark.read.parquet(path)
        if path.endswith(".parquet") or schema is None
        else spark.read.schema(schema).csv(path, sep="\t")
    )
    if "op" not in df.columns:
        raise ValueError("delta feed requires an 'op' column with '+'/'-'")
    return df


def read_jdbc(
    spark: SparkSession, url: str, table: str, **options: str
) -> DataFrame:
    """S7: JDBC scan (DBInputFormat analogue). Partition options
    (partitionColumn/lowerBound/upperBound/numPartitions) are passed through
    so the read parallelizes instead of single-streaming the driver."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batchsize: int = 10_000,
    **options: str,
) -> None:
    """S7 sink half: JDBC write (DBOutputFormat analogue,
    incr-hadoop-0.1/src/mapred/.../lib/db/DBOutputFormat.java). Executors
    write their partitions concurrently with ``batchsize``-row batched
    inserts — parallelism is the DataFrame's partitioning, so repartition
    first to match what the target database can absorb (the reference's
    #reduces knob). Verified end-to-end against the embedded Derby engine
    Spark ships (tests/test_jdbc_sink.py round-trip; the oracle-checked
    ``scan_jdbc_roundtrip`` query drives both halves)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def pipe_transform(
    df: DataFrame,
    command: list[str],
    output_schema: str,
    sep: str = "\t",
    batch_size: int = 10_000,
) -> DataFrame:
    """U4 external-program transport: the Spark-native replacement for Hadoop
    streaming's stdin/stdout piping (contrib/streaming/.../PipeMapper.java:
    1-180, src/c++/pipes). Rows stream to ``command`` as ``sep``-joined lines
    per Arrow batch; each stdout line is split back into ``output_schema``
    columns and cast. Runs on executors via ``mapInPandas`` — parallel per
    partition, no driver involvement, same contract as the reference's
    external mapper."""
    import subprocess
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql.types import _parse_datatype_string

    schema = _parse_datatype_string(output_schema)
    names = [f.name for f in schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            lines = "\n".join(
                sep.join(str(v) for v in row) for row in pdf.itertuples(index=False)
            )
            proc = subprocess.run(
                command, input=lines, capture_output=True, text=True, check=True
            )
            out_rows = [
                line.split(sep) for line in proc.stdout.splitlines() if line
            ]
            yield pd.DataFrame(out_rows, columns=names)

    out = df.mapInPandas(run, ", ".join(f"{n} string" for n in names))
    # cast the string columns to the requested schema JVM-side
    from pyspark.sql import functions as F  # noqa: F811

    return out.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def write_iteration_snapshot(df: DataFrame, base_path: str, iteration: int) -> None:
    """S9: per-iteration snapshot dir — partitioned parquet, immutable
    (replaces the reference's iteration-<i>/part-N layout)."""
    df.write.mode("overwrite").parquet(f"{base_path}/iteration={iteration}")


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    *,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Bucketed parquet table: rows hash-partitioned by ``key`` into
    ``num_buckets`` files per write-partition, optionally sorted within
    buckets. This is the reference's co-partitioning invariant
    (StaticDataPartitioner.java:30-53, partition-count negotiation
    JobClient.java:913-957) persisted AT REST: two tables bucketed on the
    same key with the same bucket count join with NO exchange — the shuffle
    is paid once at write time and amortized across every later join,
    exactly what a loop-invariant static relation wants at 100 TB."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)
