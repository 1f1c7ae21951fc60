"""Streaming refresh restart/recovery: the exactly-once contract.

streaming_refresh's docstring claims recovery = re-read last sink version +
the checkpoint log. This pins it end-to-end: drain delta file d1, STOP the
query, add d2, restart from the SAME checkpoint with the recovered state —
the checkpoint must skip the already-processed d1 (re-applying it would
double-insert its '+' rows and corrupt the aggregate), and the final state
must equal the batch chain refresh(refresh(s0, d1), d2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.operators.incremental import preserve, refresh
from incr_iter_hadoop_spark.streaming.incremental_stream import streaming_refresh


def _results_dict(state):
    return {
        r["g"]: (r["total"], r["n"]) for r in state.results.collect()
    }


def test_streaming_refresh_restart_is_exactly_once(spark, tmp_path):
    base = spark.createDataFrame(
        [(g, s, float(g * 10 + s)) for g in range(8) for s in range(3)],
        "g long, s long, v double",
    )
    agg = {
        "total": F.sum("v"),
        "n": F.count(F.lit(1)),
    }
    state0 = preserve(
        base, group_keys=["g"], source_keys=["s"], agg_exprs=agg
    )
    state0.contribs.persist().count()
    state0.results.persist().count()

    delta_dir = tmp_path / "deltas"
    delta_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    d1 = spark.createDataFrame(
        [(1, 99, 5.0, "+"), (2, 0, 0.0, "-")],
        "g long, s long, v double, op string",
    )
    d2 = spark.createDataFrame(
        [(3, 77, 2.5, "+"), (1, 99, 0.0, "-")],
        "g long, s long, v double, op string",
    )
    d1.coalesce(1).write.parquet(str(delta_dir / "d1"))

    captured = []

    def sink(state, batch_id):
        captured.append(state)

    def run_once(initial):
        stream = (
            spark.readStream.schema("g long, s long, v double, op string")
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(delta_dir) + "/*")
        )
        q = streaming_refresh(
            stream, initial, sink, ckpt, available_now=True
        )
        assert q.awaitTermination(120), "stream did not drain"

    run_once(state0)
    assert captured, "first run processed no batch"
    v1 = captured[-1]
    batch_v1 = refresh(state0, d1)
    assert _results_dict(v1) == _results_dict(batch_v1)

    # second delta lands; RESTART from the same checkpoint with the
    # recovered state — d1 must not be re-applied
    d2.coalesce(1).write.parquet(str(delta_dir / "d2"))
    n_before = len(captured)
    run_once(v1)
    assert len(captured) > n_before, "restart processed no batch"
    v2 = captured[-1]
    batch_v2 = refresh(batch_v1, d2)
    assert _results_dict(v2) == _results_dict(batch_v2)
    # group 1 specifically: +5.0 then retracted — double-applying d1 would
    # leave a phantom source-99 contribution
    full = {
        r["g"]: (r["total"], r["n"])
        for r in base.where("NOT (g = 2 AND s = 0)")
        .unionByName(
            spark.createDataFrame([(3, 77, 2.5)], "g long, s long, v double")
        )
        .groupBy("g")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert _results_dict(v2) == full
