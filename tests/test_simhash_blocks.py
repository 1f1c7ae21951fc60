
import pytest
"""r13 optimization pin: the Arrow-vectorized SimHash block UDF must be
bit-exact vs the original Catalyst lambda formulation (the interpreted
64-aggregate expression it replaced), and the parallelized verification
join must leave pair results unchanged."""

from pyspark.sql import functions as F

from incr_iter_hadoop_spark.catalog import load_table
from incr_iter_hadoop_spark.operators.dedup import (
    _simhash_blocks_udf,
    shingle_sets,
    simhash_pairs,
)


def test_simhash_blocks_match_expr(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sets = shingle_sets(d, "doc_id", "text")
    hs = (
        sets.select("id", F.explode("shingles").alias("sh"))
        .select("id", F.xxhash64("sh").alias("h"))
        .groupBy("id")
        .agg(F.collect_list("h").alias("hs"))
        .persist()
    )
    # the pre-r13 expression formulation, kept here as the independent oracle
    votes_arr = F.expr(
        """
        transform(sequence(0, 63), j -> aggregate(hs, 0, (acc, h) ->
          acc + CASE WHEN (shiftrightunsigned(h, j) & 1) = 1
                     THEN 1 ELSE -1 END))
        """
    )
    block_arr = F.expr(
        """
        transform(sequence(0, 7), b ->
          aggregate(sequence(0, 7), 0, (acc, k) ->
            acc + CASE WHEN element_at(votes, b * 8 + k + 1) >= 0
                       THEN cast(shiftleft(1, k) as int) ELSE 0 END))
        """
    )
    expected = {
        r["id"]: list(r["blks"])
        for r in hs.select("id", votes_arr.alias("votes"))
        .select("id", block_arr.alias("blks"))
        .collect()
    }
    actual = {
        r["id"]: list(r["blks"])
        for r in hs.select(
            "id", _simhash_blocks_udf(8)("hs").alias("blks")
        ).collect()
    }
    hs.unpersist()
    assert actual == expected


@pytest.mark.slow  # r14: driver verify window (ask #6)
def test_simhash_pairs_oracle_exact(spark, sf_dir, ddb):
    # end-to-end: the restructured verify join (repartitioned candidates,
    # broadcast touched-set sides) emits exactly the oracle pair set
    got = (
        simhash_pairs(
            load_table(spark, sf_dir, "documents"), "doc_id", "text"
        )
        .orderBy("i", "j")
        .collect()
    )
    from incr_iter_hadoop_spark.operators.dedup import _JACCARD_ORACLE

    exp = ddb.sql(_JACCARD_ORACLE + " ORDER BY i, j").fetchall()
    assert [(r["i"], r["j"], r["jac"]) for r in got] == [
        (i, j, jac) for i, j, jac in exp
    ]
