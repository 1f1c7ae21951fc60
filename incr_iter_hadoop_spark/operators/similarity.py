"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline (oracle-checked); the
random-hyperplane LSH variant is the 100 TB path — bucket keys bound the
candidate set so the join is linear in bucket occupancy, not quadratic.
All vector math is zip_with/aggregate Column expressions (functions/vector.py)
— JVM-side, no Python in the row path.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vector import cosine, dot
from ..registry import register

TOP_K = 5
N_QUERIES = 10  # queries = vec_id < 10 in the registered battery


def ann_bruteforce_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (excluding self). Cross join +
    window: at N queries × M vectors the work is N·M·dim multiply-adds spread
    across partitions — the correct baseline to judge approximate recall."""
    v = vectors.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    sims = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("raw_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("raw_sim"), F.asc("nid"))
    return (
        sims.select(
            "qid",
            "nid",
            F.round("raw_sim", 6).alias("sim"),
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .where(F.col("pos") <= k)
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes from md5 — no RNG
    state, reproducible across sessions/engines."""
    planes = []
    for p in range(num_planes):
        vec = []
        for d in range(dim):
            h = hashlib.md5(f"plane{p}|dim{d}".encode()).hexdigest()
            vec.append(int(h[:8], 16) / float(0xFFFFFFFF) * 2.0 - 1.0)
        planes.append(vec)
    return planes


def lsh_bucket(vec_col, planes: list[list[float]]):
    """Bucket id = bit pattern of sign(vec · plane_i)."""
    expr = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(F.col(vec_col), plane_col) >= 0, 1).otherwise(0)
        expr = expr + (bit.cast("long") * F.lit(2**i))
    return expr


def ann_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    num_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane signatures; only same-bucket
    pairs are scored. Recall < 1 by construction (rows-only correctness;
    tests assert recall@k against the brute-force baseline)."""
    planes = _hyperplanes(num_planes, dim)
    v = vectors.select(
        F.col(id_col).alias("nid"),
        F.col(vec_col).alias("nvec"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    sims = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("raw_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("raw_sim"), F.asc("nid"))
    return (
        sims.select(
            "qid",
            "nid",
            F.round("raw_sim", 6).alias("sim"),
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .where(F.col("pos") <= k)
    )


def ann_ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = TOP_K,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    its nearest of ``n_cells`` centroids (one k-means-style assignment pass);
    a query scores only vectors in its ``n_probe`` nearest cells. The 100 TB
    path: the index is a cell-keyed table, probing is an equi-join on cell id
    — candidate count scales with cell occupancy, not corpus size.

    Centroids are the first ``n_cells`` vectors by id (deterministic, same
    convention as the k-means init — IterKmeans.java:492-538)."""
    cents = (
        vectors.orderBy(id_col)
        .limit(n_cells)
        .select(
            F.col(id_col).cast("int").alias("cell"), F.col(vec_col).alias("cvec")
        )
    )
    v = vectors.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    # assignment pass: nearest centroid per vector (broadcast dim table)
    v_cells = (
        v.crossJoin(F.broadcast(cents))
        .select(
            "nid", "nvec", "cell", cosine(F.col("nvec"), F.col("cvec")).alias("s")
        )
        .groupBy("nid", "nvec")
        .agg(F.max(F.struct(F.col("s"), (-F.col("cell")).alias("nc"))).alias("b"))
        .select("nid", "nvec", (-F.col("b.nc")).cast("int").alias("cell"))
    )
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec"))
    # probe list: n_probe nearest cells per query
    q_cells = (
        q.crossJoin(F.broadcast(cents))
        .select("qid", "qvec", "cell", cosine(F.col("qvec"), F.col("cvec")).alias("s"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("s"), F.asc("cell"))
            ),
        )
        .where(F.col("rk") <= n_probe)
        .select("qid", "qvec", "cell")
    )
    sims = (
        v_cells.join(q_cells, "cell")
        .where(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cosine(F.col("qvec"), F.col("nvec")).alias("raw_sim"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("raw_sim"), F.asc("nid"))
    return (
        sims.select(
            "qid",
            "nid",
            F.round("raw_sim", 6).alias("sim"),
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
        .where(F.col("pos") <= k)
    )


_COSINE_PAIRS_SQL = """
    WITH pairs AS (
      SELECT q.vec_id AS qid, n.vec_id AS nid,
             unnest(q.embedding)::DOUBLE AS qv, unnest(n.embedding)::DOUBLE AS nv
      FROM embeddings q JOIN embeddings n ON n.vec_id <> q.vec_id
      WHERE q.vec_id < 10
    ),
    sims AS (
      SELECT qid, nid,
             CASE WHEN sqrt(SUM(qv*qv)) * sqrt(SUM(nv*nv)) > 0
                  THEN SUM(qv*nv) / (sqrt(SUM(qv*qv)) * sqrt(SUM(nv*nv)))
                  ELSE 0.0 END AS raw_sim
      FROM pairs GROUP BY qid, nid
    )
"""


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    {_COSINE_PAIRS_SQL}
    SELECT qid, nid, ROUND(raw_sim, 6) AS sim, pos FROM (
      SELECT qid, nid, raw_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY qid
               ORDER BY raw_sim DESC, nid) AS BIGINT) AS pos
      FROM sims
    ) WHERE pos <= {TOP_K}
    """,
    doc="exact cosine top-5 neighbors for queries vec_id<10.",
)
def ann_bruteforce_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_bruteforce_topk(emb, emb.where(F.col("vec_id") < N_QUERIES))


@register(
    "ann_lsh_topk",
    oracle=None,  # approximate by design; recall asserted in tests
    doc="LSH-bucketed approximate top-5 (8 hyperplanes) — the scale path.",
)
def ann_lsh_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, emb.where(F.col("vec_id") < N_QUERIES))


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate by design; recall asserted in tests
    doc="IVF ANN: 16-cell coarse quantizer, 4-probe — candidate count scales "
    "with cell occupancy, not corpus size (the 100 TB index path).",
)
def ann_ivf_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(emb, emb.where(F.col("vec_id") < N_QUERIES))


@register(
    "embedding_top_pairs",
    oracle="""
    WITH pairs AS (
      SELECT a.vec_id AS i, b.vec_id AS j,
             unnest(a.embedding)::DOUBLE AS av, unnest(b.embedding)::DOUBLE AS bv
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ),
    sims AS (
      SELECT i, j,
             CASE WHEN sqrt(SUM(av*av)) * sqrt(SUM(bv*bv)) > 0
                  THEN SUM(av*bv) / (sqrt(SUM(av*av)) * sqrt(SUM(bv*bv)))
                  ELSE 0.0 END AS raw_sim
      FROM pairs GROUP BY i, j
    )
    SELECT i, j, ROUND(raw_sim, 6) AS sim, pos FROM (
      SELECT i, j, raw_sim,
             CAST(ROW_NUMBER() OVER (ORDER BY raw_sim DESC, i, j) AS BIGINT)
               AS pos
      FROM sims
    ) WHERE pos <= 20
    """,
    doc="embedding near-dup scan: top-20 most-similar pairs (all-pairs "
    "cosine baseline; LSH variant bounds it at scale).",
)
def embedding_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("j"), F.col("embedding").alias("vb"))
    sims = (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", cosine(F.col("va"), F.col("vb")).alias("raw_sim"))
    )
    # distributed TakeOrdered over the O(n^2) pair stream, then a 20-row
    # window — a global row_number window would single-partition every pair
    top = sims.orderBy(F.desc("raw_sim"), F.asc("i"), F.asc("j")).limit(20)
    w = Window.orderBy(F.desc("raw_sim"), F.asc("i"), F.asc("j"))
    return top.select(
        "i",
        "j",
        F.round("raw_sim", 6).alias("sim"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
