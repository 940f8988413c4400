"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force cosine top-k against one query vector: a
  single map-side pass (no shuffle at all until the final
  TakeOrderedAndProject top-k). At 10^12 vectors this is the exact-scan
  baseline; it parallelizes perfectly because every partition scores
  independently.
- ``lsh_topk`` — random-hyperplane (sign) LSH: 16 md5-derived +-1
  hyperplanes -> 16-bit bucket; only vectors in the query's bucket get the
  exact cosine. The scale path: the bucket filter is a pushdown-able
  equality on a precomputable column, cutting the scan by ~2^bits.

Everything is pure pyspark.sql expressions (F.aggregate / F.zip_with fold,
sequential left-to-right — reproducible by the DuckDB oracle's
list-lambda SQL). Planes are md5-derived, not RNG, so Spark and SQL agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import hash60


def _dot(u, v):
    return F.aggregate(
        F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(u):
    return F.sqrt(_dot(u, u))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """-> (vec_id, cos rounded 4), (cos DESC, vec_id ASC), limit k."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)), 4).alias("cos"),
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    return df.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def plane_signs(spark, num_planes: int, dims: int) -> DataFrame:
    """Deterministic +-1 hyperplane weights: sign from md5(p, '_', d).
    (num_planes x dims rows — a broadcast-size dimension table.)"""
    rows = [(p, d) for p in range(num_planes) for d in range(dims)]
    pd_df = spark.createDataFrame(rows, "p int, d int")
    return pd_df.withColumn(
        "w",
        (2 * (hash60(F.concat_ws("_", F.col("p"), F.col("d"))) % 2) - 1).cast("double"),
    )


def bucket_of(vec_col, planes_w: list[list[float]]):
    """16-bit LSH bucket expression for an embedding column, given the
    materialized plane weights (small python list -> literal arrays)."""
    bits = []
    for p, w in enumerate(planes_w):
        warr = F.array(*[F.lit(x) for x in w])
        bits.append(F.when(_dot(vec_col, warr) > 0, F.lit(2**p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Bucketed ANN: exact cosine only inside the query's hyperplane bucket.
    -> (vec_id, cos rounded 4). Recall < 1 by design; the candidate filter
    is a plain integer equality (partition-prunable when the bucket is a
    write-time partition column)."""
    spark = embeddings.sparkSession
    dims = len(query_vec)
    pw = plane_signs(spark, num_planes, dims).collect()
    planes: list[list[float]] = [[0.0] * dims for _ in range(num_planes)]
    for r in pw:
        planes[r["p"]][r["d"]] = r["w"]
    qbits = 0
    for p in range(num_planes):
        if sum(w * x for w, x in zip(planes[p], query_vec)) > 0:
            qbits += 2**p
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = (
        embeddings.withColumn("bucket", bucket_of(F.col(vec_col), planes))
        .filter(F.col("bucket") == qbits)
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)), 4).alias("cos"),
        )
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    return df.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)
