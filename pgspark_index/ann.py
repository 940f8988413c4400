"""Similarity search over embedding columns (array<float>).

- ``cosine_topk`` — brute-force cosine top-k against one query vector: a
  single map-side pass (no shuffle at all until the final
  TakeOrderedAndProject top-k). At 10^12 vectors this is the exact-scan
  baseline; it parallelizes perfectly because every partition scores
  independently.
- ``index_embeddings`` + ``lsh_topk`` — the scale path: multi-table
  random-hyperplane (sign) LSH buckets computed ONCE at write time and
  stored as PARTITION COLUMNS (table=<t>/bucket=<b>/ directories), so a
  query reads only its probe buckets via partition pruning —
  PartitionFilters in the scan, not a full-scan recompute. Queries
  multi-probe (the exact bucket plus every Hamming-1 neighbor per table),
  the standard recall lever (Lv et al., multi-probe LSH, VLDB 2007).

Everything is pure pyspark.sql expressions (F.aggregate / F.zip_with fold,
sequential left-to-right — reproducible by the DuckDB oracle's
list-lambda SQL). Planes are md5-derived, not RNG, so Spark, the Python
driver and SQL all agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


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


def plane_weights(
    spark, num_planes: int, dims: int, table: int = 0
) -> list[list[float]]:
    """Deterministic +-1 hyperplane weights: sign from
    md5('<table>_<plane>_<dim>') — computed driver-side in pure Python (no
    Spark job), identical to the SQL oracle's
    ('0x' || substr(md5(t||'_'||p||'_'||d), 1, 15))::BIGINT % 2 spelling."""
    planes = []
    for p in range(num_planes):
        row = []
        for d in range(dims):
            h = int(hashlib.md5(f"{table}_{p}_{d}".encode()).hexdigest()[:15], 16)
            row.append(float(2 * (h % 2) - 1))
        planes.append(row)
    return planes


def bucket_of(vec_col, planes_w: list[list[float]]):
    """Integer LSH bucket expression for an embedding column, given the
    materialized plane weights (small python lists -> literal arrays)."""
    bits = []
    for p, w in enumerate(planes_w):
        warr = F.array(*[F.lit(x) for x in w])
        bits.append(F.when(_dot(vec_col, warr) > 0, F.lit(2**p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def query_buckets(query_vec: list[float], planes_w: list[list[float]]) -> int:
    b = 0
    for p, w in enumerate(planes_w):
        if sum(x * y for x, y in zip(w, query_vec)) > 0:
            b += 2**p
    return b


def index_embeddings(
    embeddings: DataFrame,
    index_dir: str,
    num_tables: int = 4,
    bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Write the ANN index: one copy of the vectors per LSH table,
    partitioned by (tbl, bucket) directories so bucket probes are pure
    partition pruning at read time. Index size = num_tables x data size —
    the classic LSH space/recall trade."""
    spark = embeddings.sparkSession
    dims = embeddings.select(F.size(vec_col)).first()[0]
    parts = []
    for t in range(num_tables):
        planes = plane_weights(spark, bits, dims, table=t)
        parts.append(
            embeddings.select(
                F.col(id_col).alias("vec_id"),
                F.col(vec_col).alias("embedding"),
                F.lit(t).alias("tbl"),
                bucket_of(F.col(vec_col), planes).alias("bucket"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    allp.write.mode("overwrite").partitionBy("tbl", "bucket").parquet(index_dir)
    meta = {"num_tables": num_tables, "bits": bits, "dims": int(dims)}
    import json

    with open(os.path.join(index_dir, "_ann_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _probe_cond(probes: list[tuple[int, int]]):
    """(tbl, bucket) probe list -> a predicate of plain partition-column
    equality/IN terms — the form Catalyst's partition pruning recognizes
    (a function over partition columns would defeat it)."""
    by_table: dict[int, list[int]] = {}
    for t, b in probes:
        by_table.setdefault(t, []).append(b)
    cond = None
    for t, bs in sorted(by_table.items()):
        c = (F.col("tbl") == t) & F.col("bucket").isin(sorted(set(bs)))
        cond = c if cond is None else (cond | c)
    return cond


def lsh_topk(
    spark: SparkSession,
    index_dir: str,
    query_vec: list[float],
    k: int = 10,
    multiprobe: bool = True,
    exclude_id: int | None = None,
) -> DataFrame:
    """Multi-probe ANN over the partitioned index: per table, probe the
    query's bucket and (with ``multiprobe``) every Hamming-1 neighbor —
    bits+1 partitions per table out of 2^bits. The probe predicate is a
    plain (tbl, bucket) IN filter -> partition pruning; only probed
    directories are read. -> (vec_id, cos rounded 4) top-k."""
    import json

    with open(os.path.join(index_dir, "_ann_meta.json")) as f:
        meta = json.load(f)
    probes = []
    for t in range(meta["num_tables"]):
        planes = plane_weights(spark, meta["bits"], meta["dims"], table=t)
        qb = query_buckets(query_vec, planes)
        buckets = [qb] + ([qb ^ (1 << i) for i in range(meta["bits"])] if multiprobe else [])
        probes.extend((t, b) for b in buckets)
    idx = spark.read.parquet(index_dir)
    cond = _probe_cond(probes)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    df = (
        idx.filter(cond)
        .select("vec_id", "embedding")
        .dropDuplicates(["vec_id"])  # a vector can land in probes of several tables
        .select(
            "vec_id",
            F.round(_dot(F.col("embedding"), q) / (_norm(F.col("embedding")) * _norm(q)), 4).alias("cos"),
        )
    )
    if exclude_id is not None:
        df = df.filter(F.col("vec_id") != exclude_id)
    return df.orderBy(F.desc("cos"), F.asc("vec_id")).limit(k)


def probed_fraction(spark: SparkSession, index_dir: str, query_vec: list[float], multiprobe: bool = True) -> float:
    """Fraction of stored rows a query actually reads (pruning evidence)."""
    import json

    with open(os.path.join(index_dir, "_ann_meta.json")) as f:
        meta = json.load(f)
    idx = spark.read.parquet(index_dir)
    total = idx.count()
    probes = []
    for t in range(meta["num_tables"]):
        planes = plane_weights(spark, meta["bits"], meta["dims"], table=t)
        qb = query_buckets(query_vec, planes)
        buckets = [qb] + ([qb ^ (1 << i) for i in range(meta["bits"])] if multiprobe else [])
        probes.extend((t, b) for b in buckets)
    return idx.filter(_probe_cond(probes)).count() / max(total, 1)
