"""Deduplication operators for large-scale text corpora.

Exact, MinHash+LSH, SimHash, n-gram Jaccard and embedding-cosine near-dup —
every operator is pure `pyspark.sql.functions` (JVM-side, whole-stage
codegen, no Python UDFs), so the plans survive a 100x scale-up: the heavy
steps are explode -> hash -> groupBy/join, all shuffle-partitioned by key.

Cross-engine determinism: the only hash primitive is md5 (identical hex in
Spark and DuckDB); 60-bit / 32-bit integers are carved out of the hex with
conv()/'0x'-casts so the DuckDB oracle reproduces every value bit-for-bit.

pgstream context: dedup is the batch analog of its LSN-versioned
last-writer-wins document identity (SURVEY.md §2.6); the hash-based
deterministic generators (pkg/transformers/generators/) are the precedent
for seed-free, data-derived hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# 60-bit integer from a string via md5 — reproducible in DuckDB as
# ('0x' || substr(md5(x), 1, 15))::BIGINT
def hash60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


# 32-bit variant (safe for modular arithmetic in int64)
def hash32(col):
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


TOKEN_PATTERN = "[a-z0-9]+"


def tokens_df(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term) — distinct token set per doc (JVM regexp, no UDF)."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.array_distinct(
                    F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
                )
            ).alias("term"),
        )
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", prefix: int | None = None
) -> DataFrame:
    """Exact dedup by content hash (md5 of lowercased text, optionally a
    prefix for near-head collisions). One groupBy shuffle on the hash.
    -> (fingerprint, n_docs, canonical_doc_id=min)."""
    content = F.lower(F.col(text_col))
    if prefix:
        content = F.substring(content, 1, prefix)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(content).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


# MinHash parameters: minhash_i(S) = min_{t in S} (A_i * h32(t) + B_i) mod P
# P = 2^31 - 1 (Mersenne); A_i, B_i small fixed odd constants so A_i * h32
# stays < 2^52 (exact in int64 in both engines, no overflow under ANSI mode).
MINHASH_P = 2_147_483_647


def _minhash_params(num_hashes: int) -> list[tuple[int, int, int]]:
    return [(i, 2 * i + 3, 101 * i + 17) for i in range(num_hashes)]


def shingles_df(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 2
) -> DataFrame:
    """(doc_id, term) — distinct token n-gram shingles per doc. Shingles
    (not unigrams) are what make MinHash discriminative on corpora with a
    shared vocabulary."""
    joiner = ", '_', ".join(f"toks[i+{j}]" for j in range(n))
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0).alias("toks"),
        )
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"IF(size(toks) < {n}, array(), array_distinct("
                    f"transform(sequence(0, size(toks) - {n}), i -> concat({joiner}))))"
                )
            ).alias("term"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle: int = 2,
) -> DataFrame:
    """(doc_id, i, minhash) — one row per doc per hash function.

    Plan: explode distinct shingles -> cross join tiny param table
    (broadcast, num_hashes rows) -> groupBy(doc_id, i).min. The groupBy is
    the only shuffle and is keyed by (doc_id, i) — uniform, skew-free."""
    spark = docs.sparkSession
    params = spark.createDataFrame(_minhash_params(num_hashes), "i int, a long, b long")
    toks = shingles_df(docs, id_col, text_col, shingle).withColumn(
        "h", hash32(F.col("term"))
    )
    return (
        toks.crossJoin(F.broadcast(params))
        .select(
            "doc_id",
            "i",
            ((F.col("a") * F.col("h") + F.col("b")) % MINHASH_P).alias("mh"),
        )
        .groupBy("doc_id", "i")
        .agg(F.min("mh").alias("minhash"))
    )


def lsh_band_signatures(sigs: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """Band the minhash signature: band_sig = md5 of the band's minhashes in
    i-order (order enforced by array_sort — no collect_list nondeterminism)."""
    return (
        sigs.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("i", "minhash"))),
                        lambda x: x["minhash"].cast("string"),
                    ),
                    ",",
                )
            ).alias("band_sig")
        )
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    rows_per_band: int = 8,
    shingle: int = 2,
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing >= 1 LSH band bucket.
    -> (doc_a, doc_b) distinct, doc_a < doc_b.

    The bucket join is a self-equi-join on (band, band_sig) — the classic
    MinHash-LSH shape; bucket sizes are bounded because identical band
    signatures imply near-identical shingle sets (8 rows/band -> J^8
    collision probability, so J=0.5 pairs collide at ~0.4%)."""
    bands = lsh_band_signatures(
        minhash_signatures(docs, id_col, text_col, num_hashes, shingle), rows_per_band
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """(doc_id, simhash) — tf-weighted 32-bit SimHash, pure SQL expressions.

    bit_b(doc) = sign of sum over terms of tf * (2 * bit_b(h60(term)) - 1);
    near-dups then differ in few bits (Hamming). 32 bits keeps the final
    sum-of-2^b exact in int64 in both engines."""
    spark = docs.sparkSession
    # p2 = 2^b precomputed so bit extraction is exact integer arithmetic
    # ((h div p2) % 2) in both engines — no float pow, no shift builtins.
    bits_df = spark.createDataFrame([(b, 2**b) for b in range(bits)], "b int, p2 long")
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", hash60(F.col("term")))
    )
    votes = (
        tf.crossJoin(F.broadcast(bits_df))
        .select(
            "doc_id",
            "b",
            "p2",
            (F.col("tf") * (2 * ((F.expr("h div p2")) % 2) - 1)).alias("vote"),
        )
        .groupBy("doc_id", "b", "p2")
        .agg(F.sum("vote").alias("v"))
    )
    return votes.groupBy("doc_id").agg(
        F.sum(F.when(F.col("v") > 0, F.col("p2")).otherwise(F.lit(0))).alias("simhash")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_cols: tuple = ("source", "lang"),
    min_jaccard: float = 0.2,
) -> DataFrame:
    """Blocked pairwise token-set Jaccard: pairs inside the same block
    (default (source, lang)) with J >= threshold.
    -> (doc_a, doc_b, jaccard rounded 4).

    Blocking bounds the quadratic term: the self-join is per block, so the
    shuffle key is the block and pair generation never crosses blocks —
    the standard scale pattern for pairwise similarity."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in block_cols],
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("toks"),
    ).withColumn("n", F.size("toks"))
    ex = toks.select("doc_id", *block_cols, "n", F.explode("toks").alias("term"))
    a = ex.alias("a")
    b = ex.alias("b")
    cond = (F.col("a.term") == F.col("b.term")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    inter = (
        a.join(b, cond)
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"),
            F.col("b.n").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-duplicate vectors by cosine >= threshold, blocked (default by
    label) to bound the pairwise join. Dot/norm via F.aggregate — sequential
    left-to-right float64 fold, reproducible in the SQL oracle.
    -> (id_a, id_b, cos rounded 4)."""

    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norm = lambda u: F.sqrt(dot(u, u))  # noqa: E731
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [F.lit(0).alias("blk")] ),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(
                dot(F.col("a.v"), F.col("b.v")) / (norm(F.col("a.v")) * norm(F.col("b.v"))),
                4,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
