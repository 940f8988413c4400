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

    Plan: explode distinct shingles -> ONE groupBy(doc_id) computing all
    ``num_hashes`` mins as separate aggregate columns (map-side combined),
    then inline-explode the (i, minhash) pairs post-aggregation. No param
    cross join: shingle rows are never fanned out x num_hashes, and the
    single shuffle carries one partial row per (doc, map partition)."""
    params = _minhash_params(num_hashes)
    toks = shingles_df(docs, id_col, text_col, shingle).withColumn(
        "h", hash32(F.col("term"))
    )
    sig = toks.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % MINHASH_P).alias(f"mh{i}")
            for (i, a, b) in params
        ]
    )
    entries = F.array(
        *[
            F.struct(F.lit(i).alias("i"), F.col(f"mh{i}").alias("minhash"))
            for (i, _a, _b) in params
        ]
    )
    return sig.select("doc_id", F.inline(entries))


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
    sum-of-2^b exact in int64 in both engines.

    Plan: tf rows are never fanned out x bits — ONE groupBy(doc_id)
    computes all per-bit vote sums as aggregate columns (exact integer
    arithmetic (h div 2^b) % 2, no float pow, no shift builtins), then a
    pure projection folds the sign bits into the signature."""
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
    votes = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.col("tf") * (2 * (F.expr(f"h div {2**b}") % 2) - 1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
    min_jaccard: float = 0.2,
    num_hashes: int = 16,
    rows_per_band: int = 8,
) -> DataFrame:
    """Exact token-set Jaccard as a VERIFIER over candidate pairs.

    ``candidates``: (doc_a, doc_b) DataFrame — defaults to the MinHash-LSH
    bucket pairs (the scale path: candidate generation is the banded LSH
    self-equi-join, never an all-pairs self-join; this stage only joins
    token sets onto the candidate pairs, so its cost is
    O(|candidates| x avg tokens), linear in the corpus for a fixed dup
    rate). -> (doc_a, doc_b, jaccard rounded 4) with J >= threshold.
    """
    if candidates is None:
        candidates = minhash_lsh_pairs(
            docs, id_col, text_col, num_hashes=num_hashes, rows_per_band=rows_per_band
        )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
        ).alias("toks"),
    )
    sizes = toks.select("doc_id", F.size("toks").alias("n"))
    ex = toks.select("doc_id", F.explode("toks").alias("term"))
    # pair-scoped intersection: candidates x tokens(doc_a) joined to
    # tokens(doc_b) on (doc, term) — shuffle keys are doc ids/terms, never
    # a block-wide cross product
    inter = (
        candidates.join(ex.alias("ta"), F.col("ta.doc_id") == F.col("doc_a"))
        .join(
            ex.alias("tb"),
            (F.col("tb.doc_id") == F.col("doc_b"))
            & (F.col("tb.term") == F.col("ta.term")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(sizes.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(sizes.alias("sb"), F.col("sb.doc_id") == F.col("doc_b"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("sa.n") + F.col("sb.n") - F.col("inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup PAIRING stage: signatures alone don't deduplicate —
    candidates are docs sharing at least one of ``bands`` signature bands
    (pigeonhole: any pair within Hamming distance < bands shares a band),
    verified by exact popcount(xor) <= max_hamming.
    -> (doc_a, doc_b, hamming) distinct, doc_a < doc_b.

    Pure JVM expressions; the only joins are the banded self-equi-join
    (bucketed, like MinHash-LSH) and integer xor/bit_count on the pairs."""
    assert max_hamming < bands, "pigeonhole guarantee needs max_hamming < bands"
    sig = simhash(docs, id_col, text_col, bits)
    band_bits = bits // bands
    # post-aggregation inline of the (band, band_val) pairs — one row per
    # doc per band, no param cross join in the plan
    band_entries = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                (
                    F.expr(f"simhash div {2 ** (b * band_bits)}")
                    % F.lit(2**band_bits)
                ).alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    banded = sig.select("doc_id", "simhash", F.inline(band_entries))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def embedding_lsh_candidates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 3,
    bits: int = 6,
) -> DataFrame:
    """Sign-LSH candidate pairs: vectors sharing a bucket in ANY of
    ``num_tables`` hyperplane tables. -> (id_a, id_b) distinct.

    The bucket join is per (table, bucket) — bucket population ~n/2^bits,
    so pair generation is n^2/2^bits per table, tunable to linear."""
    from .ann import bucket_of, plane_weights

    spark = embeddings.sparkSession
    dims = embeddings.select(F.size(vec_col)).first()[0]
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    buckets = []
    for t in range(num_tables):
        planes = plane_weights(spark, bits, dims, table=t)
        buckets.append(
            e.select(
                "id",
                F.lit(t).alias("tbl"),
                bucket_of(F.col("v"), planes).alias("bucket"),
            )
        )
    allb = buckets[0]
    for b in buckets[1:]:
        allb = allb.unionByName(b)
    a, b = allb.alias("a"), allb.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    candidates: DataFrame | None = None,
    num_tables: int = 3,
    bits: int = 6,
) -> DataFrame:
    """Embedding near-duplicates: exact cosine VERIFICATION over LSH
    candidate pairs (never an all-pairs self-join — round-1's label-blocked
    form was quadratic on any dominant block). Dot/norm via F.aggregate —
    sequential left-to-right float64 fold, reproducible in the SQL oracle.
    -> (id_a, id_b, cos rounded 4) with cos >= threshold."""

    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    norm = lambda u: F.sqrt(dot(u, u))  # noqa: E731
    if candidates is None:
        candidates = embedding_lsh_candidates(
            embeddings, id_col, vec_col, num_tables, bits
        )
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (
        candidates.join(e.alias("ea"), F.col("ea.id") == F.col("id_a"))
        .join(e.alias("eb"), F.col("eb.id") == F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("ea.v"), F.col("eb.v"))
                / (norm(F.col("ea.v")) * norm(F.col("eb.v"))),
                4,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
