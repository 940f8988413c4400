"""Hybrid BM25 + vector retrieval: one fused top-k over the same corpus.

The reference maps ``vector(N)`` columns to ``knn_vector`` fields living in
the SAME search document as the text fields
(/root/reference/pkg/wal/processor/search/store/search_pg_mapper.go:166-176,256-269),
so its users combine full-text relevance and k-NN similarity against one
store. Here the two engines (the BM25 index in ``query`` and the embedding
path in ``ann``) are fused distributedly: each side produces its top-C
candidate DataFrame (both bounded — C rows each, never a corpus scan), and
the fusion is a tiny full-outer join + rank arithmetic the driver never
collects.

Fusion methods:

- ``rrf`` (default): reciprocal-rank fusion, ``sum_i w_i / (k0 + rank_i)``
  — the standard score-scale-free combiner (Cormack et al., SIGIR'09;
  OpenSearch exposes the same shape as its hybrid-query rank processor).
  Ranks are assigned on ROUNDED (4dp) per-side scores with doc_id ASC
  tie-break, so the fused ordering is deterministic and reproducible
  cross-engine (raw float64 ULP noise cannot flip a rank).
- ``linear``: ``w_text * minmax(bm25) + w_vec * cos`` — weighted-sum on
  normalized scores (OpenSearch hybrid-query normalization-processor
  shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from . import ann, query

RRF_K = 60  # the canonical reciprocal-rank damping constant


def _ranked(df: DataFrame, score_col: str, rank_name: str) -> DataFrame:
    """(doc_id, score) -> (doc_id, rank) by (round(score,4) DESC, doc_id
    ASC). The window spans <= C candidate rows — single tiny partition by
    construction, not a corpus-wide sort."""
    w = Window.orderBy(F.desc(F.round(F.col(score_col), 4)), F.asc("doc_id"))
    return df.select("doc_id", F.row_number().over(w).alias(rank_name))


def hybrid_topk(
    spark: SparkSession,
    index_dir: str,
    embeddings: DataFrame,
    terms: list[str],
    query_vec: list[float],
    k: int = 10,
    candidates: int = 50,
    method: str = "rrf",
    w_text: float = 1.0,
    w_vec: float = 1.0,
    rrf_k: int = RRF_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Fused top-k -> DataFrame(doc_id, score), (score DESC, doc_id ASC).

    ``embeddings`` rows join the text corpus on ``id_col == doc_id`` (the
    reference's one-document-many-fields model). Each side contributes its
    top-``candidates``; a doc present on only one side gets rank-missing
    treatment (0 contribution for rrf, 0 for the missing component in
    linear) — the OpenSearch hybrid-query convention."""
    text = query.search(spark, index_dir, terms, candidates).select(
        "doc_id", F.col("score").alias("bm25")
    )
    vec = ann.cosine_topk(
        embeddings, query_vec, candidates,
        id_col=id_col, vec_col=vec_col, exclude_id=exclude_id,
    ).select(F.col("vec_id").alias("doc_id"), "cos")

    if method == "rrf":
        t = _ranked(text, "bm25", "r_t")
        v = _ranked(vec, "cos", "r_v")
        fused = t.join(v, "doc_id", "full_outer").select(
            "doc_id",
            (
                F.coalesce(F.lit(w_text) / (F.lit(rrf_k) + F.col("r_t")), F.lit(0.0))
                + F.coalesce(F.lit(w_vec) / (F.lit(rrf_k) + F.col("r_v")), F.lit(0.0))
            ).alias("fused"),
        )
    elif method == "linear":
        # min-max normalize the text side over its candidate set (cos is
        # already scale-bounded); a single-row bounds frame, broadcast
        bounds = text.agg(
            F.min("bm25").alias("lo"), F.max("bm25").alias("hi")
        )
        t = text.crossJoin(F.broadcast(bounds)).select(
            "doc_id",
            F.when(F.col("hi") > F.col("lo"),
                   (F.col("bm25") - F.col("lo")) / (F.col("hi") - F.col("lo")))
            .otherwise(F.lit(1.0)).alias("nt"),
        )
        fused = t.join(vec, "doc_id", "full_outer").select(
            "doc_id",
            (
                F.coalesce(F.col("nt") * w_text, F.lit(0.0))
                + F.coalesce(F.col("cos") * w_vec, F.lit(0.0))
            ).alias("fused"),
        )
    else:
        raise ValueError(f"unknown fusion method: {method}")

    return (
        fused.select("doc_id", F.round("fused", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )
