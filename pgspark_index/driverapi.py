"""Driver-contract registry: queries() + oracle_sql() pairs.

Each entry is an operator from SURVEY.md §2 (or a training-data-pipeline
operator) expressed twice: as the engine's Spark plan and as ANSI-ish SQL
DuckDB can run over the same parquet views. Column names/aliases match
exactly; float outputs are rounded (4dp) so cross-engine ULP differences
in ln/division never flip the value hash.

The full-text entries run the REAL engine: the index over the `documents`
table is built once per (process, sf_dir) into a temp dir and cached —
build -> merge -> query, the same artifacts the webtext path produces.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import (
    ann,
    build,
    dedup,
    manifest,
    merge,
    multimodal,
    query,
    tablefilter,
    textops,
    transformers,
)

# --------------------------------------------------------------------------
# shared SQL fragments (DuckDB dialect)
# --------------------------------------------------------------------------

TOK_CTE = (
    "tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
    "FROM documents)"
)


def _sql_hash60(x: str) -> str:
    return f"(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _sql_hash32(x: str) -> str:
    return f"(('0x' || substr(md5({x}), 1, 8))::BIGINT)"


# --------------------------------------------------------------------------
# cached engine index over the documents table
# --------------------------------------------------------------------------

_INDEX_CACHE: dict[str, str] = {}


def docs_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per process per sf_dir) the full index over documents."""
    key = os.path.abspath(sf_dir)
    idx = _INDEX_CACHE.get(key)
    if idx and os.path.exists(merge.stats_path(idx)):
        return idx
    idx = tempfile.mkdtemp(prefix="pgspark_docs_index_")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    provider = build.docs_unit_provider(docs)
    build.build_index(spark, provider, idx, num_units=2, partitions=8,
                      with_positions=True)
    merge.merge_index(spark, idx)
    _INDEX_CACHE[key] = idx
    return idx


def _documents(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


_MF_INDEX_CACHE: dict[str, dict[str, str]] = {}


def multifield_indexes(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """SINGLE-PASS multi-field build over documents: body (full text) +
    title (first 8 tokens — a headline stand-in the SQL oracle can
    replicate with list slicing) from ONE scan/tokenize/shuffle
    (reference: one store with per-column mappings,
    search_pg_mapper.go:137-183). Returns {field: index_dir}."""
    key = os.path.abspath(sf_dir)
    fdirs = _MF_INDEX_CACHE.get(key)
    if fdirs and all(os.path.exists(merge.stats_path(d)) for d in fdirs.values()):
        return fdirs
    root = tempfile.mkdtemp(prefix="pgspark_mf_index_")
    docs = _documents(spark, sf_dir)
    title = F.array_join(
        F.slice(
            F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0), 1, 8
        ),
        " ",
    )
    fdirs = build.build_index_multifield(
        spark, docs, root,
        fields={"body": F.col("text"), "title": title},
        num_units=2, partitions=8, with_positions=True,
    )
    _MF_INDEX_CACHE[key] = fdirs
    return fdirs


_FOLD_INDEX_CACHE: dict[str, str] = {}


def folded_index(spark: SparkSession, sf_dir: str) -> str:
    """Three-unit build over documents FOLDED into one unit by
    incremental.merge_units (the tiered unit merge) — exercises the whole
    fold path (closed-form ordinal re-basing + splice + alias-style
    cutover) inside the correctness gate: queries over the folded index
    must match the DuckDB oracle exactly as the unfolded one does."""
    import tempfile as _tf

    from . import incremental

    key = os.path.abspath(sf_dir)
    idx = _FOLD_INDEX_CACHE.get(key)
    if idx and os.path.exists(merge.stats_path(idx)):
        return idx
    idx = _tf.mkdtemp(prefix="pgspark_fold_index_")
    docs = _documents(spark, sf_dir)
    build.build_index(spark, build.docs_unit_provider(docs), idx,
                      num_units=3, partitions=8)
    merge.merge_index(spark, idx)
    res = incremental.merge_units(spark, idx, partitions=8)
    assert len(res["folded_units"]) == 3 and res["new_unit"] is not None
    _FOLD_INDEX_CACHE[key] = idx
    return idx


def _events(spark, sf_dir) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _embeddings(spark, sf_dir) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_vec(spark, sf_dir) -> list[float]:
    row = _embeddings(spark, sf_dir).filter(F.col("vec_id") == 0).collect()[0]
    return [float(x) for x in row["embedding"]]


# --------------------------------------------------------------------------
# BM25 SQL oracle builder
# --------------------------------------------------------------------------

BM25_HEAD_TERMS = ["data", "query", "fast"]
BM25_TAIL_TERMS = ["vector", "stream"]


def bm25_sql(
    terms: list[str],
    k: int = 10,
    require_all: bool = False,
    doc_filter_cte: str | None = None,
    min_match: int | None = None,
    offset: int = 0,
) -> str:
    """BM25 top-k oracle. ``require_all`` = conjunctive (every term);
    ``min_match`` = minimum distinct matching terms (bool/should shape);
    ``doc_filter_cte`` = SQL for a `match(doc_id)` CTE restricting the
    scored docs (metadata filters, phrase matches); ``offset`` = skip the
    first N of the global order (search_after page equivalence)."""
    uniq = sorted(set(terms))
    tlist = ", ".join(f"'{t}'" for t in uniq)
    match_cte = f",\nmatch AS ({doc_filter_cte})" if doc_filter_cte else ""
    match_join = "JOIN match USING (doc_id)" if doc_filter_cte else ""
    having = f"HAVING count(*) = {len(uniq)}" if require_all else ""
    if min_match is not None and not require_all:
        having = f"HAVING count(*) >= {int(min_match)}"
    return f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1){match_cte},
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) {match_join} CROSS JOIN st
  WHERE tf.term IN ({tlist})
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id {having})
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {k}{
    f" OFFSET {offset}" if offset else ""}
"""


def _bm25_query(terms, k=10, strategy="maxscore"):
    def fn(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search(spark, idx, terms, k, strategy=strategy)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    return fn


# --------------------------------------------------------------------------
# registry: name -> (callable, sql | None)
# --------------------------------------------------------------------------


def _registry() -> dict[str, tuple]:
    R: dict[str, tuple] = {}

    # ---- full-text engine (SURVEY §2.2 sink / §3.4 lifecycle) ----
    R["bm25_topk"] = (_bm25_query(BM25_HEAD_TERMS), bm25_sql(BM25_HEAD_TERMS))
    R["bm25_topk_tail"] = (_bm25_query(BM25_TAIL_TERMS), bm25_sql(BM25_TAIL_TERMS))
    R["bm25_topk_bmw"] = (
        _bm25_query(BM25_HEAD_TERMS, strategy="bmw"),
        bm25_sql(BM25_HEAD_TERMS),
    )

    def bm25_ranged(spark, sf_dir):
        """Doc-range-parallel scoring (query.search_ranged): posting lists
        byte-sliced at block boundaries into 8 doc-id windows, scored in
        parallel tasks, bit-exact with the single-task-per-unit path."""
        idx = docs_index(spark, sf_dir)
        res = query.search_ranged(spark, idx, BM25_HEAD_TERMS, 10, ranges=8)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_ranged"] = (bm25_ranged, bm25_sql(BM25_HEAD_TERMS))

    # boolean AND (conjunctive intersection inside the scorer)
    def bm25_conjunctive(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search(spark, idx, ["data", "query", "fast"], 10, mode="and")
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_conjunctive"] = (
        bm25_conjunctive,
        bm25_sql(["data", "query", "fast"], require_all=True),
    )

    # metadata pre-filter (lang = 'de') applied via distributed semi-join
    def bm25_filtered(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        flt = _documents(spark, sf_dir).filter(F.col("lang") == "de").select("doc_id")
        res = query.search(spark, idx, ["data", "query", "fast"], 10, filter_df=flt)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_filtered"] = (
        bm25_filtered,
        bm25_sql(
            ["data", "query", "fast"],
            doc_filter_cte="SELECT doc_id FROM documents WHERE lang = 'de'",
        ),
    )

    # bool.must_not: docs containing ANY excluded term are filtered out
    # (pure filter context — reference shape: OpenSearch bool queries,
    # search_store.go DeleteByQuery / bool.must_not DSL)
    MUST_NOT = ["vector"]

    def bm25_must_not(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search(
            spark, idx, ["data", "query", "fast"], 10, exclude_terms=MUST_NOT
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _not_cte = (
        "SELECT doc_id FROM documents WHERE doc_id NOT IN "
        f"(SELECT doc_id FROM tok WHERE term IN ({', '.join(repr(t) for t in MUST_NOT)}))"
    )
    R["bm25_must_not"] = (
        bm25_must_not,
        bm25_sql(["data", "query", "fast"], doc_filter_cte=_not_cte),
    )

    # delete-by-query: tombstone all docs matching a metadata predicate,
    # then verify the live-doc count (reference: DeleteByQuery on schema
    # drop, search_store.go:154-184); runs on a COPY of the cached index
    def drop_source_count(spark, sf_dir):
        import shutil
        import tempfile as _tf

        from . import incremental

        idx = docs_index(spark, sf_dir)
        cp = _tf.mkdtemp(prefix="pgspark_drop_")
        shutil.rmtree(cp)
        shutil.copytree(idx, cp)
        match = (
            _documents(spark, sf_dir).filter(F.col("lang") == "de").select("doc_id")
        )
        incremental.drop_docs(spark, cp, match)
        stats = merge.load_stats(cp)
        out = spark.createDataFrame(
            [(int(stats["n_docs"]),)], "live_docs bigint"
        )
        shutil.rmtree(cp, ignore_errors=True)
        return out

    R["drop_source_count"] = (
        drop_source_count,
        "SELECT count(*)::BIGINT AS live_docs FROM documents WHERE lang <> 'de'",
    )

    # per-doc retry of quarantined poison docs (search_store_retrier.go:
    # 94-150: only the retriable failed documents are resent): build
    # excluding a deterministic subset, quarantine those ids, re-ingest
    # them from the full table, verify the index converges to the full
    # corpus with exactly that many docs retried
    def quarantine_retry_count(spark, sf_dir):
        import shutil
        import tempfile as _tf

        from . import incremental

        docs = _documents(spark, sf_dir)
        idx = _tf.mkdtemp(prefix="pgspark_retry_")
        try:
            build.build_index(
                spark,
                build.docs_unit_provider(docs.filter(F.col("doc_id") % 97 != 0)),
                idx, num_units=1, partitions=8,
            )
            merge.merge_index(spark, idx)
            poison = docs.filter(F.col("doc_id") % 97 == 0).select(
                "doc_id", F.lit("ValueError: synthetic poison").alias("error")
            )
            poison.write.parquet(
                os.path.join(build.quarantine_path(idx), "unit=0")
            )
            res = incremental.retry_quarantined(
                spark, build.docs_unit_provider(docs), idx, input_snapshot_id=1
            )
            stats = merge.load_stats(idx)
            return spark.createDataFrame(
                [(int(stats["n_docs"]), int(res["retried"]),
                  int(res["still_quarantined"]))],
                "live_docs bigint, retried bigint, still_quarantined bigint",
            )
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    R["quarantine_retry_count"] = (
        quarantine_retry_count,
        "SELECT (SELECT count(*) FROM documents)::BIGINT AS live_docs, "
        "(SELECT count(*) FROM documents WHERE doc_id % 97 = 0)::BIGINT AS retried, "
        "0::BIGINT AS still_quarantined",
    )

    # multi-field BM25 with per-field boosts (per-column mappings,
    # search_pg_mapper.go:137-183): title (first-8-tokens headline field,
    # boost 2.0) + body (full text, boost 1.0), each with its own
    # df/doclen/avgdl — the OpenSearch multi-field bool/should shape
    MF_TERMS = ["data", "query", "fast"]
    MF_BOOSTS = {"title": 2.0, "body": 1.0}

    def bm25_multifield(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield(spark, fields, MF_TERMS, 10, boosts=MF_BOOSTS)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _mf_tlist = ", ".join(f"'{t}'" for t in sorted(set(MF_TERMS)))
    _mf_w = "(tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl))"
    _mf_idf = "ln(1.0 + ((SELECT n FROM n) - df.df + 0.5) / (df.df + 0.5))"
    R["bm25_multifield"] = (
        bm25_multifield,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * {_mf_idf} * {_mf_w} AS c
  FROM b_tf tf JOIN b_df df USING (term) JOIN b_dl dl USING (doc_id) CROSS JOIN b_st st
  WHERE tf.term IN ({_mf_tlist})
  UNION ALL
  SELECT tf.doc_id, {MF_BOOSTS['title']} * {_mf_idf} * {_mf_w} AS c
  FROM t_tf tf JOIN t_df df USING (term) JOIN t_dl dl USING (doc_id) CROSS JOIN t_st st
  WHERE tf.term IN ({_mf_tlist})
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # multi-field PHRASE (multi_match type=phrase, best_fields fusion):
    # a doc matches if the phrase occurs in ANY field; fused score =
    # max_f boost_f * phrase-terms-BM25_f (per-field idf/dl/avgdl)
    MF_PHRASE = ["table", "hash"]

    def bm25_multifield_phrase(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield_phrase(
            spark, fields, MF_PHRASE, 10, boosts=MF_BOOSTS
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _mfp_tlist = ", ".join(f"'{t}'" for t in sorted(set(MF_PHRASE)))
    _mfp_bigram = " ".join(MF_PHRASE)
    R["bm25_multifield_phrase"] = (
        bm25_multifield_phrase,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
b_match AS (
  SELECT doc_id FROM
  (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents)
  WHERE len(toks) >= 2 AND list_contains(
    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
    '{_mfp_bigram}')
),
t_match AS (
  SELECT doc_id FROM
  (SELECT doc_id, (regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8] AS toks FROM documents)
  WHERE len(toks) >= 2 AND list_contains(
    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
    '{_mfp_bigram}')
),
b_scored AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * sum({_mf_idf} * {_mf_w}) AS score
  FROM b_tf tf JOIN b_df df USING (term) JOIN b_dl dl USING (doc_id)
       JOIN b_match USING (doc_id) CROSS JOIN b_st st
  WHERE tf.term IN ({_mfp_tlist}) GROUP BY tf.doc_id
),
t_scored AS (
  SELECT tf.doc_id, {MF_BOOSTS['title']} * sum({_mf_idf} * {_mf_w}) AS score
  FROM t_tf tf JOIN t_df df USING (term) JOIN t_dl dl USING (doc_id)
       JOIN t_match USING (doc_id) CROSS JOIN t_st st
  WHERE tf.term IN ({_mfp_tlist}) GROUP BY tf.doc_id
),
fused AS (
  SELECT doc_id, max(score) AS score
  FROM (SELECT * FROM b_scored UNION ALL SELECT * FROM t_scored)
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # multi-field PREFIX: per-field lexicon expansion (capped 128 each),
    # union, sum-fused multifield scoring (most_fields shape)
    MF_PREFIX = "qu"

    def bm25_multifield_prefix(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield_prefix(
            spark, fields, MF_PREFIX, 10, boosts=MF_BOOSTS, max_expansions=128
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_multifield_prefix"] = (
        bm25_multifield_prefix,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
exp AS (
  SELECT term FROM (SELECT DISTINCT term FROM body_tok WHERE term LIKE '{MF_PREFIX}%' ORDER BY term LIMIT 128)
  UNION
  SELECT term FROM (SELECT DISTINCT term FROM title_tok WHERE term LIKE '{MF_PREFIX}%' ORDER BY term LIMIT 128)
),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * {_mf_idf} * {_mf_w} AS c
  FROM b_tf tf JOIN exp USING (term) JOIN b_df df USING (term)
       JOIN b_dl dl USING (doc_id) CROSS JOIN b_st st
  UNION ALL
  SELECT tf.doc_id, {MF_BOOSTS['title']} * {_mf_idf} * {_mf_w} AS c
  FROM t_tf tf JOIN exp USING (term) JOIN t_df df USING (term)
       JOIN t_dl dl USING (doc_id) CROSS JOIN t_st st
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # multi-field REGEXP: per-field anchored-regex lexicon expansion,
    # union, sum-fused multifield scoring
    MF_REGEXP = "qu[ae]ry"

    def bm25_multifield_regexp(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield_regexp(
            spark, fields, MF_REGEXP, 10, boosts=MF_BOOSTS, max_expansions=128
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _mfrx_exp = (
        "SELECT DISTINCT term FROM {tok} WHERE "
        f"regexp_full_match(term, '{MF_REGEXP}') ORDER BY term LIMIT 128"
    )
    R["bm25_multifield_regexp"] = (
        bm25_multifield_regexp,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
exp AS (
  SELECT term FROM ({_mfrx_exp.format(tok='body_tok')})
  UNION
  SELECT term FROM ({_mfrx_exp.format(tok='title_tok')})
),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * {_mf_idf} * {_mf_w} AS c
  FROM b_tf tf JOIN exp USING (term) JOIN b_df df USING (term)
       JOIN b_dl dl USING (doc_id) CROSS JOIN b_st st
  UNION ALL
  SELECT tf.doc_id, {MF_BOOSTS['title']} * {_mf_idf} * {_mf_w} AS c
  FROM t_tf tf JOIN exp USING (term) JOIN t_df df USING (term)
       JOIN t_dl dl USING (doc_id) CROSS JOIN t_st st
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # multi-field FUZZY (multi_match + fuzziness): per-field edit-distance
    # lexicon expansion, union, sum-fused multifield scoring
    MF_FUZZY = "lin"  # misspelling; distance <= 2 -> {big, join, line}

    def bm25_multifield_fuzzy(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield_fuzzy(
            spark, fields, MF_FUZZY, 10, boosts=MF_BOOSTS,
            max_edits=2, max_expansions=128,
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _mff_exp = (
        "SELECT DISTINCT term FROM {tok} WHERE "
        f"levenshtein(term, '{MF_FUZZY}') <= 2 ORDER BY term LIMIT 128"
    )
    R["bm25_multifield_fuzzy"] = (
        bm25_multifield_fuzzy,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
exp AS (
  SELECT term FROM ({_mff_exp.format(tok='body_tok')})
  UNION
  SELECT term FROM ({_mff_exp.format(tok='title_tok')})
),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * {_mf_idf} * {_mf_w} AS c
  FROM b_tf tf JOIN exp USING (term) JOIN b_df df USING (term)
       JOIN b_dl dl USING (doc_id) CROSS JOIN b_st st
  UNION ALL
  SELECT tf.doc_id, {MF_BOOSTS['title']} * {_mf_idf} * {_mf_w} AS c
  FROM t_tf tf JOIN exp USING (term) JOIN t_df df USING (term)
       JOIN t_dl dl USING (doc_id) CROSS JOIN t_st st
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # BM25 over a FOLDED index (tiered unit merge): 3 units -> one via
    # merge_units; results must still match the from-corpus oracle exactly
    def bm25_after_fold(spark, sf_dir):
        idx = folded_index(spark, sf_dir)
        res = query.search(spark, idx, BM25_HEAD_TERMS, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_after_fold"] = (bm25_after_fold, bm25_sql(BM25_HEAD_TERMS))

    # exact phrase over the positional index (match_phrase analog)
    PHRASE = ["table", "hash"]

    def bm25_phrase(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_phrase(spark, idx, PHRASE, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _phrase_cte = (
        "SELECT doc_id FROM "
        "(SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents) "
        "WHERE len(toks) >= 2 AND list_contains("
        "list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]), "
        f"'{' '.join(PHRASE)}')"
    )
    R["bm25_phrase"] = (bm25_phrase, bm25_sql(PHRASE, doc_filter_cte=_phrase_cte))

    # prefix / wildcard term queries: lexicon range-scan expansion feeding
    # the standard scorer (scoring_boolean rewrite; the keyword-subfield
    # prefix/wildcard shape the reference's mapper emits,
    # opensearch_mapper.go:17,44-53)
    PREFIX = "qu"
    WILDCARD = "f?st"  # ? = one char -> SQL LIKE 'f_st'

    def bm25_prefix(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_prefix(spark, idx, PREFIX, k=10, max_expansions=128)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _exp_cte = (
        "SELECT DISTINCT term FROM tok WHERE term LIKE '{like}' "
        "ORDER BY term LIMIT 128"
    )
    _expand_sql = """
WITH {tok},
exp AS ({exp}),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN exp USING (term) JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
"""
    R["bm25_prefix"] = (
        bm25_prefix,
        _expand_sql.format(tok=TOK_CTE, exp=_exp_cte.format(like=f"{PREFIX}%")),
    )

    def bm25_wildcard(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_wildcard(spark, idx, WILDCARD, k=10, max_expansions=128)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_wildcard"] = (
        bm25_wildcard,
        _expand_sql.format(
            tok=TOK_CTE,
            exp=_exp_cte.format(like=WILDCARD.replace("*", "%").replace("?", "_")),
        ),
    )

    # regexp term query: anchored-regex lexicon expansion (streamed scan,
    # lead-literal range pruning), scoring_boolean rewrite
    REGEXP = "qu[ae]ry"

    def bm25_regexp(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_regexp(spark, idx, REGEXP, k=10, max_expansions=128)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _rx_exp = (
        f"SELECT DISTINCT term FROM tok WHERE "
        f"regexp_full_match(term, '{REGEXP}') ORDER BY term LIMIT 128"
    )
    R["bm25_regexp"] = (
        bm25_regexp, _expand_sql.format(tok=TOK_CTE, exp=_rx_exp)
    )

    # search_after deep pagination: page 2 via the page-1 tail cursor must
    # equal the oracle's OFFSET 10 window of the same global order
    def bm25_search_after(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        tail = query.search(spark, idx, BM25_HEAD_TERMS, 10).collect()[-1]
        res = query.search_after(
            spark, idx, BM25_HEAD_TERMS, 10,
            after=(float(tail["score"]), int(tail["doc_id"])),
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_search_after"] = (
        bm25_search_after, bm25_sql(BM25_HEAD_TERMS, offset=10)
    )

    # highlighting: top-k plus matched terms and a token-window snippet
    # from the same normalized token stream the index scored
    def bm25_highlight(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        docs = _documents(spark, sf_dir).select("doc_id", "text")
        res = query.search_highlight(
            spark, idx, BM25_HEAD_TERMS, 10, docs, text_col="text", window=3
        )
        return res.select(
            "doc_id", F.round("score", 4).alias("score"),
            "matched_terms", "snippet",
        )

    _hl_terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_HEAD_TERMS)))
    R["bm25_highlight"] = (
        bm25_highlight,
        f"""
WITH top AS ({bm25_sql(BM25_HEAD_TERMS)}),
tl AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
       FROM documents JOIN top USING (doc_id)),
hl AS (SELECT doc_id,
       list_position(list_transform(toks,
           t -> CASE WHEN list_contains([{_hl_terms}], t) THEN 1 ELSE 0 END), 1)
         AS fp,
       toks FROM tl)
SELECT top.doc_id, top.score,
       array_to_string(list_filter([{_hl_terms}],
           t -> list_contains(toks, t)), ',') AS matched_terms,
       array_to_string(toks[greatest(1, fp - 3):greatest(1, fp - 3) + 6], ' ')
         AS snippet
FROM hl JOIN top USING (doc_id)
ORDER BY top.score DESC, top.doc_id ASC
""",
    )

    # more_like_this: seed doc's top tf*idf terms (against the index's own
    # dfs) -> standard BM25 top-k, seed excluded
    MLT_SEED = 42

    def bm25_more_like_this(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        seed = (
            _documents(spark, sf_dir)
            .filter(F.col("doc_id") == MLT_SEED).collect()[0]["text"]
        )
        res = query.more_like_this(
            spark, idx, seed, k=10, max_query_terms=10,
            exclude_doc_id=MLT_SEED,
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_more_like_this"] = (
        bm25_more_like_this,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
seedtf AS (SELECT term, count(*)::BIGINT AS stf FROM tok
           WHERE doc_id = {MLT_SEED} GROUP BY 1),
qt AS (SELECT term FROM seedtf JOIN df USING (term) CROSS JOIN st
       ORDER BY stf * ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) DESC,
                term ASC LIMIT 10),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN qt USING (term) JOIN df USING (term)
       JOIN dl USING (doc_id) CROSS JOIN st
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib
           WHERE doc_id <> {MLT_SEED} GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # suggesters: completion (prefix -> popular terms) and term
    # (did-you-mean: edit distance, then popularity)
    def suggest_completion_qu(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        return query.suggest_completion(spark, idx, "qu", n=10)

    R["suggest_completion"] = (
        suggest_completion_qu,
        f"""
WITH {TOK_CTE},
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq
       FROM tok GROUP BY 1)
SELECT term, doc_freq FROM df WHERE term >= 'qu' AND term < 'qv'
ORDER BY doc_freq DESC, term ASC LIMIT 10
""",
    )

    SUGGEST_Q = "quer"  # misspelling; 'query' at distance 1

    def suggest_term_q(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.suggest_term(spark, idx, SUGGEST_Q, n=5, max_edits=2)
        return res.select(
            "term", "doc_freq", F.col("distance").cast("bigint").alias("distance")
        )

    R["suggest_term"] = (
        suggest_term_q,
        f"""
WITH {TOK_CTE},
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS doc_freq
       FROM tok GROUP BY 1)
SELECT term, doc_freq, levenshtein(term, '{SUGGEST_Q}')::BIGINT AS distance
FROM df
WHERE term >= 'q' AND term < 'r'
  AND length(term) BETWEEN {len(SUGGEST_Q) - 2} AND {len(SUGGEST_Q) + 2}
  AND term <> '{SUGGEST_Q}'
  AND levenshtein(term, '{SUGGEST_Q}') <= 2
ORDER BY distance ASC, doc_freq DESC, term ASC LIMIT 5
""",
    )

    # _explain API analog: per-term contribution breakdown for one doc
    EXPLAIN_DOC = 42

    def bm25_explain(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.explain_score(spark, idx, BM25_HEAD_TERMS, EXPLAIN_DOC)
        return res.select("term", F.round("score", 4).alias("score"))

    _ex_terms = ", ".join(f"'{t}'" for t in sorted(set(BM25_HEAD_TERMS)))
    R["bm25_explain"] = (
        bm25_explain,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1)
SELECT tf.term,
       round(ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
             * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)),
             4) AS score
FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
WHERE tf.doc_id = {EXPLAIN_DOC} AND tf.term IN ({_ex_terms})
ORDER BY term ASC
""",
    )

    # boolean match set shared by facet/aggregation entries
    FACET_TERMS = ["data", "query"]
    _m_cte = (
        "m AS (SELECT doc_id FROM (SELECT DISTINCT doc_id, term FROM tok "
        "WHERE term IN ('data', 'query')) GROUP BY doc_id)"
    )

    # significant_terms aggregation: JLH-scored overrepresentation of the
    # match set's vocabulary vs the index-wide background
    def search_significant_terms(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        docs = _documents(spark, sf_dir).select("doc_id", "text")
        res = query.significant_terms(
            spark, idx, FACET_TERMS, docs, n=10, min_doc_count=3
        )
        return res.select(
            "term", "fg_count", F.round("score", 6).alias("score")
        )

    R["search_significant_terms"] = (
        search_significant_terms,
        f"""
WITH {TOK_CTE},
{_m_cte},
nm AS (SELECT count(*)::BIGINT AS nm FROM m),
nn AS (SELECT count(*)::BIGINT AS n FROM documents),
fg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS fg_count
       FROM tok JOIN m USING (doc_id)
       WHERE term NOT IN ('data', 'query')
       GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3),
bg AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS bg_count
       FROM tok GROUP BY 1)
SELECT term, fg_count,
       round((fg_count / CAST(nm AS DOUBLE) - bg_count / CAST(n AS DOUBLE))
             * ((fg_count / CAST(nm AS DOUBLE)) / (bg_count / CAST(n AS DOUBLE))),
             6) AS score
FROM fg JOIN bg USING (term) CROSS JOIN nm CROSS JOIN nn
ORDER BY (fg_count / CAST(nm AS DOUBLE) - bg_count / CAST(n AS DOUBLE))
         * ((fg_count / CAST(nm AS DOUBLE)) / (bg_count / CAST(n AS DOUBLE))) DESC,
         term ASC
LIMIT 10
""",
    )

    # fuzzy term query: edit-distance lexicon expansion (vectorized batch
    # Levenshtein over the term-sorted lexicon scan) feeding the standard
    # scorer — the Lucene FuzzyQuery / OpenSearch ``fuzziness`` rewrite
    # over the keyword subfield (opensearch_mapper.go:17,44-53)
    FUZZY = "lin"  # misspelling; distance <= 2 -> {big, join, line}

    def bm25_fuzzy(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_fuzzy(
            spark, idx, FUZZY, k=10, max_edits=2, max_expansions=128
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_fuzzy"] = (
        bm25_fuzzy,
        _expand_sql.format(
            tok=TOK_CTE,
            exp=(
                "SELECT DISTINCT term FROM tok WHERE "
                f"levenshtein(term, '{FUZZY}') <= 2 ORDER BY term LIMIT 128"
            ),
        ),
    )

    # bool/should with minimum_should_match (between OR and AND)
    MSM_TERMS = ["data", "query", "fast", "vector"]

    def bm25_min_should(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_min_should_match(spark, idx, MSM_TERMS, 3, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_min_should_match"] = (
        bm25_min_should,
        bm25_sql(MSM_TERMS, min_match=3),
    )

    # ordered-window proximity (sloppy phrase) over the positional index
    PROX = ["table", "hash"]

    def bm25_proximity(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_proximity(spark, idx, PROX, slop=1, k=10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _prox_cte = (
        "SELECT DISTINCT a.doc_id FROM "
        "(WITH x AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents) "
        "SELECT doc_id, unnest(toks) AS term, unnest(range(1, len(toks)+1)) AS p FROM x) a "
        "JOIN (WITH x AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents) "
        "SELECT doc_id, unnest(toks) AS term, unnest(range(1, len(toks)+1)) AS p FROM x) b "
        f"USING (doc_id) WHERE a.term = '{PROX[0]}' AND b.term = '{PROX[1]}' "
        "AND b.p > a.p AND b.p <= a.p + 2"
    )
    R["bm25_proximity"] = (bm25_proximity, bm25_sql(PROX, doc_filter_cte=_prox_cte))


    def search_facets_lang(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "lang")
        return query.search_facets(spark, idx, FACET_TERMS, meta, "lang")

    R["search_facets"] = (
        search_facets_lang,
        f"""
WITH {TOK_CTE},
m AS (SELECT doc_id FROM (SELECT DISTINCT doc_id, term FROM tok
      WHERE term IN ('data', 'query')) GROUP BY doc_id)
SELECT lang AS facet, count(*)::BIGINT AS doc_count
FROM documents JOIN m USING (doc_id)
GROUP BY 1 ORDER BY doc_count DESC, facet ASC
""",
    )

    # ---- OpenSearch aggregation parity over the same match set ----

    def agg_histogram(spark, sf_dir):
        """Numeric histogram aggregation (fixed-interval buckets of
        documents.n_chars over the boolean match set)."""
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        res = query.search_histogram(
            spark, idx, FACET_TERMS, meta, "n_chars", 200.0
        )
        return res.select(
            F.col("bucket").cast("double").alias("bucket"), "doc_count"
        )

    R["search_agg_histogram"] = (
        agg_histogram,
        f"""
WITH {TOK_CTE},
{_m_cte}
SELECT floor(n_chars / 200.0) * 200.0 AS bucket, count(*)::BIGINT AS doc_count
FROM documents JOIN m USING (doc_id)
GROUP BY 1 ORDER BY bucket ASC
""",
    )

    def agg_stats(spark, sf_dir):
        """Stats aggregation (count/min/max/sum/avg of n_chars over the
        match set) — one row."""
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        res = query.search_stats(spark, idx, FACET_TERMS, meta, "n_chars")
        return res.select(
            "value_count",
            F.col("min_value").cast("bigint").alias("min_value"),
            F.col("max_value").cast("bigint").alias("max_value"),
            F.col("sum_value").cast("bigint").alias("sum_value"),
            F.round("avg_value", 4).alias("avg_value"),
        )

    R["search_agg_stats"] = (
        agg_stats,
        f"""
WITH {TOK_CTE},
{_m_cte}
SELECT count(n_chars)::BIGINT AS value_count,
       min(n_chars)::BIGINT AS min_value,
       max(n_chars)::BIGINT AS max_value,
       sum(n_chars)::BIGINT AS sum_value,
       round(avg(n_chars), 4) AS avg_value
FROM documents JOIN m USING (doc_id)
""",
    )

    def agg_date_histogram(spark, sf_dir):
        """date_histogram aggregation: documents carry no timestamp, so a
        deterministic derived one (epoch + (doc_id % 200) hours) exercises
        the real path — match-set semi-join, date_trunc('day') buckets."""
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select(
            "doc_id",
            F.expr(
                "timestamp'2025-01-01 00:00:00' + "
                "make_interval(0, 0, 0, 0, CAST(doc_id % 200 AS INT), 0, 0)"
            ).alias("ts"),
        )
        res = query.search_date_histogram(
            spark, idx, FACET_TERMS, meta, "ts", "day"
        )
        return res.select(
            F.date_format("bucket", "yyyy-MM-dd").alias("bucket"), "doc_count"
        )

    R["search_agg_date_histogram"] = (
        agg_date_histogram,
        f"""
WITH {TOK_CTE},
{_m_cte},
ts AS (SELECT doc_id,
       TIMESTAMP '2025-01-01 00:00:00' + (doc_id % 200) * INTERVAL 1 HOUR AS ts
       FROM documents)
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS bucket,
       count(*)::BIGINT AS doc_count
FROM ts JOIN m USING (doc_id)
GROUP BY 1 ORDER BY bucket ASC
""",
    )

    def index_doc_stats(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        return (
            spark.read.parquet(build.docs_path(idx))
            .select("doc_id", F.col("doclen").cast("bigint").alias("doclen"))
        )

    R["index_doc_stats"] = (
        index_doc_stats,
        f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1)
SELECT d.doc_id, coalesce(dl.dl, 0)::BIGINT AS doclen
FROM documents d LEFT JOIN dl ON d.doc_id = dl.doc_id
""",
    )

    def index_lexicon(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        return merge.read_lexicon(spark, idx).select("term", "df_total", "cf_total")

    R["index_lexicon"] = (
        index_lexicon,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2)
SELECT term, count(*)::BIGINT AS df_total, sum(tf)::BIGINT AS cf_total
FROM tf GROUP BY term
""",
    )

    def index_global_stats(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        s = merge.load_stats(idx)
        return spark.createDataFrame(
            [(int(s["n_docs"]), round(float(s["avgdl"]), 4))],
            "n_docs bigint, avgdl double",
        )

    R["index_global_stats"] = (
        index_global_stats,
        f"""
WITH {TOK_CTE},
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1)
SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
       round((SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents), 4) AS avgdl
""",
    )

    # ---- scans / filters (SURVEY §2.1, §2.3) ----
    R["scan_project_filter"] = (
        lambda spark, sf_dir: _documents(spark, sf_dir)
        .filter((F.col("lang") == "en") & (F.col("n_chars") >= 200))
        .select("doc_id", "source", "n_chars"),
        "SELECT doc_id, source, n_chars FROM documents WHERE lang = 'en' AND n_chars >= 200",
    )

    def filter_include_exclude(spark, sf_dir):
        d = _documents(spark, sf_dir)
        include_exact = ["src2", "src3"]
        include_prefix = "src1"
        excluded = ["src3", "src12"]
        return d.filter(
            (F.col("source").isin(include_exact) | F.col("source").startswith(include_prefix))
            & ~F.col("source").isin(excluded)
        ).select("doc_id", "source")

    R["filter_include_exclude"] = (
        filter_include_exclude,
        """
SELECT doc_id, source FROM documents
WHERE (source IN ('src2', 'src3') OR source LIKE 'src1%')
  AND source NOT IN ('src3', 'src12')
""",
    )

    # ---- transformer rule map (SURVEY §2.11) ----
    def transform_rules(spark, sf_dir):
        d = _documents(spark, sf_dir).withColumn(
            "email", F.concat_ws("@", F.col("source"), F.lit("example.com"))
        )
        rules = {
            "source": {"type": "masking", "keep_first": 2, "keep_last": 2},
            "lang": {"type": "template", "fmt": "%s/%s", "cols": ["source", "lang"]},
            "email": {"type": "hash_email"},
            "text": {"type": "hash_int"},
        }
        out = transformers.apply_rules(d, rules)
        return out.select(
            "doc_id",
            F.col("source").alias("source_masked"),
            F.col("lang").alias("source_lang"),
            F.col("email").alias("email_hashed"),
            F.col("text").alias("text_hash"),
        )

    R["transform_rules"] = (
        transform_rules,
        """
SELECT doc_id,
       CASE WHEN strlen(source) <= 4 THEN repeat('*', strlen(source))
            ELSE substr(source, 1, 2) || repeat('*', strlen(source) - 4)
                 || substr(source, strlen(source) - 1, 2) END AS source_masked,
       printf('%s/%s', source, lang) AS source_lang,
       substr(md5(source), 1, 12) || '@example.com' AS email_hashed,
       ('0x' || substr(md5(text), 1, 15))::BIGINT AS text_hash
FROM documents
""",
    )

    def transform_generators(spark, sf_dir):
        """The hash-generator transformer catalog (reference
        transformer.go:38-63 type list): deterministic fake names / phone /
        ints / floats / uuid / bool / date / timestamp / keyed pseudonym,
        all md5-derived Column expressions (JVM-side) and bit-identical in
        DuckDB."""
        d = _documents(spark, sf_dir)
        v = F.col("source")
        return d.select(
            "doc_id",
            transformers.pick(v, transformers.FIRST_NAMES).alias("gen_first"),
            F.concat_ws(
                " ",
                transformers.pick(v, transformers.FIRST_NAMES),
                transformers.pick(F.concat(v, F.lit("#")), transformers.LAST_NAMES),
            ).alias("gen_full"),
            transformers.phone_number(v).alias("gen_phone"),
            transformers.greenmask_integer(v, 10, 99).alias("gen_int"),
            transformers.greenmask_float(v, 0.0, 100.0).alias("gen_float"),
            transformers.greenmask_uuid(v).alias("gen_uuid"),
            transformers.greenmask_boolean(v).alias("gen_bool"),
            transformers.greenmask_date(v).alias("gen_date"),
            transformers.greenmask_utc_timestamp(v).alias("gen_ts"),
            transformers.keyed_hash(v, "k1").alias("gen_keyed"),
            transformers.det_string(v, 4, 16).alias("gen_str"),
        )

    _FN = "'" + "','".join(transformers.FIRST_NAMES) + "'"
    _LN = "'" + "','".join(transformers.LAST_NAMES) + "'"
    R["transform_generators"] = (
        transform_generators,
        f"""
SELECT doc_id,
  ([{_FN}])[(('0x'||substr(md5(source),1,6))::BIGINT % 8 + 1)::INT] AS gen_first,
  ([{_FN}])[(('0x'||substr(md5(source),1,6))::BIGINT % 8 + 1)::INT] || ' ' ||
    ([{_LN}])[(('0x'||substr(md5(source||'#'),1,6))::BIGINT % 8 + 1)::INT] AS gen_full,
  '+' || ((('0x'||substr(md5(source),1,4))::BIGINT % 98) + 1)::VARCHAR || '-' ||
    lpad(((('0x'||substr(md5(source),5,10))::BIGINT % 10000000))::VARCHAR, 7, '0') AS gen_phone,
  (('0x'||substr(md5(source),1,12))::BIGINT % 90 + 10)::BIGINT AS gen_int,
  round((('0x'||substr(md5(source),1,9))::BIGINT / 68719476736.0) * 100.0, 4) AS gen_float,
  substr(md5(source),1,8)||'-'||substr(md5(source),9,4)||'-'||substr(md5(source),13,4)
    ||'-'||substr(md5(source),17,4)||'-'||substr(md5(source),21,12) AS gen_uuid,
  (('0x'||substr(md5(source),1,6))::BIGINT % 2 = 0) AS gen_bool,
  (DATE '1970-01-01' + ((('0x'||substr(md5(source),1,10))::BIGINT % 20000)::INT))::VARCHAR AS gen_date,
  strftime(TIMESTAMP '1970-01-01' + (('0x'||substr(md5(source),1,12))::BIGINT % 2000000000)
    * INTERVAL 1 SECOND, '%Y-%m-%d %H:%M:%S') AS gen_ts,
  md5('k1' || source) AS gen_keyed,
  substr(md5(source) || md5(source || '+'), 1,
         (('0x'||substr(md5(source),1,6))::BIGINT % 13 + 4)::INT) AS gen_str
FROM documents
""",
    )

    # ---- wildcard table filter engine (SURVEY §2.3) ----
    def filter_wildcard(spark, sf_dir):
        rel = _documents(spark, sf_dir).select(
            "doc_id", F.col("source").alias("schema"), F.col("lang").alias("tbl")
        )
        cfg = tablefilter.FilterConfig(
            include=["src1.*", "src2.en", "src5.de"],
            exclude=["src1.fr"],
            schema_only=["src4"],
        )
        return rel.filter(tablefilter.allowed_expr(cfg, "schema", "tbl"))

    R["filter_wildcard"] = (
        filter_wildcard,
        """
SELECT doc_id, source AS schema, lang AS tbl FROM documents
WHERE CASE WHEN source = 'src1' AND lang = 'fr' THEN FALSE
           WHEN (source = 'src2' AND lang = 'en') OR (source = 'src5' AND lang = 'de') THEN TRUE
           WHEN source = 'src4' THEN FALSE
           WHEN source = 'src1' THEN TRUE
           ELSE FALSE END
""",
    )

    # ---- oversize guards + dropped-row accounting (SURVEY §2.3/§2.10) ----
    def filter_oversize(spark, sf_dir):
        """Size-limit guards with per-source dropped-row accounting — the
        declarative form of the build pipeline's guards (build.py:640-645
        id guard, build.py:198-205 term-byte cap; ref search_store.go:137-143
        skips ids > 512 B, opensearch_mapper.go:44-53 caps terms at 32766 B,
        wal_kafka_batch_writer.go:168-179 drops + counts oversized records).
        Caps are scaled down (doc 400 chars / term 5 B) so the synthetic
        corpus actually trips both guards."""
        doc_cap, term_cap = 400, 5
        toks = _documents(spark, sf_dir).select(
            "doc_id",
            "source",
            "n_chars",
            F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z0-9]+"), 0)).alias(
                "term"
            ),
        )
        kept = F.col("n_chars") <= doc_cap
        return toks.groupBy("source").agg(
            F.countDistinct(F.when(kept, F.col("doc_id"))).alias("docs_kept"),
            F.countDistinct(F.when(~kept, F.col("doc_id"))).alias("docs_dropped"),
            F.sum(
                F.when(kept & (F.octet_length("term") <= term_cap), 1).otherwise(0)
            ).alias("terms_kept"),
            F.sum(
                F.when(kept & (F.octet_length("term") > term_cap), 1).otherwise(0)
            ).alias("terms_dropped"),
        )

    R["filter_oversize"] = (
        filter_oversize,
        """
WITH tok AS (SELECT doc_id, source, n_chars,
                    unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
             FROM documents)
SELECT source,
       count(DISTINCT CASE WHEN n_chars <= 400 THEN doc_id END)::BIGINT AS docs_kept,
       count(DISTINCT CASE WHEN n_chars > 400 THEN doc_id END)::BIGINT AS docs_dropped,
       sum(CASE WHEN n_chars <= 400 AND octet_length(encode(term)) <= 5 THEN 1 ELSE 0 END)::BIGINT AS terms_kept,
       sum(CASE WHEN n_chars <= 400 AND octet_length(encode(term)) > 5 THEN 1 ELSE 0 END)::BIGINT AS terms_dropped
FROM tok GROUP BY source
""",
    )

    # ---- joins (SURVEY §2.4) ----
    def broadcast_lookup_join(spark, sf_dir):
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
        return (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .groupBy("p_brand")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("l_quantity").cast("double").alias("sum_qty"),
                F.min("l_extendedprice").alias("min_price"),
                F.max("l_extendedprice").alias("max_price"),
            )
        )

    R["broadcast_lookup_join"] = (
        broadcast_lookup_join,
        """
SELECT p_brand, count(*)::BIGINT AS n_rows, sum(l_quantity)::DOUBLE AS sum_qty,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    )

    def resume_anti_join(spark, sf_dir):
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        return (
            orders.join(li, orders.o_orderkey == li.l_orderkey, "left_anti")
            .select("o_orderkey", "o_orderstatus")
        )

    R["resume_anti_join"] = (
        resume_anti_join,
        """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
""",
    )

    # ---- aggregation folds (SURVEY §2.5) ----
    def checkpoint_max_fold(spark, sf_dir):
        ev = _events(spark, sf_dir)
        return (
            ev.withColumn("partition", (F.col("user_id") % 16).cast("int"))
            .groupBy("partition")
            .agg(
                F.max("event_id").alias("high_water"),
                F.count(F.lit(1)).alias("n_events"),
            )
        )

    R["checkpoint_max_fold"] = (
        checkpoint_max_fold,
        """
SELECT (user_id % 16)::INT AS partition, max(event_id) AS high_water,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1
""",
    )

    # ---- windows / ordering (SURVEY §2.6) ----
    def last_writer_wins(spark, sf_dir):
        from pyspark.sql.window import Window

        ev = _events(spark, sf_dir)
        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", "event_type", F.col("event_id").alias("last_event_id"))
        )

    R["last_writer_wins"] = (
        last_writer_wins,
        """
SELECT user_id, event_type, event_id AS last_event_id
FROM (SELECT user_id, event_type, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
""",
    )

    R["topk_order_limit"] = (
        lambda spark, sf_dir: _documents(spark, sf_dir)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(15)
        .select("doc_id", "n_chars"),
        "SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id ASC LIMIT 15",
    )

    def sessionize(spark, sf_dir):
        from pyspark.sql.window import Window

        ev = _events(spark, sf_dir)
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        t = F.unix_timestamp(F.col("ts"))  # NTZ interpreted in session tz (UTC)
        gap = t - F.lag(t).over(w)
        return (
            ev.withColumn("brk", F.when(gap.isNull() | (gap > 600), 1).otherwise(0))
            .groupBy("user_id")
            .agg(F.sum("brk").alias("n_sessions"), F.count(F.lit(1)).alias("n_events"))
        )

    R["sessionize"] = (
        sessionize,
        """
WITH e AS (SELECT user_id, epoch(ts)::BIGINT AS t,
                  lag(epoch(ts)::BIGINT) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           FROM events)
SELECT user_id,
       sum(CASE WHEN prev IS NULL OR t - prev > 600 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
       count(*)::BIGINT AS n_events
FROM e GROUP BY user_id
""",
    )

    # ---- scalar functions (SURVEY §2.9) ----
    def sanitize_hash(spark, sf_dir):
        d = _documents(spark, sf_dir)
        norm = F.trim(
            F.regexp_replace(
                F.regexp_replace(F.lower(F.col("text")), "\x00", ""), r"\s+", " "
            )
        )
        return d.select("doc_id", F.sha2(norm, 256).alias("text_sha"))

    R["sanitize_hash"] = (
        sanitize_hash,
        """
SELECT doc_id,
       sha256(trim(regexp_replace(regexp_replace(lower(text), chr(0), '', 'g'),
                                  '\\s+', ' ', 'g'))) AS text_sha
FROM documents
""",
    )

    def timestamp_format(spark, sf_dir):
        ev = _events(spark, sf_dir)
        return (
            ev.select(F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
            .groupBy("hour")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    R["timestamp_format"] = (
        timestamp_format,
        "SELECT strftime(ts, '%Y-%m-%d %H') AS hour, count(*)::BIGINT AS n FROM events GROUP BY 1",
    )

    def json_extract(spark, sf_dir):
        ev = _events(spark, sf_dir)
        return (
            ev.select(
                (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket")
            )
            .groupBy("k_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    R["json_extract"] = (
        json_extract,
        """
SELECT (json_extract_string(props, '$.k')::INT % 10) AS k_bucket, count(*)::BIGINT AS n
FROM events GROUP BY 1
""",
    )

    def array_norms(spark, sf_dir):
        e = _embeddings(spark, sf_dir)
        dot = F.aggregate(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return e.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.sqrt(dot), 4).alias("l2_norm"),
        )

    R["array_norms"] = (
        array_norms,
        """
SELECT vec_id, len(embedding)::INT AS dim,
       round(sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE))), 4) AS l2_norm
FROM embeddings
""",
    )

    # ---- dedup family ----
    R["dedup_exact"] = (
        lambda spark, sf_dir: dedup.exact_duplicates(
            _documents(spark, sf_dir), prefix=40
        ),
        """
SELECT md5(substr(lower(text), 1, 40)) AS fingerprint, count(*)::BIGINT AS n_docs,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1 HAVING count(*) > 1
""",
    )

    R["dedup_minhash_lsh"] = (
        lambda spark, sf_dir: dedup.minhash_lsh_pairs(_documents(spark, sf_dir)),
        f"""
WITH raw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         ELSE list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]))
    END) AS term
  FROM raw
),
params AS (SELECT i, (2 * i + 3)::BIGINT AS a, (101 * i + 17)::BIGINT AS b
           FROM range(0, 16) t(i)),
mh AS (
  SELECT doc_id, i, min((a * {_sql_hash32('term')} + b) % 2147483647) AS minhash
  FROM sh CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, (i // 8)::INT AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY i)) AS band_sig
  FROM mh GROUP BY doc_id, (i // 8)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
""",
    )

    R["dedup_simhash"] = (
        lambda spark, sf_dir: dedup.simhash(_documents(spark, sf_dir)),
        f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {_sql_hash60('term')} AS h
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents) GROUP BY doc_id, term
),
bits AS (SELECT b, (1::BIGINT << b) AS p2 FROM range(0, 32) t(b)),
votes AS (
  SELECT doc_id, b, p2, sum(tf * (2 * ((h // p2) % 2) - 1)) AS v
  FROM tf CROSS JOIN bits GROUP BY doc_id, b, p2
)
SELECT doc_id, sum(CASE WHEN v > 0 THEN p2 ELSE 0 END)::BIGINT AS simhash
FROM votes GROUP BY doc_id
""",
    )

    # exact Jaccard as a VERIFIER over MinHash-LSH candidate pairs (never a
    # blocked all-pairs self-join — the scale-safe shape)
    _LSH_PAIRS_CTES = f"""
raw AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
sh AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         ELSE list_distinct(list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1]))
    END) AS term
  FROM raw
),
params AS (SELECT i, (2 * i + 3)::BIGINT AS a, (101 * i + 17)::BIGINT AS b
           FROM range(0, 16) t(i)),
mh AS (
  SELECT doc_id, i, min((a * {_sql_hash32('term')} + b) % 2147483647) AS minhash
  FROM sh CROSS JOIN params GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, (i // 8)::INT AS band,
         md5(string_agg(minhash::VARCHAR, ',' ORDER BY i)) AS band_sig
  FROM mh GROUP BY doc_id, (i // 8)
),
lsh_pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
)"""

    R["dedup_ngram_jaccard"] = (
        lambda spark, sf_dir: dedup.ngram_jaccard_pairs(_documents(spark, sf_dir)),
        f"""
WITH {_LSH_PAIRS_CTES},
t2 AS (SELECT doc_id, list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
       FROM documents),
sizes AS (SELECT doc_id, len(toks)::BIGINT AS n FROM t2),
ex AS (SELECT doc_id, unnest(toks) AS term FROM t2),
inter AS (
  SELECT doc_a, doc_b, count(*)::BIGINT AS inter
  FROM lsh_pairs
  JOIN ex ta ON ta.doc_id = doc_a
  JOIN ex tb ON tb.doc_id = doc_b AND tb.term = ta.term
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(inter / (sa.n + sb.n - inter), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE round(inter / (sa.n + sb.n - inter), 4) >= 0.2
""",
    )

    # SimHash PAIRING stage: banded candidates + exact Hamming verify
    R["dedup_simhash_pairs"] = (
        lambda spark, sf_dir: dedup.simhash_pairs(_documents(spark, sf_dir)),
        f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {_sql_hash60('term')} AS h
  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        FROM documents) GROUP BY doc_id, term
),
bits AS (SELECT b, (1::BIGINT << b) AS p2 FROM range(0, 32) t(b)),
votes AS (
  SELECT doc_id, b, p2, sum(tf * (2 * ((h // p2) % 2) - 1)) AS v
  FROM tf CROSS JOIN bits GROUP BY doc_id, b, p2
),
sim AS (
  SELECT doc_id, sum(CASE WHEN v > 0 THEN p2 ELSE 0 END)::BIGINT AS simhash
  FROM votes GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash, b,
         (simhash // (1::BIGINT << (b * 8))) % 256 AS band_val
  FROM sim, range(0, 4) bb(b)
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, bit_count(xor(sig_a, sig_b))::INT AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= 3
""",
    )

    # embedding near-dups: sign-LSH candidates + exact cosine verify
    _T, _B = 3, 6

    def _bucket_ctes(num_tables: int, bits: int) -> str:
        return f"""
planes AS (
  SELECT t, p, d,
         (2 * (('0x' || substr(md5(t::VARCHAR || '_' || p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT % 2) - 1)::DOUBLE AS w
  FROM range(0, {num_tables}) tt(t), range(0, {bits}) pp(p), range(0, 64) dd(d)
),
vecel AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS d, unnest(embedding)::DOUBLE AS x
  FROM embeddings
),
dots AS (
  SELECT v.vec_id, pl.t, pl.p, sum(v.x * pl.w) AS dot
  FROM vecel v JOIN planes pl USING (d) GROUP BY 1, 2, 3
),
buckets AS (
  SELECT vec_id, t, sum(CASE WHEN dot > 0 THEN (1::BIGINT << p) ELSE 0 END) AS bucket
  FROM dots GROUP BY vec_id, t
)"""

    _COS = (
        "round(list_sum(list_transform(list_zip(ea.embedding, eb.embedding), "
        "z -> z[1]::DOUBLE * z[2]::DOUBLE)) "
        "/ (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE))) "
        "* sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE)))), 4)"
    )

    R["dedup_embedding_cosine"] = (
        lambda spark, sf_dir: dedup.embedding_near_dup_pairs(
            _embeddings(spark, sf_dir), threshold=0.3, num_tables=_T, bits=_B
        ),
        f"""
WITH {_bucket_ctes(_T, _B)},
cand AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, {_COS} AS cos
FROM cand JOIN embeddings ea ON ea.vec_id = id_a JOIN embeddings eb ON eb.vec_id = id_b
WHERE {_COS} >= 0.3
""",
    )

    # ---- similarity search ----
    def ann_bruteforce(spark, sf_dir):
        qv = _query_vec(spark, sf_dir)
        return ann.cosine_topk(_embeddings(spark, sf_dir), qv, k=10, exclude_id=0)

    R["ann_bruteforce_topk"] = (
        ann_bruteforce,
        """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(list_sum(list_transform(list_zip(embedding, q.qv), z -> z[1]::DOUBLE * z[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cos
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
)
SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
""",
    )

    _ANN_T, _ANN_B = 4, 6

    def ann_index(spark, sf_dir) -> str:
        key = "ann:" + os.path.abspath(sf_dir)
        idx = _INDEX_CACHE.get(key)
        if idx and os.path.exists(os.path.join(idx, "_ann_meta.json")):
            return idx
        idx = tempfile.mkdtemp(prefix="pgspark_ann_index_")
        ann.index_embeddings(
            _embeddings(spark, sf_dir), idx, num_tables=_ANN_T, bits=_ANN_B
        )
        _INDEX_CACHE[key] = idx
        return idx

    def ann_lsh(spark, sf_dir):
        qv = _query_vec(spark, sf_dir)
        idx = ann_index(spark, sf_dir)
        return ann.lsh_topk(spark, idx, qv, k=10, multiprobe=True, exclude_id=0)

    R["ann_lsh_topk"] = (
        ann_lsh,
        f"""
WITH {_bucket_ctes(_ANN_T, _ANN_B)},
qb AS (SELECT t, bucket FROM buckets WHERE vec_id = 0),
probes AS (
  SELECT t, bucket FROM qb
  UNION
  SELECT qb.t, xor(qb.bucket, (1::BIGINT << i)) AS bucket
  FROM qb, range(0, {_ANN_B}) ii(i)
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cand AS (
  SELECT DISTINCT e.vec_id, e.embedding FROM embeddings e
  JOIN buckets bu ON e.vec_id = bu.vec_id
  JOIN probes pr ON bu.t = pr.t AND bu.bucket = pr.bucket
  WHERE e.vec_id <> 0
),
scored AS (
  SELECT vec_id,
         round(list_sum(list_transform(list_zip(embedding, q.qv), z -> z[1]::DOUBLE * z[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cos
  FROM cand CROSS JOIN q
)
SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
""",
    )

    # ---- hybrid BM25 + vector top-k (knn_vector fields live in the SAME
    # document as text fields, search_pg_mapper.go:166-176,256-269): RRF
    # fusion of each side's top-C, ranks on rounded scores (deterministic) ----
    _HY_C = 50

    def hybrid(spark, sf_dir):
        from . import hybrid as hy

        idx = docs_index(spark, sf_dir)
        qv = _query_vec(spark, sf_dir)
        return hy.hybrid_topk(
            spark, idx, _embeddings(spark, sf_dir), BM25_HEAD_TERMS, qv,
            k=10, candidates=_HY_C, method="rrf", exclude_id=0,
        )

    _hy_tlist = ", ".join(f"'{t}'" for t in sorted(set(BM25_HEAD_TERMS)))
    R["hybrid_topk"] = (
        hybrid,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_hy_tlist})
),
t_scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id),
t_cand AS (SELECT doc_id, score FROM t_scored ORDER BY score DESC, doc_id ASC LIMIT {_HY_C}),
t_rank AS (SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id ASC) AS r_t FROM t_cand),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
v_scored AS (
  SELECT vec_id AS doc_id,
         round(list_sum(list_transform(list_zip(embedding, q.qv), z -> z[1]::DOUBLE * z[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cos
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0
),
v_cand AS (SELECT doc_id, cos FROM v_scored ORDER BY cos DESC, doc_id ASC LIMIT {_HY_C}),
v_rank AS (SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r_v FROM v_cand),
fused AS (
  SELECT coalesce(t.doc_id, v.doc_id) AS doc_id,
         coalesce(1.0 / (60 + r_t), 0.0) + coalesce(1.0 / (60 + r_v), 0.0) AS f
  FROM t_rank t FULL OUTER JOIN v_rank v ON t.doc_id = v.doc_id
)
SELECT doc_id, round(f, 6) AS score FROM fused ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- text analysis ----
    _stop_sql = lambda ws: ", ".join(f"'{w}'" for w in ws)  # noqa: E731

    R["textops_langid"] = (
        lambda spark, sf_dir: textops.lang_id(_documents(spark, sf_dir)),
        f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
s AS (
  SELECT doc_id,
         len(list_filter(toks, x -> list_contains([{_stop_sql(textops.STOPWORDS['en'])}], x)))::BIGINT AS s_en,
         len(list_filter(toks, x -> list_contains([{_stop_sql(textops.STOPWORDS['de'])}], x)))::BIGINT AS s_de,
         len(list_filter(toks, x -> list_contains([{_stop_sql(textops.STOPWORDS['fr'])}], x)))::BIGINT AS s_fr,
         len(list_filter(toks, x -> list_contains([{_stop_sql(textops.STOPWORDS['es'])}], x)))::BIGINT AS s_es
  FROM t
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            ELSE 'es' END AS lang_guess
FROM s
""",
    )

    _all_stop = sorted({w for ws in textops.STOPWORDS.values() for w in ws})
    R["textops_quality"] = (
        lambda spark, sf_dir: textops.quality_score(_documents(spark, sf_dir)),
        f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         len(list_distinct(toks))::BIGINT AS n_uniq,
         len(list_filter(toks, x -> list_contains([{_stop_sql(_all_stop)}], x)))::BIGINT AS n_stop,
         list_sum(list_transform(toks, x -> length(x)::DOUBLE)) AS len_sum
  FROM t
)
SELECT doc_id, n_tokens::INT AS n_tokens,
       floor(n_uniq / greatest(n_tokens, 1) * 10000 + 0.5) / 10000 AS uniq_ratio,
       floor(n_stop / greatest(n_tokens, 1) * 10000 + 0.5) / 10000 AS stopword_ratio,
       floor(len_sum / greatest(n_tokens, 1) * 10000 + 0.5) / 10000 AS mean_token_len,
       floor((0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * (n_uniq / greatest(n_tokens, 1))
             + 0.3 * least(4.0 * n_stop / greatest(n_tokens, 1), 1.0)) * 10000 + 0.5) / 10000 AS quality
FROM m
""",
    )

    R["textops_token_counts"] = (
        lambda spark, sf_dir: textops.token_counts_by(_documents(spark, sf_dir)),
        """
SELECT source AS grp, count(*)::BIGINT AS n_docs,
       sum(len(regexp_split_to_array(trim(text), '\\s+')))::BIGINT AS ws_tokens,
       sum(len(regexp_extract_all(lower(text), '[a-z0-9]+')))::BIGINT AS re_tokens
FROM documents GROUP BY source
""",
    )

    R["textops_fingerprint"] = (
        lambda spark, sf_dir: textops.fingerprint(_documents(spark, sf_dir)),
        f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
              ELSE list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i+1])
         END AS grams
  FROM t
),
s AS (
  SELECT doc_id, len(grams)::INT AS n_grams,
         list_sort(list_distinct(list_filter(
             list_transform(grams, x -> {_sql_hash60('x')}), h -> h % 8 = 0))) AS sel
  FROM g
)
SELECT doc_id, n_grams, len(sel)::INT AS n_selected,
       md5(coalesce(list_aggregate(list_transform(sel, h -> h::VARCHAR), 'string_agg', ','), '')) AS fp
FROM s
""",
    )

    # ---- multimodal plumbing ----
    def multimodal_meta(spark, sf_dir):
        media = multimodal.attach_payload(_documents(spark, sf_dir))
        return multimodal.media_stats(media)

    R["multimodal_meta"] = (
        multimodal_meta,
        """
WITH m AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         strlen(text)::BIGINT AS n_bytes
  FROM documents
)
SELECT media_type, count(*)::BIGINT AS n_items, sum(n_bytes)::BIGINT AS total_bytes,
       min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
FROM m GROUP BY media_type
""",
    )

    def multimodal_frames(spark, sf_dir):
        """Strided frame sampling over opaque payloads (video frame-sample
        plumbing): pure JVM sequence+explode+binary substr, map-only; the
        payload is the UTF-8 text bytes so the DuckDB oracle windows the
        VARCHAR (ASCII corpus -> byte-identical windows + md5)."""
        media = multimodal.attach_payload(_documents(spark, sf_dir))
        return multimodal.sample_frames(media, frame_size=64, stride=128, max_frames=16)

    R["multimodal_frames"] = (
        multimodal_frames,
        """
WITH m AS (SELECT doc_id, text, strlen(text)::BIGINT AS nb FROM documents),
f AS (
  SELECT doc_id,
         unnest(range(0, greatest(least(16, ceil(nb/128.0)::BIGINT), 1)))::INT AS frame_idx,
         text
  FROM m
)
SELECT doc_id, frame_idx,
       strlen(substring(text, (frame_idx*128+1)::BIGINT, 64))::BIGINT AS frame_bytes,
       md5(substring(text, (frame_idx*128+1)::BIGINT, 64)) AS frame_md5
FROM f
""",
    )

    # Arrow plumbing over binary payloads; the deterministic fake kernel's
    # integer-exact features are fully SQL-expressible (real decode stays a
    # documented stub — multimodal.decode_image).
    def multimodal_features(spark, sf_dir):
        media = multimodal.attach_payload(_documents(spark, sf_dir))
        return multimodal.extract_feature_columns(media)

    R["multimodal_features"] = (
        multimodal_features,
        """
WITH c AS (
  SELECT doc_id,
         CASE (doc_id % 3) WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
              ELSE 'video/mp4' END AS media_type,
         text, strlen(text)::BIGINT AS n
  FROM documents
),
v AS (
  SELECT doc_id, ord(substr(text, i::INT, 1))::BIGINT AS x
  FROM c, unnest(range(1, n + 1)) t(i)
),
agg AS (
  SELECT doc_id, sum(x) AS s, min(x) AS mn, max(x) AS mx,
         sum(CASE WHEN x > 96 THEN 1 ELSE 0 END) AS ngt
  FROM v GROUP BY doc_id
)
SELECT c.doc_id, c.media_type,
       coalesce(agg.s % 65521, 0)::BIGINT AS f0,
       CASE WHEN c.n = 0 THEN 0 ELSE c.n % 251 END::BIGINT AS f1,
       coalesce(ord(substr(c.text, 1, 1)), 0)::BIGINT AS f2,
       coalesce(ord(substr(c.text, c.n::INT, 1)), 0)::BIGINT AS f3,
       coalesce(agg.mn, 0)::BIGINT AS f4,
       coalesce(agg.mx, 0)::BIGINT AS f5,
       coalesce(agg.ngt, 0)::BIGINT AS f6,
       coalesce(agg.s // c.n, 0)::BIGINT AS f7
FROM c LEFT JOIN agg USING (doc_id)
""",
    )

    # ---- field collapse (the ES `collapse` parameter: one best doc per
    # group, groups ranked by their best doc's score) — collapse key is
    # the documents `source` column (site-feed analog) ----
    def bm25_collapse(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        key_df = _documents(spark, sf_dir).select(
            "doc_id", F.col("source").alias("key")
        )
        res = query.search_collapse(spark, idx, BM25_HEAD_TERMS, key_df, 10)
        return res.select(
            "doc_id", "key", F.round("score", 4).alias("score")
        )

    _collapse_tlist = ", ".join(f"'{t}'" for t in sorted(set(BM25_HEAD_TERMS)))
    R["bm25_collapse"] = (
        bm25_collapse,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_collapse_tlist})
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id),
best AS (
  SELECT s.doc_id, d.source AS key, s.score,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY s.score DESC, s.doc_id ASC) AS rn
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, key, round(score, 4) AS score
FROM best WHERE rn = 1
ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- function_score field_value_factor (boost_mode: multiply):
    # final = bm25 * ln(1 + n_chars/100) — a per-doc factor reorders, so
    # the engine scores ALL matches before the global top-k ----
    def bm25_function_score(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        factor_df = _documents(spark, sf_dir).select(
            "doc_id",
            F.log1p(F.col("n_chars").cast("double") / 100.0).alias("factor"),
        )
        res = query.search_function_score(
            spark, idx, BM25_HEAD_TERMS, factor_df, 10
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_function_score"] = (
        bm25_function_score,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_collapse_tlist})
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id)
SELECT s.doc_id,
       round(s.score * ln(1.0 + d.n_chars::DOUBLE / 100.0), 4) AS score
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.score * ln(1.0 + d.n_chars::DOUBLE / 100.0) DESC, s.doc_id ASC
LIMIT 10
""",
    )

    # ---- two-stage rescore (ES rescore API): BM25 top-50 window, then
    # + 2.0 x phrase score for window docs containing the exact phrase ----
    RESCORE_W, RESCORE_WEIGHT = 50, 2.0

    def bm25_rescore(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_rescore(
            spark, idx, BM25_HEAD_TERMS, PHRASE, 10,
            window=RESCORE_W, weight=RESCORE_WEIGHT,
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _ph_tlist = ", ".join(f"'{t}'" for t in sorted(set(PHRASE)))
    R["bm25_rescore"] = (
        bm25_rescore,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
w AS (SELECT ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5)) AS idf,
             df.term, st.avgdl
      FROM df CROSS JOIN st),
contrib AS (
  SELECT tf.doc_id, tf.term,
         w.idf * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / w.avgdl)) AS c
  FROM tf JOIN w USING (term) JOIN dl USING (doc_id)
),
base AS (
  SELECT doc_id, sum(c) AS score FROM contrib
  WHERE term IN ({_collapse_tlist}) GROUP BY doc_id
  ORDER BY score DESC, doc_id ASC LIMIT {RESCORE_W}
),
phmatch AS (
  SELECT doc_id FROM
  (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
   FROM documents)
  WHERE len(toks) >= 2 AND list_contains(
    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
    '{' '.join(PHRASE)}')
),
ph AS (
  SELECT c.doc_id, sum(c.c) AS pscore FROM contrib c
  JOIN phmatch USING (doc_id)
  WHERE c.term IN ({_ph_tlist}) GROUP BY c.doc_id
)
SELECT b.doc_id,
       round(b.score + {RESCORE_WEIGHT} * coalesce(ph.pscore, 0.0), 4) AS score
FROM base b LEFT JOIN ph USING (doc_id)
ORDER BY b.score + {RESCORE_WEIGHT} * coalesce(ph.pscore, 0.0) DESC,
         b.doc_id ASC
LIMIT 10
""",
    )

    # ---- _count API (hit count, no scoring) ----
    def bm25_match_count(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        return query.search_count(spark, idx, BM25_HEAD_TERMS)

    R["bm25_match_count"] = (
        bm25_match_count,
        f"SELECT count(DISTINCT doc_id)::BIGINT AS n_hits FROM ("
        f"SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term "
        f"FROM documents) WHERE term IN ({_collapse_tlist})",
    )

    # ---- _termvectors API (on-the-fly: re-analyze + lexicon df) ----
    def bm25_term_vectors(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        docs = _documents(spark, sf_dir)
        target = docs.agg(F.min("doc_id")).collect()[0][0]
        return query.term_vectors(spark, idx, docs, int(target))

    R["bm25_term_vectors"] = (
        bm25_term_vectors,
        f"""
WITH {TOK_CTE},
target AS (SELECT min(doc_id) AS d FROM documents),
tv AS (SELECT term, count(*)::BIGINT AS tf FROM tok, target
       WHERE doc_id = target.d GROUP BY 1),
dfx AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM tok GROUP BY 1)
SELECT term, tf, df FROM tv JOIN dfx USING (term) ORDER BY term ASC
""",
    )

    # ---- percolate (reverse search: stored conjunctive queries matched
    # against the document stream) ----
    PERC_QUERIES = [(1, "data"), (1, "fast"), (2, "query"),
                    (3, "vector"), (3, "stream")]

    def percolate_entry(spark, sf_dir):
        docs = _documents(spark, sf_dir)
        qdf = spark.createDataFrame(
            PERC_QUERIES, "query_id int, term string"
        )
        return query.percolate(spark, docs, qdf).orderBy(
            "doc_id", "query_id"
        )

    _perc_values = ", ".join(f"({q}, '{t}')" for q, t in PERC_QUERIES)
    R["percolate_match"] = (
        percolate_entry,
        f"""
WITH {TOK_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM tok),
q(query_id, term) AS (VALUES {_perc_values}),
need AS (SELECT query_id, count(*)::BIGINT AS n FROM q GROUP BY 1),
got AS (SELECT doc_id, query_id, count(*)::BIGINT AS g
        FROM dt JOIN q USING (term) GROUP BY 1, 2)
SELECT doc_id, query_id FROM got JOIN need USING (query_id)
WHERE g = n ORDER BY doc_id ASC, query_id ASC
""",
    )

    # ---- bool query DSL compiler (the OpenSearch JSON DSL shape the
    # reference's search store forwards, compiled onto engine
    # primitives): must + should (term & phrase clauses) + must_not +
    # filter in one tree ----
    BOOL_DSL = {"bool": {
        "must": [{"match": {"terms": ["data", "query"]}}],
        "should": [{"term": "fast"}, {"phrase": {"terms": PHRASE}}],
        "must_not": [{"term": "slow"}],
        "filter": [{"match": {"terms": ["merge", "stream"]}}],
    }}

    def bm25_bool_dsl(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.execute_dsl(spark, idx, BOOL_DSL, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _dsl_all = ", ".join(
        f"'{t}'" for t in sorted({"data", "query", "fast", *PHRASE})
    )
    R["bm25_bool_dsl"] = (
        bm25_bool_dsl,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_dsl_all})
),
must1 AS (SELECT doc_id, sum(c) AS s FROM contrib
          WHERE term IN ('data', 'query') GROUP BY 1),
sh1 AS (SELECT doc_id, 0 AS cl, sum(c) AS s FROM contrib
        WHERE term = 'fast' GROUP BY 1),
phmatch AS (
  SELECT doc_id FROM
  (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
   FROM documents)
  WHERE len(toks) >= 2 AND list_contains(
    list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]),
    '{' '.join(PHRASE)}')
),
sh2 AS (SELECT c.doc_id, 1 AS cl, sum(c.c) AS s FROM contrib c
        JOIN phmatch USING (doc_id)
        WHERE c.term IN ({', '.join(f"'{t}'" for t in sorted(set(PHRASE)))})
        GROUP BY 1),
shagg AS (SELECT doc_id, sum(s) AS s
          FROM (SELECT * FROM sh1 UNION ALL SELECT * FROM sh2) GROUP BY 1),
flt AS (SELECT DISTINCT doc_id FROM tok WHERE term IN ('merge', 'stream')),
ex AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'slow')
SELECT m.doc_id, round(m.s + coalesce(sh.s, 0.0), 4) AS score
FROM must1 m
LEFT JOIN shagg sh USING (doc_id)
JOIN flt USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM ex)
ORDER BY m.s + coalesce(sh.s, 0.0) DESC, m.doc_id ASC
LIMIT 10
""",
    )

    # ---- nested bool: a bool(must) clause INSIDE a should list with
    # minimum_should_match — exercises the compiler's recursion and the
    # msm-as-constraint path ----
    NESTED_DSL = {"bool": {
        "should": [
            {"term": "fast"},
            {"bool": {"must": [{"term": "table"}, {"term": "hash"}]}},
        ],
        "minimum_should_match": 1,
    }}

    def bm25_dsl_nested(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.execute_dsl(spark, idx, NESTED_DSL, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_dsl_nested"] = (
        bm25_dsl_nested,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ('fast', 'hash', 'table')
),
sh1 AS (SELECT doc_id, 0 AS cl, sum(c) AS s FROM contrib
        WHERE term = 'fast' GROUP BY 1),
sh2 AS (
  SELECT doc_id, 1 AS cl, sum(c) AS s FROM contrib
  WHERE term IN ('table', 'hash') GROUP BY 1
  HAVING count(DISTINCT term) = 2
),
shagg AS (SELECT doc_id, sum(s) AS s, count(DISTINCT cl) AS nm
          FROM (SELECT * FROM sh1 UNION ALL SELECT * FROM sh2) GROUP BY 1)
SELECT doc_id, round(s, 4) AS score FROM shagg
WHERE nm >= 1
ORDER BY s DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- dis_max + constant_score + per-clause boost (the remaining
    # Lucene compound-query wrappers ES exposes): score = max(clause
    # scores) + tie_breaker * (sum of the other matched clauses) ----
    DISMAX_DSL = {"dis_max": {
        "queries": [
            {"term": {"value": "fast", "boost": 2.0}},
            {"match": {"terms": ["table", "hash"]}},
            {"constant_score": {"filter": {"term": "merge"}, "boost": 0.5}},
        ],
        "tie_breaker": 0.3,
    }}

    def bm25_dsl_dismax(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.execute_dsl(spark, idx, DISMAX_DSL, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_dsl_dismax"] = (
        bm25_dsl_dismax,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ('fast', 'hash', 'table')
),
c1 AS (SELECT doc_id, 2.0 * sum(c) AS s FROM contrib
       WHERE term = 'fast' GROUP BY 1),
c2 AS (SELECT doc_id, sum(c) AS s FROM contrib
       WHERE term IN ('table', 'hash') GROUP BY 1),
c3 AS (SELECT DISTINCT doc_id, 0.5 AS s FROM tok WHERE term = 'merge'),
agg AS (SELECT doc_id, max(s) AS mx, sum(s) AS sm
        FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2
              UNION ALL SELECT * FROM c3) GROUP BY 1)
SELECT doc_id, round(mx + 0.3 * (sm - mx), 4) AS score FROM agg
ORDER BY mx + 0.3 * (sm - mx) DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- match_phrase_prefix ("search-as-you-type"): exact word(s)
    # followed immediately by any lexicon term with the given prefix;
    # matched docs BM25-scored over every distinct matched term (exact +
    # expansions), query.search_phrase_prefix ----
    PP_PHRASE = ["table", "s"]  # 's' expands to 6 corpus terms at sf0.01
    PP_EXP = ["scan", "slow", "small", "sort", "spark", "stream"]

    def bm25_phrase_prefix(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_phrase_prefix(spark, idx, PP_PHRASE, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _pp_all = ", ".join(f"'{t}'" for t in sorted(set(PP_EXP) | {"table"}))
    R["bm25_phrase_prefix"] = (
        bm25_phrase_prefix,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_pp_all})
),
pp AS (
  SELECT doc_id FROM
  (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
   FROM documents)
  WHERE len(toks) >= 2 AND len(list_filter(range(1, len(toks)),
        i -> toks[i] = 'table' AND starts_with(toks[i+1], 's'))) > 0
)
SELECT c.doc_id, round(sum(c.c), 4) AS score
FROM contrib c JOIN pp USING (doc_id)
GROUP BY 1 ORDER BY sum(c.c) DESC, c.doc_id ASC LIMIT 10
""",
    )

    # ---- boosting query (soft must_not): positive matches score
    # normally, docs also matching the negative clause are multiplied by
    # negative_boost — they demote but never disappear ----
    BOOSTING_DSL = {"boosting": {
        "positive": {"match": {"terms": ["data", "query"]}},
        "negative": {"term": "slow"},
        "negative_boost": 0.2,
    }}

    def bm25_dsl_boosting(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.execute_dsl(spark, idx, BOOSTING_DSL, 10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_dsl_boosting"] = (
        bm25_dsl_boosting,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ('data', 'query')
),
pos AS (SELECT doc_id, sum(c) AS s FROM contrib GROUP BY 1),
neg AS (SELECT DISTINCT doc_id FROM tok WHERE term = 'slow')
SELECT p.doc_id,
       round(p.s * CASE WHEN n.doc_id IS NULL THEN 1.0 ELSE 0.2 END, 4) AS score
FROM pos p LEFT JOIN neg n USING (doc_id)
ORDER BY p.s * CASE WHEN n.doc_id IS NULL THEN 1.0 ELSE 0.2 END DESC,
         p.doc_id ASC LIMIT 10
""",
    )

    # ---- sort-by-field (the ES ``sort`` parameter): match-set hits
    # ordered by a doc FIELD, no scoring work at all ----
    def bm25_sort_by_field(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        return query.search_sort(
            spark, idx, FACET_TERMS, meta, "n_chars", k=10, ascending=False
        )

    R["bm25_sort_by_field"] = (
        bm25_sort_by_field,
        f"""
WITH {TOK_CTE},
{_m_cte}
SELECT doc_id, n_chars FROM documents JOIN m USING (doc_id)
ORDER BY n_chars DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- range aggregation: explicit [from, to) buckets, overlap legal,
    # empty buckets kept — one conditional-count aggregate, no join ----
    _RANGES = [
        ("a_short", None, 200.0),
        ("b_mid", 200.0, 500.0),
        ("c_long", 500.0, None),
        ("d_all", None, None),
    ]

    def agg_range(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        return query.search_agg_range(
            spark, idx, FACET_TERMS, meta, "n_chars", _RANGES
        )

    R["search_agg_range"] = (
        agg_range,
        f"""
WITH {TOK_CTE},
{_m_cte},
j AS (SELECT n_chars FROM documents JOIN m USING (doc_id))
SELECT 'a_short' AS key, count(*) FILTER (n_chars < 200.0)::BIGINT AS doc_count FROM j
UNION ALL
SELECT 'b_mid', count(*) FILTER (n_chars >= 200.0 AND n_chars < 500.0)::BIGINT FROM j
UNION ALL
SELECT 'c_long', count(*) FILTER (n_chars >= 500.0)::BIGINT FROM j
UNION ALL
SELECT 'd_all', count(*)::BIGINT FROM j
ORDER BY key ASC
""",
    )

    # ---- cardinality aggregation (ES runs HLL++; the engine exposes the
    # same sketch via approx_count_distinct — exact here so DuckDB can
    # hash-match) ----
    def agg_cardinality(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "source")
        return query.search_agg_cardinality(
            spark, idx, FACET_TERMS, meta, "source", exact=True
        )

    R["search_agg_cardinality"] = (
        agg_cardinality,
        f"""
WITH {TOK_CTE},
{_m_cte}
SELECT count(DISTINCT source)::BIGINT AS cardinality
FROM documents JOIN m USING (doc_id)
""",
    )

    # ---- percentiles aggregation: exact linear-interpolation quantiles
    # (Spark ``percentile`` == DuckDB ``quantile_cont``; the 100-TB swap
    # is percentile_approx, the TDigest-family sketch ES itself uses) ----
    def agg_percentiles(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        res = query.search_agg_percentiles(
            spark, idx, FACET_TERMS, meta, "n_chars", (0.25, 0.5, 0.75)
        )
        return res.select(
            F.round("pct", 4).alias("pct"), F.round("value", 4).alias("value")
        )

    R["search_agg_percentiles"] = (
        agg_percentiles,
        f"""
WITH {TOK_CTE},
{_m_cte},
q AS (SELECT quantile_cont(n_chars, [0.25, 0.5, 0.75]) AS v
      FROM documents JOIN m USING (doc_id))
SELECT * FROM (
  SELECT round(unnest([0.25, 0.5, 0.75]), 4) AS pct,
         round(unnest(v), 4) AS value FROM q
) ORDER BY pct ASC
""",
    )

    # ---- top_hits sub-aggregation: the n best-scoring hits within each
    # bucket of a terms agg (score every match, one window per bucket) ----
    def agg_top_hits(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "lang")
        res = query.search_agg_top_hits(
            spark, idx, FACET_TERMS, meta, "lang", n=3
        )
        return res.select(
            "bucket", "rank", "doc_id", F.round("score", 4).alias("score")
        )

    _fc_tlist = ", ".join(f"'{t}'" for t in sorted(set(FACET_TERMS)))
    R["search_agg_top_hits"] = (
        agg_top_hits,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_fc_tlist})
),
scored AS (SELECT doc_id, sum(c) AS score FROM contrib GROUP BY doc_id),
ranked AS (
  SELECT d.lang AS bucket,
         row_number() OVER (PARTITION BY d.lang
                            ORDER BY s.score DESC, s.doc_id ASC) AS rank,
         s.doc_id, round(s.score, 4) AS score
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT bucket, rank::INT AS rank, doc_id, score FROM ranked
WHERE rank <= 3 ORDER BY bucket ASC, rank ASC
""",
    )

    # ---- function_score gauss decay on a numeric field (boost_mode
    # multiply): factor = decay at origin +- scale, 1.0 at origin ----
    _DK_ORIGIN, _DK_SCALE, _DK_DECAY = 300.0, 200.0, 0.5
    import math as _math

    _dk_two_sigma2 = repr(
        2.0 * (-(_DK_SCALE ** 2) / (2.0 * _math.log(_DK_DECAY)))
    )

    def bm25_decay(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        meta = _documents(spark, sf_dir).select("doc_id", "n_chars")
        res = query.search_decay(
            spark, idx, FACET_TERMS, meta, "n_chars",
            origin=_DK_ORIGIN, scale=_DK_SCALE, decay=_DK_DECAY, k=10,
            fn="gauss",
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_decay"] = (
        bm25_decay,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_fc_tlist})
),
scored AS (SELECT doc_id, sum(c) AS s FROM contrib GROUP BY doc_id),
decayed AS (
  SELECT s.doc_id,
         s.s * exp(-pow(greatest(0.0, abs(d.n_chars - {_DK_ORIGIN!r})), 2)
                   / {_dk_two_sigma2}) AS score
  FROM scored s JOIN documents d USING (doc_id)
)
SELECT doc_id, round(score, 4) AS score
FROM decayed ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- multi_match type=best_fields (the ES default): dis_max across
    # fields with a tie_breaker, vs search_multifield's most_fields SUM ----
    _TIE = 0.3

    def bm25_multifield_bestfields(spark, sf_dir):
        fields = multifield_indexes(spark, sf_dir)
        res = query.search_multifield_bestfields(
            spark, fields, MF_TERMS, 10, boosts=MF_BOOSTS, tie_breaker=_TIE
        )
        return res.select("doc_id", F.round("score", 4).alias("score"))

    R["bm25_multifield_bestfields"] = (
        bm25_multifield_bestfields,
        f"""
WITH n AS (SELECT count(*)::BIGINT AS n FROM documents),
body_tok AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term FROM documents),
title_tok AS (SELECT doc_id, unnest((regexp_extract_all(lower(text), '[a-z0-9]+'))[1:8]) AS term FROM documents),
b_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM body_tok GROUP BY 1, 2),
b_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM body_tok GROUP BY 1),
b_st AS (SELECT (SELECT sum(dl) FROM b_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
b_df AS (SELECT term, count(*)::BIGINT AS df FROM b_tf GROUP BY 1),
t_tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM title_tok GROUP BY 1, 2),
t_dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM title_tok GROUP BY 1),
t_st AS (SELECT (SELECT sum(dl) FROM t_dl)::DOUBLE / (SELECT n FROM n) AS avgdl),
t_df AS (SELECT term, count(*)::BIGINT AS df FROM t_tf GROUP BY 1),
b_scored AS (
  SELECT tf.doc_id, {MF_BOOSTS['body']} * sum({_mf_idf} * {_mf_w}) AS score
  FROM b_tf tf JOIN b_df df USING (term) JOIN b_dl dl USING (doc_id) CROSS JOIN b_st st
  WHERE tf.term IN ({_mf_tlist}) GROUP BY tf.doc_id
),
t_scored AS (
  SELECT tf.doc_id, {MF_BOOSTS['title']} * sum({_mf_idf} * {_mf_w}) AS score
  FROM t_tf tf JOIN t_df df USING (term) JOIN t_dl dl USING (doc_id) CROSS JOIN t_st st
  WHERE tf.term IN ({_mf_tlist}) GROUP BY tf.doc_id
),
fused AS (
  SELECT doc_id, max(score) + {_TIE!r} * (sum(score) - max(score)) AS score
  FROM (SELECT * FROM b_scored UNION ALL SELECT * FROM t_scored)
  GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM fused ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- query-time synonym expansion: per-position synonym GROUPS,
    # dis_max within a group, sum across groups ----
    _SYN_GROUPS = [["data", "table"], ["fast", "slow"]]

    def bm25_synonyms(spark, sf_dir):
        idx = docs_index(spark, sf_dir)
        res = query.search_synonyms(spark, idx, _SYN_GROUPS, k=10)
        return res.select("doc_id", F.round("score", 4).alias("score"))

    _syn_all = ", ".join(
        f"'{t}'" for t in sorted({t for g in _SYN_GROUPS for t in g})
    )
    _syn_g0 = ", ".join(f"'{t}'" for t in sorted(set(_SYN_GROUPS[0])))
    R["bm25_synonyms"] = (
        bm25_synonyms,
        f"""
WITH {TOK_CTE},
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
st AS (SELECT (SELECT count(*) FROM documents) AS n,
              (SELECT sum(dl) FROM dl)::DOUBLE / (SELECT count(*) FROM documents) AS avgdl),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
contrib AS (
  SELECT tf.doc_id, tf.term,
         ln(1.0 + (st.n - df.df + 0.5) / (df.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / st.avgdl)) AS c
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN st
  WHERE tf.term IN ({_syn_all})
),
g AS (SELECT doc_id,
             CASE WHEN term IN ({_syn_g0}) THEN 0 ELSE 1 END AS grp,
             max(c) AS gscore
      FROM contrib GROUP BY 1, 2),
scored AS (SELECT doc_id, sum(gscore) AS score FROM g GROUP BY doc_id)
SELECT doc_id, round(score, 4) AS score
FROM scored ORDER BY score DESC, doc_id ASC LIMIT 10
""",
    )

    # ---- filtered kNN (the ES knn ``filter`` parameter): metadata
    # pre-filter pushed into the scan, then exact cosine top-k over the
    # surviving vectors ----
    def ann_filtered(spark, sf_dir):
        qv = _query_vec(spark, sf_dir)
        emb = _embeddings(spark, sf_dir).filter(F.col("label") == 3)
        return ann.cosine_topk(emb, qv, k=10, exclude_id=0)

    R["ann_filtered_topk"] = (
        ann_filtered,
        """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
scored AS (
  SELECT vec_id,
         round(list_sum(list_transform(list_zip(embedding, q.qv), z -> z[1]::DOUBLE * z[2]::DOUBLE))
               / (sqrt(list_sum(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)))
                  * sqrt(list_sum(list_transform(q.qv, x -> x::DOUBLE * x::DOUBLE)))), 4) AS cos
  FROM embeddings CROSS JOIN q WHERE vec_id <> 0 AND label = 3
)
SELECT vec_id, cos FROM scored ORDER BY cos DESC, vec_id ASC LIMIT 10
""",
    )

    return R


_REG = None


def registry() -> dict[str, tuple]:
    global _REG
    if _REG is None:
        _REG = _registry()
    return _REG
