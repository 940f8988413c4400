"""pgspark_index — a PySpark-native inverted-index build + BM25 top-k query engine.

Brand-new engine with the capabilities and spirit of xataio/pgstream
(reference surveyed in SURVEY.md): bulk parallel snapshot -> batch index
build, resumable checkpointed work units with lineage, key-based
partitioning with explicit skew handling, deterministic column-value
transformation, and a full-text store with BM25 retrieval — re-expressed
Spark-first over `pyspark.sql` DataFrames and vectorized pandas/Arrow UDFs.

Modules
-------
- ``textnorm``  — deterministic extract/normalize/tokenize (pure stdlib)
- ``codecs``    — delta + varbyte posting-list compression, block-max metadata (numpy)
- ``bm25``      — BM25 scoring math (Lucene-compatible, k1=1.2 b=0.75)
- ``fixtures``  — deterministic synthetic webtext table (seed-fixed)
- ``oracle``    — pure-numpy brute-force BM25 oracle for goldens
- ``extract``   — Spark vectorized extract/tokenize stages
- ``build``     — index build pipeline (hash-stripe ordinals -> spliced segments)
- ``manifest``  — per-unit checkpoint/lineage ledger (resume anti-join)
- ``merge``     — segment merge -> global lexicon + stats
- ``query``     — top-k BM25 with block-max pruning (WAND / MaxScore)
- ``dedup``     — exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding near-dup
- ``ann``       — cosine top-k similarity search (brute-force + partitioned multi-probe LSH)
- ``textops``   — language-ID, quality scoring, token counting, fingerprinting
- ``multimodal``— binary (image/audio/video) column plumbing: stubbed decoders,
                  deterministic feature kernel, strided frame sampling
- ``transformers`` — 24-type deterministic column-transformer catalog + rule map
- ``tablefilter``  — wildcard include/exclude table filtering with precedence
- ``fields``    — typed field mapping, schema evolution (rename -> alias)
- ``sources``   — snapshot-pinned and incremental snapshot-range source adapters
- ``incremental``  — delta builds, tombstones, delete-by-query, compaction
                  (scale-safe joins, ordinal renumbering)
- ``streaming`` — continuous indexing (foreachBatch) + stateful LWW operator
- ``aliases``   — versioned index directories + atomic alias cutover
- ``cli``       — spark-submit entry point (build/delta/compact/merge/search)
"""

__version__ = "0.1.0"
