"""spark-submit entry point: build / delta / compact / merge / search.

The north-rule deployment shape — ``spark-submit --py-files engine.zip
cli.py <cmd> …`` on a multi-executor cluster — with the same subcommand
surface pgstream exposes as ``pgstream snapshot / run`` (CDC tail) plus
the query side its users reach through the search store
(/root/reference/cmd/snapshot.go, cmd/run.go).

Under spark-submit the session comes from the cluster (``--master``,
``--executor-memory`` etc. on the submit line); run standalone (python -m
pgspark_index.cli) it falls back to the tuned local session. Examples:

  spark-submit --py-files engine.zip -m cli build \
      --input /data/webtext --index /idx/web-v1 --units 64 --positions
  spark-submit … delta  --input /data/webtext_2024_31 --index /idx/web-v1 \
      --snapshot 31
  spark-submit … compact --index /idx/web-v1
  spark-submit … search --index /idx/web-v1 --terms data query fast -k 10
  spark-submit … search --index-base /idx --alias web --terms data -k 10
  spark-submit … search --index /idx/web-v1 --prefix que -k 10
  spark-submit … search --index /idx/web-v1 --wildcard 'f?st' -k 10
  spark-submit … build-multifield --input /data/webtext --index /idx/web-mf \
      --fields body=text title=headline --units 64
  spark-submit … delta-multifield --input /data/webtext_2024_31 \
      --index /idx/web-mf --fields body=text title=headline --snapshot 31
  spark-submit … search --index-root /idx/web-mf --terms data query \
      --boosts title=2.0 -k 10
  spark-submit … retry-quarantined --input /data/webtext_fixed \
      --index /idx/web-v1 --snapshot 32
  spark-submit … merge-units --index /idx/web-v1
  spark-submit … status --index /idx/web-v1 --latest-snapshot 33
  spark-submit … search --index /idx/web-v1 --phrase table hash -k 10
  spark-submit … search --index-root /idx/web-mf --phrase table hash \
      --boosts title=2.0 -k 10
  spark-submit … search --index-root /idx/web-mf --prefix qu -k 10
  spark-submit … hybrid --index /idx/web-v1 --embeddings /data/emb \
      --terms data query --vec-id 7 -k 10
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def _spark(app: str) -> SparkSession:
    """Active session if spark-submit provided one, else the local factory."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark(app=app)


def _read_input(spark: SparkSession, path: str, fmt: str):
    return spark.read.format(fmt).load(path)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pgspark_index", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="full (resumable) index build")
    b.add_argument("--input", required=True, help="webtext table path")
    b.add_argument("--format", default="parquet", help="input format (parquet/iceberg)")
    b.add_argument("--index", required=True, help="index output dir")
    b.add_argument("--units", type=int, default=4)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--snapshot", type=int, default=0, help="input snapshot id")
    b.add_argument("--positions", action="store_true", help="store token positions")
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--ignore-unit-errors", action="store_true",
                   help="DATALOSS knob: skip failed units, keep building")

    d = sub.add_parser("delta", help="incremental delta build + tombstones")
    d.add_argument("--input", required=True, help="delta rows (new snapshot only)")
    d.add_argument("--format", default="parquet")
    d.add_argument("--index", required=True)
    d.add_argument("--snapshot", type=int, required=True)
    d.add_argument("--units", type=int, default=1)
    d.add_argument("--partitions", type=int, default=None)

    c = sub.add_parser("compact", help="expunge tombstones, renumber, refresh stats")
    c.add_argument("--index", required=True)

    dq = sub.add_parser(
        "delete-by-query",
        help="tombstone every live doc matching an OpenSearch-style "
             "query DSL tree (searchstore DeleteByQuery analog)",
    )
    dq.add_argument("--index", required=True)
    dq.add_argument("--dsl", required=True,
                    help='JSON query tree, e.g. \'{"term": "spam"}\'')
    dq.add_argument("--snapshot", type=int, default=None)

    mu = sub.add_parser(
        "merge-units",
        help="tiered unit merge: fold committed units into one "
             "(Lucene background segment merge analog)",
    )
    mu.add_argument("--index", required=True)
    mu.add_argument("--units", type=int, nargs="*", default=None,
                    help="units to fold (default: all committed)")
    mu.add_argument("--partitions", type=int, default=None)

    st = sub.add_parser(
        "status",
        help="index health: units, tombstone debt, quarantine, lag "
             "(cmd/status.go analog)",
    )
    st.add_argument("--index", required=True,
                    help="index dir or multi-field root")
    st.add_argument("--latest-snapshot", type=int, default=None,
                    help="latest AVAILABLE input snapshot -> reports lag")

    m = sub.add_parser("merge", help="rebuild lexicon + global stats")
    m.add_argument("--index", required=True)

    mf = sub.add_parser(
        "build-multifield",
        help="single-pass multi-field build (K fields, one scan+shuffle)",
    )
    mf.add_argument("--input", required=True)
    mf.add_argument("--format", default="parquet")
    mf.add_argument("--index", required=True, help="index ROOT (field=<name>/ subdirs)")
    mf.add_argument("--fields", nargs="+", required=True, metavar="NAME=COLUMN",
                    help="e.g. body=text title=headline")
    mf.add_argument("--units", type=int, default=4)
    mf.add_argument("--partitions", type=int, default=None)
    mf.add_argument("--snapshot", type=int, default=0)
    mf.add_argument("--positions", action="store_true",
                    help="store token positions in every field "
                         "(enables --index-root --phrase)")
    mf.add_argument("--version-col", default=None,
                    help="version column for last-writer-wins dedup")

    md = sub.add_parser(
        "delta-multifield",
        help="incremental delta for a multi-field index (one pass, all fields)",
    )
    md.add_argument("--input", required=True, help="delta rows (new snapshot only)")
    md.add_argument("--format", default="parquet")
    md.add_argument("--index", required=True, help="index ROOT (field=<name>/ subdirs)")
    md.add_argument("--fields", nargs="+", required=True, metavar="NAME=COLUMN")
    md.add_argument("--snapshot", type=int, required=True)
    md.add_argument("--units", type=int, default=1)
    md.add_argument("--partitions", type=int, default=None)

    rq = sub.add_parser(
        "retry-quarantined",
        help="re-ingest quarantined poison docs from a corrected source",
    )
    rq.add_argument("--input", required=True)
    rq.add_argument("--format", default="parquet")
    rq.add_argument("--index", required=True)
    rq.add_argument("--snapshot", type=int, required=True,
                    help="input snapshot id for the retry delta unit")
    rq.add_argument("--partitions", type=int, default=None)

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", help="index dir")
    s.add_argument("--index-base", help="base dir for --alias resolution")
    s.add_argument("--alias", help="alias name (with --index-base)")
    s.add_argument("--index-root", help="multi-field root (field=<name>/ dirs)")
    s.add_argument("--boosts", nargs="*", default=[], metavar="FIELD=W",
                   help="per-field boosts for --index-root, e.g. title=2.0")
    g = s.add_mutually_exclusive_group(required=True)
    g.add_argument("--terms", nargs="+")
    g.add_argument("--prefix", help="prefix query (lexicon range expansion)")
    g.add_argument("--wildcard", help="wildcard query, * and ? (e.g. 'f?st')")
    g.add_argument("--fuzzy", help="fuzzy term query (edit-distance expansion)")
    g.add_argument("--regexp", help="regexp term query (anchored over the term)")
    g.add_argument("--phrase", nargs="+",
                   help="exact-phrase query (index built with --positions)")
    g.add_argument("--phrase-prefix", nargs="+", dest="phrase_prefix",
                   help="match_phrase_prefix: exact words then a prefix "
                        "(search-as-you-type; index built with --positions)")
    g.add_argument("--dsl", help="OpenSearch-style JSON query DSL tree "
                                 "(bool/dis_max/constant_score/...)")
    s.add_argument("--slop", type=int, default=0,
                   help="with --phrase: ordered-window proximity slop")
    s.add_argument("--max-edits", type=int, default=1,
                   help="with --fuzzy: 0, 1, or 2 edits")
    s.add_argument("--prefix-length", type=int, default=0,
                   help="with --fuzzy: leading chars that must match exactly")
    s.add_argument("--transpositions", action="store_true",
                   help="with --fuzzy: count a transposition as one edit")
    s.add_argument("--max-expansions", type=int, default=128)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["or", "and"], default="or")
    s.add_argument("--strategy", default="maxscore",
                   choices=["maxscore", "bmw", "exhaustive"])
    s.add_argument("--exclude-terms", nargs="*", default=None,
                   help="bool.must_not terms")
    s.add_argument("--ranges", type=int, default=0,
                   help=">0: doc-range-parallel scoring with this many ranges")
    s.add_argument("--after", nargs=2, metavar=("SCORE", "DOC_ID"), default=None,
                   help="search_after cursor: page strictly after this "
                        "(score, doc_id) in the global order")

    h = sub.add_parser("hybrid", help="fused BM25 + vector top-k (RRF/linear)")
    h.add_argument("--index", required=True, help="text index dir")
    h.add_argument("--embeddings", required=True,
                   help="parquet with (vec_id, embedding) joined on doc_id")
    h.add_argument("--terms", nargs="+", required=True)
    h.add_argument("--vec-id", type=int, required=True,
                   help="query = this row's embedding (excluded from results)")
    h.add_argument("-k", type=int, default=10)
    h.add_argument("--candidates", type=int, default=50)
    h.add_argument("--method", choices=["rrf", "linear"], default="rrf")
    h.add_argument("--w-text", type=float, default=1.0)
    h.add_argument("--w-vec", type=float, default=1.0)

    a = p.parse_args(argv)
    spark = _spark(f"pgspark_index-{a.cmd}")

    if a.cmd == "build":
        from . import build

        res = build.build_index(
            spark, _read_input(spark, a.input, a.format), a.index,
            num_units=a.units, partitions=a.partitions,
            resume=not a.no_resume, input_snapshot_id=a.snapshot,
            ignore_unit_errors=a.ignore_unit_errors,
            with_positions=a.positions,
        )
        from . import merge

        stats = merge.merge_index(spark, a.index)
        print(json.dumps({"build": res, "stats": stats}, default=str))
    elif a.cmd == "delta":
        from . import incremental

        res = incremental.build_delta(
            spark, _read_input(spark, a.input, a.format), a.index,
            input_snapshot_id=a.snapshot, num_units=a.units,
            partitions=a.partitions,
        )
        print(json.dumps(res, default=str))
    elif a.cmd == "delta-multifield":
        from . import incremental

        fields = {}
        for spec in a.fields:
            name, _, col = spec.partition("=")
            if not col:
                p.error(f"--fields entries are NAME=COLUMN, got {spec!r}")
            fields[name] = col
        res = incremental.build_delta_multifield(
            spark, _read_input(spark, a.input, a.format), a.index,
            fields=fields, input_snapshot_id=a.snapshot,
            num_units=a.units, partitions=a.partitions,
        )
        print(json.dumps(res, default=str))
    elif a.cmd == "retry-quarantined":
        from . import incremental

        res = incremental.retry_quarantined(
            spark, _read_input(spark, a.input, a.format), a.index,
            input_snapshot_id=a.snapshot, partitions=a.partitions,
        )
        print(json.dumps(res, default=str))
    elif a.cmd == "build-multifield":
        from . import build

        fields = {}
        for spec in a.fields:
            name, _, col = spec.partition("=")
            if not col:
                p.error(f"--fields entries are NAME=COLUMN, got {spec!r}")
            fields[name] = col
        fdirs = build.build_index_multifield(
            spark, _read_input(spark, a.input, a.format), a.index,
            fields=fields, num_units=a.units, partitions=a.partitions,
            input_snapshot_id=a.snapshot, with_positions=a.positions,
            version_col=a.version_col,
        )
        print(json.dumps({"field_indexes": fdirs}))
    elif a.cmd == "compact":
        from . import incremental

        print(json.dumps(incremental.compact(spark, a.index), default=str))
    elif a.cmd == "delete-by-query":
        from . import incremental

        print(json.dumps(
            incremental.delete_by_query(
                spark, a.index, json.loads(a.dsl), snapshot_id=a.snapshot
            ),
            default=str,
        ))
    elif a.cmd == "merge-units":
        from . import incremental

        print(json.dumps(
            incremental.merge_units(
                spark, a.index, units=a.units or None, partitions=a.partitions
            ),
            default=str,
        ))
    elif a.cmd == "status":
        from . import status as status_mod

        print(json.dumps(
            status_mod.root_status(a.index, latest_snapshot=a.latest_snapshot),
            default=str,
        ))
    elif a.cmd == "merge":
        from . import merge

        print(json.dumps(merge.merge_index(spark, a.index), default=str))
    elif a.cmd == "search":
        from . import query

        if a.index_root:
            boosts = {}
            for spec in a.boosts:
                name, _, w = spec.partition("=")
                if not w:
                    p.error(f"--boosts entries are FIELD=WEIGHT, got {spec!r}")
                boosts[name] = float(w)
            if a.prefix:
                df = query.search_multifield_prefix(
                    spark, a.index_root, a.prefix, a.k, boosts=boosts or None,
                    max_expansions=a.max_expansions,
                )
            elif a.wildcard:
                df = query.search_multifield_wildcard(
                    spark, a.index_root, a.wildcard, a.k, boosts=boosts or None,
                    max_expansions=a.max_expansions,
                )
            elif a.fuzzy:
                df = query.search_multifield_fuzzy(
                    spark, a.index_root, a.fuzzy, a.k, boosts=boosts or None,
                    max_edits=a.max_edits, max_expansions=a.max_expansions,
                    prefix_length=a.prefix_length,
                    transpositions=a.transpositions,
                )
            elif a.phrase:
                df = query.search_multifield_phrase(
                    spark, a.index_root, a.phrase, a.k, boosts=boosts or None,
                    slop=a.slop,
                )
            elif a.regexp:
                df = query.search_multifield_regexp(
                    spark, a.index_root, a.regexp, a.k, boosts=boosts or None,
                    max_expansions=a.max_expansions,
                )
            else:
                df = query.search_multifield(
                    spark, a.index_root, a.terms, a.k, boosts=boosts or None
                )
            for r in df.collect():
                print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
            return 0
        idx = a.index
        if idx is None:
            if not (a.index_base and a.alias):
                p.error("search needs --index or (--index-base and --alias)")
            from . import aliases

            idx = aliases.resolve(a.index_base, a.alias)
        if a.prefix:
            df = query.search_prefix(
                spark, idx, a.prefix, a.k, max_expansions=a.max_expansions
            )
        elif a.regexp:
            df = query.search_regexp(
                spark, idx, a.regexp, a.k, max_expansions=a.max_expansions
            )
        elif a.wildcard:
            df = query.search_wildcard(
                spark, idx, a.wildcard, a.k, max_expansions=a.max_expansions
            )
        elif a.fuzzy:
            df = query.search_fuzzy(
                spark, idx, a.fuzzy, a.k, max_edits=a.max_edits,
                max_expansions=a.max_expansions,
                prefix_length=a.prefix_length,
                transpositions=a.transpositions,
            )
        elif a.phrase:
            df = (
                query.search_phrase(spark, idx, a.phrase, a.k)
                if a.slop == 0
                else query.search_proximity(spark, idx, a.phrase, a.slop, a.k)
            )
        elif a.phrase_prefix:
            df = query.search_phrase_prefix(
                spark, idx, a.phrase_prefix, a.k,
                max_expansions=a.max_expansions,
            )
        elif a.dsl:
            df = query.execute_dsl(spark, idx, json.loads(a.dsl), a.k)
        elif a.ranges > 0:
            df = query.search_ranged(spark, idx, a.terms, a.k, ranges=a.ranges)
        elif a.after is not None:
            df = query.search_after(
                spark, idx, a.terms, a.k,
                after=(float(a.after[0]), int(a.after[1])),
                exclude_terms=a.exclude_terms,
            )
        else:
            df = query.search(
                spark, idx, a.terms, a.k, strategy=a.strategy, mode=a.mode,
                exclude_terms=a.exclude_terms,
            )
        for r in df.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    elif a.cmd == "hybrid":
        from pyspark.sql import functions as F

        from . import hybrid as hy

        emb = spark.read.parquet(a.embeddings)
        row = emb.filter(F.col("vec_id") == a.vec_id).select("embedding").collect()
        if not row:
            p.error(f"vec_id {a.vec_id} not found in {a.embeddings}")
        qv = [float(x) for x in row[0]["embedding"]]
        df = hy.hybrid_topk(
            spark, a.index, emb, a.terms, qv, k=a.k, candidates=a.candidates,
            method=a.method, w_text=a.w_text, w_vec=a.w_vec,
            exclude_id=a.vec_id,
        )
        for r in df.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
