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

    m = sub.add_parser("merge", help="rebuild lexicon + global stats")
    m.add_argument("--index", required=True)

    s = sub.add_parser("search", help="top-k BM25 query")
    s.add_argument("--index", help="index dir")
    s.add_argument("--index-base", help="base dir for --alias resolution")
    s.add_argument("--alias", help="alias name (with --index-base)")
    s.add_argument("--terms", nargs="+", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["or", "and"], default="or")
    s.add_argument("--strategy", default="maxscore",
                   choices=["maxscore", "bmw", "exhaustive"])
    s.add_argument("--exclude-terms", nargs="*", default=None,
                   help="bool.must_not terms")
    s.add_argument("--ranges", type=int, default=0,
                   help=">0: doc-range-parallel scoring with this many ranges")

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
    elif a.cmd == "compact":
        from . import incremental

        print(json.dumps(incremental.compact(spark, a.index), default=str))
    elif a.cmd == "merge":
        from . import merge

        print(json.dumps(merge.merge_index(spark, a.index), default=str))
    elif a.cmd == "search":
        from . import query

        idx = a.index
        if idx is None:
            if not (a.index_base and a.alias):
                p.error("search needs --index or (--index-base and --alias)")
            from . import aliases

            idx = aliases.resolve(a.index_base, a.alias)
        if a.ranges > 0:
            df = query.search_ranged(spark, idx, a.terms, a.k, ranges=a.ranges)
        else:
            df = query.search(
                spark, idx, a.terms, a.k, strategy=a.strategy, mode=a.mode,
                exclude_terms=a.exclude_terms,
            )
        for r in df.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
