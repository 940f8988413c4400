"""Timer-based (no cProfile) breakdown of a full 50-query pass: aggregates
time in _unit_seg_pdf (parquet read), sidecar, scorer, and everything else,
for pass 1 (cold, = what bench.py measures after its single warmup) and
pass 2 (warm caches)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgspark_index import build, fixtures, merge, query, wand  # noqa: E402
from pgspark_index.session import get_spark  # noqa: E402

ACC = {}


def timed(name, fn):
    def wrapper(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            ACC[name] = ACC.get(name, 0.0) + (time.time() - t0)
    return wrapper


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 1.0
    n_docs = max(1000, int(sf * 200_000))
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app="pgspark_qpass", cores=cpus, shuffle_partitions=cpus)
    index_dir = tempfile.mkdtemp(prefix="pgspark_qp_idx_")
    try:
        parts = max(8, min(cpus * 4, n_docs // 1500))
        df = fixtures.make_webtext_df_dist(spark, n_docs, seed=42, partitions=parts)
        df.persist().count()
        build.build_index(
            spark, df, index_dir, num_units=2, partitions=parts,
            salt_target=50_000, sample_fraction=0.05,
        )
        merge.merge_index(spark, index_dir)
        queries = fixtures.make_query_set(50, seed=123)

        query._unit_seg_pdf = timed("seg_pdf", query._unit_seg_pdf)
        query._sidecar = timed("sidecar", query._sidecar)
        query._rows_to_lists = timed("rows_to_lists", query._rows_to_lists)
        orig_strategies = dict(wand.STRATEGIES)
        for k, v in orig_strategies.items():
            wand.STRATEGIES[k] = timed(f"scorer:{k}", v)
        query._term_stats = timed("term_stats", query._term_stats)

        query.search(spark, index_dir, queries[0]["terms"], 10).collect()  # warm
        for p in (1, 2):
            ACC.clear()
            t0 = time.time()
            for q in queries:
                query.search(spark, index_dir, q["terms"], q["k"]).collect()
            total = time.time() - t0
            acc = {k: round(v, 3) for k, v in sorted(ACC.items())}
            print(f"pass{p}: total={total:.2f}s accounted={acc}")
    finally:
        shutil.rmtree(index_dir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
