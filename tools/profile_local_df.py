"""Micro-benchmark: ways to return a 10-row driver-computed result as a
DataFrame + collect() (guide §1 measure-first for the _local_df fixed cost).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pgspark_index.session import get_spark  # noqa: E402
from pgspark_index import query  # noqa: E402


def bench(name, fn, reps=30):
    fn()  # warm
    t0 = time.time()
    for _ in range(reps):
        fn()
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:35s} {dt:7.1f} ms")


def main():
    spark = get_spark(app="pgspark_localdf_prof", cores=32, shuffle_partitions=32)
    rows = [(1000003 + i, 12.345678901234 + i * 0.5) for i in range(10)]
    schema = "doc_id bigint, score double"

    bench("sql VALUES + collect (current)",
          lambda: query._local_df(spark, rows, schema).collect())

    def sql_only():
        query._local_df(spark, rows, schema)
    bench("sql VALUES construct only", sql_only)

    def cdf_tuples():
        spark.createDataFrame(rows, schema).collect()
    bench("createDataFrame(tuples) + collect", cdf_tuples)

    try:
        import pandas as pd

        def cdf_pandas():
            pdf = pd.DataFrame(rows, columns=["doc_id", "score"])
            spark.createDataFrame(pdf).collect()
        bench("createDataFrame(pandas) + collect", cdf_pandas)
    except Exception as e:  # noqa: BLE001
        print("pandas path failed:", e)

    # empty result path
    bench("createDataFrame([]) + collect",
          lambda: spark.createDataFrame([], schema).collect())

    # plain no-op py4j roundtrip cost for context
    bench("py4j no-op (spark.version access)",
          lambda: spark._jsparkSession.version())

    # collect on a pre-built VALUES df (parse amortized away)
    df = query._local_df(spark, rows, schema)
    bench("collect only (prebuilt VALUES df)", df.collect)

    spark.stop()


if __name__ == "__main__":
    main()
