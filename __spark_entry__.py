"""Driver contract for the spark-graft builder (PySpark target).

Backed by pgspark_index — a PySpark-native inverted-index + BM25 engine
(see SURVEY.md). ``entry`` runs the flagship BM25 top-k through the real
engine (build -> merge -> block-max query) at sf0.001; ``queries`` /
``oracle_sql`` expose one pair per implemented operator from SURVEY.md §2
plus the training-data-pipeline operators (dedup / ANN / text analysis /
multimodal plumbing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: top-10 BM25 via the real index over sf0.001 documents."""
    from pgspark_index import driverapi

    fn, _ = driverapi.registry()["bm25_topk"]
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pgspark_index import driverapi

    return {name: fn for name, (fn, _sql) in driverapi.registry().items()}


def oracle_sql() -> dict[str, str]:
    from pgspark_index import driverapi

    return {
        name: sql
        for name, (_fn, sql) in driverapi.registry().items()
        if sql is not None
    }
