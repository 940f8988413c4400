"""Pure-numpy brute-force BM25 oracle for golden tests.

Mirrors the reference's golden-assertion testing style
(/root/reference/pkg/stream/integration/pg_search_integration_test.go:52-120
asserts exact documents/mappings after indexing): we compute top-k BM25
exhaustively over a small corpus and commit the (rank, doc_id, score)
triples; the engine must be rank-identical.

Input is a pandas DataFrame with (doc_id:int64, norm_text:str) — already
deduplicated last-writer-wins and normalized, so the oracle shares the
deterministic textnorm stage with the engine but nothing else.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import bm25
from .textnorm import token_counts


def build_stats(docs: pd.DataFrame) -> dict:
    """docs(doc_id, norm_text) -> {'N', 'avgdl', 'doclen': {doc_id: dl},
    'tf': {term: {doc_id: tf}}, 'df': {term: df}}."""
    tf: dict[str, dict[int, int]] = {}
    doclen: dict[int, int] = {}
    for doc_id, text in zip(docs["doc_id"], docs["norm_text"]):
        dl, counts = token_counts(text)
        doclen[int(doc_id)] = dl
        for term, c in counts:
            tf.setdefault(term, {})[int(doc_id)] = c
    n = len(doclen)
    avgdl = float(np.mean(list(doclen.values()))) if n else 0.0
    df = {t: len(d) for t, d in tf.items()}
    return {"N": n, "avgdl": avgdl, "doclen": doclen, "tf": tf, "df": df}


def score_query(stats: dict, terms: list[str], k: int = 10) -> list[tuple[int, int, float]]:
    """-> [(rank, doc_id, score)] with (score DESC, doc_id ASC) tie-break.

    Terms are deduplicated and summed in sorted order (float64) — the same
    accumulation order as the engine and the SQL oracle.
    """
    n, avgdl = stats["N"], stats["avgdl"]
    acc: dict[int, float] = {}
    for term in sorted(set(terms)):
        postings = stats["tf"].get(term)
        if not postings:
            continue
        w_idf = float(bm25.idf(n, stats["df"][term]))
        for doc_id, tf in postings.items():
            contrib = w_idf * float(
                bm25.tf_weight(tf, stats["doclen"][doc_id], avgdl)
            )
            acc[doc_id] = acc.get(doc_id, 0.0) + contrib
    ranked = sorted(acc.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(i + 1, doc_id, score) for i, (doc_id, score) in enumerate(ranked)]
