"""Deterministic synthetic webtext corpus (FIXTURES.md §1).

Schema per BASELINE.json input_hint:
  (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Everything derives from numpy's legacy RandomState(seed) (MT19937 — frozen
stable across numpy versions) and a fixed epoch; no wall clock, no external
data, so goldens are stable across machines and parallelism levels —
mirroring the reference's deterministic-transformer requirement
(/root/reference/pkg/transformers/generators/deterministic_bytes_generator.go:9-16).

Generation rules (FIXTURES.md):
- Zipf-ish vocabulary of ~30k terms, exponent s≈1.1 -> realistic head-term
  skew (the skew the salted repartition must defeat).
- ~5% of rows: text=NULL, content only in html (exercises extract path).
- ~10% of rows: html=NULL (text-only).
- lang: 90% "en", rest seeded mix of de/fr/es/NULL.
- ~1% of urls recrawled (two rows, later warc_ts wins — LSN-as-version
  analog, /root/reference/pkg/wal/processor/search/search_adapter.go:179-184).
- Punctuation/casing noise to exercise normalization.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

EPOCH = dt.datetime(2025, 1, 1, 0, 0, 0)
VOCAB_SIZE = 30_000
ZIPF_S = 1.1

WEBTEXT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

# Spark DDL schema string for createDataFrame
WEBTEXT_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def _vocab() -> np.ndarray:
    return np.array([f"w{i:05d}" for i in range(VOCAB_SIZE)])


def _zipf_probs(n: int, s: float) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def make_webtext_pdf(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Generate the corpus as pandas (Arrow-convertible to Spark)."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    probs = _zipf_probs(VOCAB_SIZE, ZIPF_S)

    site_ids = rng.randint(0, 1000, size=n_docs)
    page_ids = np.arange(n_docs)
    urls = [
        f"https://site{s:04d}.example/page/{p:06d}"
        for s, p in zip(site_ids, page_ids)
    ]
    warc_ts = [EPOCH + dt.timedelta(seconds=int(p)) for p in page_ids]

    doclens = rng.randint(20, 220, size=n_docs)
    total = int(doclens.sum())
    flat_terms = vocab[rng.choice(VOCAB_SIZE, size=total, p=probs)]
    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(doclens, out=offsets[1:])

    caser = rng.rand(n_docs)  # fraction of tokens upper-cased per doc
    texts = []
    for i in range(n_docs):
        toks = flat_terms[offsets[i] : offsets[i + 1]].tolist()
        # deterministic casing/punct noise
        if caser[i] < 0.3:
            toks = [t.upper() if j % 7 == 0 else t for j, t in enumerate(toks)]
        sent = []
        for j, t in enumerate(toks):
            sent.append(t)
            if j % 11 == 10:
                sent[-1] = sent[-1] + ","
            if j % 17 == 16:
                sent[-1] = sent[-1] + "."
        texts.append(" ".join(sent))

    text_null = rng.rand(n_docs) < 0.05
    html_null = rng.rand(n_docs) < 0.10
    # never both null
    both = text_null & html_null
    html_null[both] = False

    htmls: list[bytes | None] = []
    out_texts: list[str | None] = []
    for i in range(n_docs):
        if html_null[i]:
            htmls.append(None)
        else:
            htmls.append(
                b"<html><body><p>" + texts[i].encode("utf-8") + b"</p></body></html>"
            )
        out_texts.append(None if text_null[i] else texts[i])

    lang_roll = rng.rand(n_docs)
    other = np.array(["de", "fr", "es", None], dtype=object)
    langs = np.where(
        lang_roll < 0.9, "en", other[rng.randint(0, 4, size=n_docs)]
    ).tolist()

    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": out_texts,
            "lang": langs,
        }
    )

    # ~1% recrawls: duplicate url with later ts and regenerated text
    n_re = max(1, n_docs // 100)
    re_idx = rng.choice(n_docs, size=n_re, replace=False)
    re_rows = []
    for i in re_idx:
        dl = int(rng.randint(20, 220))
        toks = vocab[rng.choice(VOCAB_SIZE, size=dl, p=probs)].tolist()
        t = " ".join(toks)
        re_rows.append(
            {
                "url": urls[i],
                "warc_ts": warc_ts[i] + dt.timedelta(days=30),
                "html": b"<html><body><p>" + t.encode() + b"</p></body></html>",
                "text": t,
                "lang": langs[i],
            }
        )
    pdf = pd.concat([pdf, pd.DataFrame(re_rows)], ignore_index=True)
    # deterministic row order regardless of concat details
    pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
    return pdf


def make_webtext_df(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Spark DataFrame of the corpus (Arrow path; explicit schema)."""
    pdf = make_webtext_pdf(n_docs, seed)
    df = spark.createDataFrame(pdf, schema=WEBTEXT_DDL)
    if partitions:
        df = df.repartition(partitions)
    return df


def make_webtext_df_dist(spark, n_docs: int, seed: int = 42, partitions: int | None = None):
    """Distributed deterministic corpus generator for benchmark-scale sizes.

    Generation is seeded PER doc_id (page_id), so the output is identical
    regardless of partition count or parallelism — the same determinism
    contract as make_webtext_pdf, at cluster scale (the driver never holds
    the corpus). Content rules mirror the pandas generator (Zipf vocab,
    text/html nulls, langs) minus the recrawl duplicates, which matter for
    correctness tests, not throughput benches."""
    import pandas as pd  # noqa: F401

    parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    vocab = _vocab()
    # precomputed CDF + searchsorted instead of rng.choice(p=...): choice
    # rebuilds the 30k-entry CDF on every call (~100x slower per doc)
    cdf = np.cumsum(_zipf_probs(VOCAB_SIZE, ZIPF_S))
    base = spark.range(0, n_docs, 1, parts)

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for pid in ids:
                rng = np.random.RandomState((seed * 1_000_003 + int(pid)) % (2**31 - 1))
                dl = rng.randint(20, 220)
                toks = vocab[np.minimum(
                    np.searchsorted(cdf, rng.rand(dl)), VOCAB_SIZE - 1
                )]
                text = " ".join(toks.tolist())
                roll = rng.rand(3)
                out["url"].append(
                    f"https://site{rng.randint(0, 1000):04d}.example/page/{int(pid):06d}"
                )
                out["warc_ts"].append(EPOCH + dt.timedelta(seconds=int(pid)))
                out["html"].append(
                    None
                    if roll[1] < 0.10 and roll[0] >= 0.05
                    else b"<html><body><p>" + text.encode() + b"</p></body></html>"
                )
                out["text"].append(None if roll[0] < 0.05 and roll[1] >= 0.10 else text)
                out["lang"].append(
                    "en" if roll[2] < 0.9 else ["de", "fr", "es", None][rng.randint(0, 4)]
                )
            yield pd.DataFrame(out)

    return base.mapInPandas(gen, schema=WEBTEXT_DDL)


def make_query_set(n_queries: int = 50, seed: int = 123) -> list[dict]:
    """Seeded reference query set (FIXTURES.md §3): head/tail single terms,
    2–4 term conjunctions, absent terms, plus a tie-prone head-term query."""
    rng = np.random.RandomState(seed)
    vocab = _vocab()
    queries: list[dict] = []
    qid = 0
    for _ in range(n_queries):
        kind = rng.randint(0, 5)
        if kind == 0:  # single head term
            terms = [vocab[rng.randint(0, 50)]]
        elif kind == 1:  # single tail term
            terms = [vocab[rng.randint(5000, VOCAB_SIZE)]]
        elif kind == 2:  # 2-4 term mixed conjunction
            k = rng.randint(2, 5)
            terms = list(vocab[rng.randint(0, 2000, size=k)])
        elif kind == 3:  # term absent from vocab
            terms = [f"zz_absent_{rng.randint(0, 10)}", vocab[rng.randint(0, 500)]]
        else:  # tie-prone: very frequent terms only
            terms = [vocab[0], vocab[1]]
        queries.append({"query_id": qid, "terms": sorted(set(str(t) for t in terms)), "k": 10})
        qid += 1
    return queries
