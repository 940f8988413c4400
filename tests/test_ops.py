"""Operator tests: dedup / ANN / textops / multimodal on tiny in-memory
tables with hand-checkable expectations."""

import pytest
from pyspark.sql import functions as F

from pgspark_index import ann, dedup, multimodal, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "srcA", 43),
        (2, "the quick brown fox jumps over the lazy dog", "en", "srcA", 43),  # exact dup
        (3, "the quick brown fox jumps over a lazy dog", "en", "srcA", 41),  # near dup
        (4, "der hund ist nicht schnell und die katze ist da", "de", "srcA", 48),
        (5, "completely different words about spark indexes", "en", "srcB", 46),
        (6, "x", "en", "srcB", 1),  # single token
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0, 0.0], 1),
        (4, [0.95, 0.05, 0.0, 0.0], 0),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["canonical_doc_id"] == 1


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, num_hashes=16, rows_per_band=4).collect()
    }
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 5) not in pairs and (1, 4) not in pairs


def test_simhash_identical_docs_equal(docs):
    sh = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    assert sh[1] == sh[2]
    assert 0 <= sh[1] < 2**32
    # near-dup within small hamming distance; unrelated doc far
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[5])


def test_ngram_jaccard(docs):
    # default path: candidates come from MinHash-LSH (identical docs always
    # collide); exact-Jaccard VERIFIER values checked via explicit candidates
    out_default = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, min_jaccard=0.2).collect()
    }
    assert out_default[(1, 2)] == 1.0
    cand = docs.sparkSession.createDataFrame(
        [(1, 2), (1, 3), (1, 5)], "doc_a bigint, doc_b bigint"
    )
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, candidates=cand, min_jaccard=0.0).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.5 < out[(1, 3)] < 1.0
    assert out.get((1, 5), 0.0) < 0.2


def test_simhash_pairs(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0  # identical docs: same signature
    assert all(h <= 3 for h in pairs.values())
    assert (1, 5) not in pairs


def test_embedding_near_dups(vecs):
    # verifier over explicit candidates: exact cosine thresholding
    cand = vecs.sparkSession.createDataFrame(
        [(0, 1), (0, 2), (0, 4), (1, 4)], "id_a bigint, id_b bigint"
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in dedup.embedding_near_dup_pairs(vecs, threshold=0.9, candidates=cand).collect()
    }
    assert (0, 1) in pairs and (0, 4) in pairs and (1, 4) in pairs
    assert (0, 2) not in pairs
    # default path: LSH candidates — near-identical vectors collide
    lsh_pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_near_dup_pairs(vecs, threshold=0.9).collect()
    }
    assert lsh_pairs <= {(0, 1), (0, 4), (1, 4)}


def test_ann_bruteforce(vecs):
    got = ann.cosine_topk(vecs, [1.0, 0.0, 0.0, 0.0], k=3, exclude_id=0).collect()
    assert [r["vec_id"] for r in got] == [4, 1, 2]
    assert got[0]["cos"] > 0.99


def test_ann_index_recall_and_pruning(spark, tmp_path):
    """The VERDICT done-criterion: multi-table multi-probe LSH index reaches
    recall >= 0.9 of brute-force top-10 while reading < 10% of stored rows
    (partition pruning over write-time bucket columns)."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(400, 64)
    q = rng.randn(64)
    planted = q[None, :] + 0.15 * rng.randn(12, 64)  # cos ~ 0.95+
    vecs = np.vstack([base, planted])
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    qv = [float(x) for x in q]

    idx = str(tmp_path / "annidx")
    ann.index_embeddings(df, idx, num_tables=4, bits=10)
    brute = [r["vec_id"] for r in ann.cosine_topk(df, qv, k=10).collect()]
    got = [r["vec_id"] for r in ann.lsh_topk(spark, idx, qv, k=10).collect()]
    recall = len(set(got) & set(brute)) / 10
    assert recall >= 0.9, (recall, got, brute)
    frac = ann.probed_fraction(spark, idx, qv)
    assert frac < 0.10, frac
    # and the probe plan actually prunes partitions (not a full scan + filter)
    import json
    with open(idx + "/_ann_meta.json") as f:
        meta = json.load(f)
    probes = []
    for t in range(meta["num_tables"]):
        planes = ann.plane_weights(spark, meta["bits"], meta["dims"], table=t)
        qb = ann.query_buckets(qv, planes)
        probes.extend((t, b) for b in [qb] + [qb ^ (1 << i) for i in range(meta["bits"])])
    plan = (spark.read.parquet(idx).filter(ann._probe_cond(probes))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan and "tbl" in plan


def test_lang_id(docs):
    out = {r["doc_id"]: r["lang_guess"] for r in textops.lang_id(docs).collect()}
    assert out[1] == "en" and out[4] == "de"
    assert out[6] == "und"  # no stopwords at all


def test_quality_score(docs):
    out = {r["doc_id"]: r for r in textops.quality_score(docs).collect()}
    assert out[1]["n_tokens"] == 9
    assert out[1]["uniq_ratio"] == round(8 / 9, 4)
    assert out[6]["quality"] < out[1]["quality"]


def test_fingerprint_short_doc(docs):
    out = {r["doc_id"]: r for r in textops.fingerprint(docs).collect()}
    assert out[6]["n_grams"] == 0 and out[6]["n_selected"] == 0
    assert out[1]["fp"] == out[2]["fp"]  # identical docs -> identical fingerprint


def test_multimodal_plumbing(docs):
    media = multimodal.attach_payload(docs)
    stats = {r["media_type"]: r for r in multimodal.media_stats(media).collect()}
    assert sum(r["n_items"] for r in stats.values()) == 6
    feats = multimodal.extract_features(media, fake=True).collect()
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic: same payload -> same feature
    by_id = {r["doc_id"]: r["feature"] for r in feats}
    assert by_id[1] == by_id[2]
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"xxx")


def test_sample_frames_windows(spark):
    """Byte-window frames: strided offsets, tail truncation, max_frames cap."""
    import hashlib

    from pgspark_index import multimodal

    payload = bytes(range(200)) * 10  # 2000 bytes
    media = spark.createDataFrame(
        [(1, "video/mp4", len(payload), payload), (2, "video/mp4", 5, b"abcde")],
        "doc_id bigint, media_type string, n_bytes bigint, payload binary",
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in multimodal.sample_frames(
            media, frame_size=64, stride=128, max_frames=4
        ).collect()
    }
    assert sorted(k[1] for k in rows if k[0] == 1) == [0, 1, 2, 3]  # capped at 4
    assert rows[(1, 1)]["frame_bytes"] == 64
    assert rows[(1, 1)]["frame_md5"] == hashlib.md5(payload[128:192]).hexdigest()
    assert rows[(2, 0)]["frame_bytes"] == 5  # tail truncation
    assert rows[(2, 0)]["frame_md5"] == hashlib.md5(b"abcde").hexdigest()
