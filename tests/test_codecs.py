"""Unit tests: varbyte/delta codec round-trips + block-max metadata.

Mirrors the reference's table-driven unit style (SURVEY.md §5)."""

import numpy as np
import pytest

from pgspark_index import codecs


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**63, 2**64 - 1], dtype=np.uint64)
    blob, nbytes = codecs.varbyte_encode(vals)
    assert nbytes.tolist() == [1, 1, 1, 2, 2, 2, 3, 5, 10, 10]
    out = codecs.varbyte_decode(blob)
    assert out.tolist() == vals.tolist()


def test_varbyte_roundtrip_random():
    rng = np.random.RandomState(7)
    for _ in range(10):
        n = rng.randint(1, 5000)
        # mix of magnitudes
        vals = (rng.randint(0, 2**62, size=n).astype(np.uint64)
                >> rng.randint(0, 62, size=n).astype(np.uint64))
        blob, _ = codecs.varbyte_encode(vals)
        assert codecs.varbyte_decode(blob).tolist() == vals.tolist()


def test_varbyte_empty():
    blob, nbytes = codecs.varbyte_encode(np.zeros(0, dtype=np.uint64))
    assert blob == b"" and len(nbytes) == 0
    assert codecs.varbyte_decode(b"").size == 0


@pytest.mark.parametrize("n", [1, 5, 128, 129, 1000, 4096])
def test_postings_roundtrip(n):
    # doc keys are NON-NEGATIVE segment-local ordinals (format v3)
    rng = np.random.RandomState(n)
    doc_ids = np.unique(rng.randint(0, 2**62, size=n).astype(np.int64))
    tfs = rng.randint(1, 50, size=doc_ids.size)
    dls = rng.randint(1, 500, size=doc_ids.size)
    enc = codecs.encode_postings(doc_ids, tfs, dls)
    assert enc["df"] == doc_ids.size
    assert enc["cf"] == int(tfs.sum())
    d_doc, d_tf = codecs.decode_postings(enc["postings"], enc["df"])
    assert d_doc.tolist() == doc_ids.tolist()
    assert d_tf.tolist() == tfs.tolist()
    # format v2: doclen is NOT in the stream (per-doc sidecar); the encoder
    # only folds it into block_min_dl metadata
    nblocks = (doc_ids.size + codecs.BLOCK - 1) // codecs.BLOCK
    assert len(enc["block_min_dl"]) == nblocks


def test_encode_groups_matches_per_group_encode():
    """Vectorized many-list encode must be byte-identical to per-list encode."""
    rng = np.random.RandomState(9)
    sizes = [1, 3, 128, 129, 500, 2, 1000, 7]
    doc_pool = np.unique(rng.randint(0, 2**60, size=sum(sizes) + 10).astype(np.int64))
    docs, tfs, dls, starts = [], [], [], []
    pos = 0
    o = 0
    for sz in sizes:
        starts.append(o)
        d = np.sort(doc_pool[pos : pos + sz])
        docs.append(d)
        tfs.append(rng.randint(1, 40, size=sz))
        dls.append(rng.randint(5, 300, size=sz))
        pos += sz
        o += sz
    all_docs = np.concatenate(docs)
    all_tfs = np.concatenate(tfs)
    all_dls = np.concatenate(dls)
    rows = codecs.encode_groups(np.array(starts), all_docs, all_tfs, all_dls)
    assert len(rows) == len(sizes)
    for r, d, t, l in zip(rows, docs, tfs, dls):
        single = codecs.encode_postings(d, t, l)
        assert r["postings"] == single["postings"]
        assert r["df"] == single["df"] and r["cf"] == single["cf"]
        assert r["block_last_doc"].tolist() == single["block_last_doc"].tolist()
        assert r["block_max_tf"].tolist() == single["block_max_tf"].tolist()
        assert r["block_min_dl"].tolist() == single["block_min_dl"].tolist()
        assert r["block_offset"].tolist() == single["block_offset"].tolist()


def test_block_meta_and_block_decode():
    rng = np.random.RandomState(3)
    n = 1000
    doc_ids = np.unique(rng.randint(0, 2**40, size=n).astype(np.int64))
    n = doc_ids.size
    tfs = rng.randint(1, 30, size=n)
    dls = rng.randint(10, 400, size=n)
    enc = codecs.encode_postings(doc_ids, tfs, dls)
    nblocks = (n + codecs.BLOCK - 1) // codecs.BLOCK
    assert len(enc["block_last_doc"]) == nblocks
    for b in range(nblocks):
        lo, hi = b * codecs.BLOCK, min((b + 1) * codecs.BLOCK, n)
        assert enc["block_last_doc"][b] == doc_ids[hi - 1]
        assert enc["block_max_tf"][b] == tfs[lo:hi].max()
        assert enc["block_min_dl"][b] == dls[lo:hi].min()
        prev = None if b == 0 else int(doc_ids[lo - 1])
        bd, bt = codecs.decode_block(
            enc["postings"], b, enc["block_offset"], prev
        )
        assert bd.tolist() == doc_ids[lo:hi].tolist()
        assert bt.tolist() == tfs[lo:hi].tolist()


def test_read_first_varints_and_ragged_copy():
    import numpy as np

    from pgspark_index import codecs

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1 << 45, size=200).astype(np.uint64)
    blob, nbytes = codecs.varbyte_encode(vals)
    data = np.frombuffer(blob, dtype=np.uint8)
    starts = np.zeros(200, dtype=np.int64)
    np.cumsum(nbytes[:-1].astype(np.int64), out=starts[1:])
    got_v, got_l = codecs.read_first_varints(data, starts)
    assert (got_v == vals).all()
    assert (got_l == nbytes.astype(np.int64)).all()

    # ragged_copy: scatter three slices into a gap-free destination
    src = np.arange(100, dtype=np.uint8)
    dst = np.zeros(9, dtype=np.uint8)
    codecs.ragged_copy(
        dst,
        np.array([0, 4, 6]),
        src,
        np.array([10, 50, 90]),
        np.array([4, 2, 3]),
    )
    assert dst.tolist() == [10, 11, 12, 13, 50, 51, 90, 91, 92]
