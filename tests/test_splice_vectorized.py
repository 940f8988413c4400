"""Differential test: the vectorized splice merge (build._splice_merge_fn)
is byte-identical to a straightforward per-row reference splice AND to a
from-scratch single-pass encode of each group's full posting list.

The splice is the one build stage whose row count grows with cluster size
(partial rows ~ vocab x tokenize partitions), so it must stay free of
per-row Python work — this test pins its exact output while allowing the
implementation to stay fully vectorized."""

import numpy as np
import pyarrow as pa
import pytest

from pgspark_index import build, codecs


def _make_partition(seed: int, n_terms: int, max_parts: int):
    """Synthetic shuffled splice input: rows sorted by (term, salt,
    first_doc); each (term, salt) group split into several partials over
    disjoint ascending ordinal ranges. Returns (record batch rows, expected
    full lists per group)."""
    rng = np.random.default_rng(seed)
    rows = {k: [] for k in (
        "term", "salt", "df", "cf", "first_doc", "block_last_doc",
        "block_max_tf", "block_min_dl", "block_offset", "postings",
        "positions",
    )}
    expected = []  # (term, salt, doc_ids, tfs) per group, in row order
    for t in range(n_terms):
        term = f"t{t:05d}"
        for salt in range(int(rng.integers(1, 3))):
            n_docs = int(rng.integers(1, 400))
            # ordinals spanning two "partition grids" like real builds
            docs = np.sort(rng.choice(1 << 20, size=n_docs, replace=False)).astype(np.int64)
            tfs = rng.integers(1, 50, size=n_docs).astype(np.uint64)
            dls = rng.integers(10, 500, size=n_docs).astype(np.uint64)
            expected.append((term, salt, docs, tfs, dls))
            nparts = int(rng.integers(1, max_parts + 1))
            bounds = np.sort(rng.choice(np.arange(1, n_docs), size=min(nparts - 1, n_docs - 1), replace=False)) if n_docs > 1 else np.array([], dtype=np.int64)
            pieces = np.split(np.arange(n_docs), bounds)
            for idx in pieces:
                if idx.size == 0:
                    continue
                enc = codecs.encode_postings(docs[idx], tfs[idx], dls[idx])
                rows["term"].append(term)
                rows["salt"].append(salt)
                rows["df"].append(enc["df"])
                rows["cf"].append(enc["cf"])
                rows["first_doc"].append(int(docs[idx][0]))
                rows["block_last_doc"].append(enc["block_last_doc"].tolist())
                rows["block_max_tf"].append(enc["block_max_tf"].tolist())
                rows["block_min_dl"].append(enc["block_min_dl"].tolist())
                rows["block_offset"].append(enc["block_offset"].tolist())
                rows["postings"].append(enc["postings"])
                rows["positions"].append(b"")
    batch = pa.record_batch(
        [
            pa.array(rows["term"]),
            pa.array(rows["salt"], type=pa.int32()),
            pa.array(rows["df"], type=pa.int64()),
            pa.array(rows["cf"], type=pa.int64()),
            pa.array(rows["first_doc"], type=pa.int64()),
            pa.array(rows["block_last_doc"], type=pa.list_(pa.int64())),
            pa.array(rows["block_max_tf"], type=pa.list_(pa.int32())),
            pa.array(rows["block_min_dl"], type=pa.list_(pa.int32())),
            pa.array(rows["block_offset"], type=pa.list_(pa.int64())),
            pa.array(rows["postings"], type=pa.binary()),
            pa.array(rows["positions"], type=pa.binary()),
        ],
        names=[
            "term", "salt", "df", "cf", "first_doc", "block_last_doc",
            "block_max_tf", "block_min_dl", "block_offset", "postings",
            "positions",
        ],
    )
    return batch, expected


def _reference_splice(batch):
    """The pre-vectorization per-row reference: group rows by (term, salt),
    patch each non-first partial's first varint to a gap, concatenate, and
    shift block offsets. Returns dicts per group."""
    tb = batch.to_pydict()
    out = []
    i = 0
    n = batch.num_rows
    while i < n:
        j = i
        while (
            j + 1 < n
            and tb["term"][j + 1] == tb["term"][i]
            and tb["salt"][j + 1] == tb["salt"][i]
        ):
            j += 1
        blob = bytearray(tb["postings"][i])
        boff = list(tb["block_offset"][i])
        bld = list(tb["block_last_doc"][i])
        bmt = list(tb["block_max_tf"][i])
        bmd = list(tb["block_min_dl"][i])
        df = tb["df"][i]
        cf = tb["cf"][i]
        last_prev = tb["block_last_doc"][i][-1]
        for k in range(i + 1, j + 1):
            p = tb["postings"][k]
            fl = 1
            while p[fl - 1] >= 128:
                fl += 1
            base = len(blob)
            nv = codecs.varint_one(tb["first_doc"][k] - last_prev)
            blob += nv
            blob += p[fl:]
            delta = len(nv) - fl
            q = [base] + [o + delta + base for o in tb["block_offset"][k][1:]]
            boff += q
            bld += tb["block_last_doc"][k]
            bmt += tb["block_max_tf"][k]
            bmd += tb["block_min_dl"][k]
            df += tb["df"][k]
            cf += tb["cf"][k]
            last_prev = tb["block_last_doc"][k][-1]
        out.append({
            "term": tb["term"][i], "salt": tb["salt"][i], "df": df, "cf": cf,
            "postings": bytes(blob), "block_offset": boff,
            "block_last_doc": bld, "block_max_tf": bmt, "block_min_dl": bmd,
        })
        i = j + 1
    return out


@pytest.mark.parametrize("seed,n_terms,max_parts", [(1, 60, 1), (2, 80, 5), (3, 40, 16)])
def test_splice_matches_reference(seed, n_terms, max_parts):
    batch, expected = _make_partition(seed, n_terms, max_parts)
    got = pa.Table.from_batches(
        list(build._splice_merge_fn(iter([batch]))),
        schema=build._arrow_seg_schema(),
    ).to_pydict()
    ref = _reference_splice(batch)
    assert len(got["term"]) == len(ref)
    for k, r in enumerate(ref):
        for col in ("term", "salt", "df", "cf", "postings", "block_offset",
                    "block_last_doc", "block_max_tf", "block_min_dl"):
            assert got[col][k] == r[col], (col, r["term"], r["salt"])
    # spliced postings must also decode to the full group's stream —
    # gap[0] absolute, later gaps true doc deltas (byte-parity with a
    # from-scratch encode of the whole list)
    for k, (term, salt, docs, tfs, dls) in enumerate(expected):
        direct = codecs.encode_postings(docs, tfs, dls)
        assert got["postings"][k] == direct["postings"], (term, salt)


def test_splice_flush_batching(monkeypatch):
    """Small flush threshold -> multiple record batches, identical rows."""
    batch, _ = _make_partition(7, 50, 6)
    one = pa.Table.from_batches(
        list(build._splice_merge_fn(iter([batch]))),
        schema=build._arrow_seg_schema(),
    )
    monkeypatch.setattr(build, "_SPLICE_FLUSH_BYTES", 4096)
    many_batches = list(build._splice_merge_fn(iter([batch])))
    assert len(many_batches) > 3
    many = pa.Table.from_batches(many_batches, schema=build._arrow_seg_schema())
    assert one.to_pydict() == many.to_pydict()


def test_splice_overlap_raises():
    batch, _ = _make_partition(5, 3, 1)
    # duplicate the single-partial rows: identical doc ranges overlap
    dup = pa.concat_tables([pa.Table.from_batches([batch])] * 2).sort_by(
        [("term", "ascending"), ("salt", "ascending"), ("first_doc", "ascending")]
    ).combine_chunks().to_batches()[0]
    with pytest.raises(ValueError, match="splice-merge invariant"):
        list(build._splice_merge_fn(iter([dup])))
