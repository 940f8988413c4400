"""Tokenizer/extraction determinism tests (byte-identical invariant)."""

import hashlib

from pgspark_index import textnorm
from pgspark_index.fixtures import make_webtext_pdf


def test_normalize_basic():
    assert textnorm.normalize("Hello,  WORLD!\x00\n") == "hello, world!"
    assert textnorm.normalize("Ｆｕｌｌｗｉｄｔｈ") == "fullwidth"  # NFKC


def test_tokenize():
    assert textnorm.tokenize("hello, world! 123 foo-bar") == [
        "hello", "world", "123", "foo", "bar",
    ]


def test_strip_html():
    html = b"<html><head><script>var x=1;</script></head><body><p>Hi &amp; bye</p></body></html>"
    assert textnorm.normalize(textnorm.strip_html(html)) == "hi & bye"


def test_extract_prefers_text():
    assert textnorm.extract_text(b"<p>from html</p>", "From Text") == "from text"
    assert textnorm.extract_text(b"<p>from html</p>", None) == "from html"
    assert textnorm.extract_text(None, None) == ""


def test_token_counts_sorted():
    dl, counts = textnorm.token_counts("b a b c a b")
    assert dl == 6
    assert counts == [("a", 2), ("b", 3), ("c", 1)]


def test_extraction_golden_hash():
    """Byte-identical invariant: sha256 of the concatenated normalized text
    of the first 100 fixture docs is pinned. If tokenization/normalization
    ever changes, this fails and goldens must be regenerated consciously."""
    pdf = make_webtext_pdf(100, seed=42)
    h = hashlib.sha256()
    for _, row in pdf.iterrows():
        h.update(textnorm.extract_text(row["html"], row["text"]).encode("utf-8"))
        h.update(b"\x1f")
    digest = h.hexdigest()
    import json, pathlib

    golden_path = pathlib.Path(__file__).parent / "golden" / "extract_hash.json"
    if not golden_path.exists():
        golden_path.write_text(json.dumps({"sha256": digest}))
    assert json.loads(golden_path.read_text())["sha256"] == digest


def test_fixture_determinism():
    a = make_webtext_pdf(200, seed=42)
    b = make_webtext_pdf(200, seed=42)
    assert a.equals(b)
    assert (a["text"].isna().mean()) > 0.01  # some html-only rows
    assert a["url"].duplicated().any()  # recrawls exist


def test_fast_token_counts_equivalence():
    """fast_token_counts must be token-stream-equivalent to
    token_counts(extract_text(...)) — same doclen, same (term, tf) set —
    on fixtures AND adversarial unicode/NUL/whitespace cases."""
    from hypothesis import given, settings, strategies as st

    cases = [
        (None, None),
        (None, ""),
        (None, "a\x00b c d  e\tf"),
        (None, "Ｆｕｌｌｗｉｄｔｈ１２３ and ﬁligature"),
        (b"<html><script>no()</script><p>Hi &amp; bye</p></html>", None),
        (b"\xff\xfe broken <b>utf8</b>", None),
        (None, "x" * 5 + "\x00" + "y" * 5),
    ]
    pdf = make_webtext_pdf(300, seed=7)
    cases += list(zip(pdf["html"], pdf["text"]))
    for h, t in cases:
        h = h if isinstance(h, (bytes, bytearray)) else None
        t = t if isinstance(t, str) else None
        dl_slow, counts_slow = textnorm.token_counts(textnorm.extract_text(h, t))
        dl_fast, counts_fast = textnorm.fast_token_counts(h, t)
        assert dl_fast == dl_slow
        assert sorted(counts_fast) == counts_slow

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=120))
    def prop(t):
        dl_slow, counts_slow = textnorm.token_counts(textnorm.extract_text(None, t))
        dl_fast, counts_fast = textnorm.fast_token_counts(None, t)
        assert dl_fast == dl_slow
        assert sorted(counts_fast) == counts_slow

    prop()


def test_batch_token_stream_equivalence():
    """The Arrow batch tokenizer must produce EXACTLY the per-doc fast path's
    (doclen, {term: tf}) per document — including non-ASCII fallback docs,
    NULs, html-only docs, empties — and globally doc-ascending postings
    (the splice-merge invariant). Positions must match the positional path."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    cases = [
        (None, None),
        (None, ""),
        (None, "a\x00b c d  e\tf"),
        (None, "Ｆｕｌｌｗｉｄｔｈ１２３ and ﬁligature"),
        (b"<html><script>no()</script><p>Hi &amp; bye</p></html>", None),
        (b"\xff\xfe broken <b>utf8</b>", None),
        (None, "x" * 5 + "\x00" + "y" * 5),
        (None, "café naïve ™ mixed ascii words"),
    ]
    pdf = make_webtext_pdf(300, seed=11)
    cases += list(zip(pdf["html"], pdf["text"]))
    htmls = [h if isinstance(h, (bytes, bytearray)) else None for h, _ in cases]
    texts = [t if isinstance(t, str) else None for _, t in cases]

    dls, doc_idx, codes, tfs, uniq, _ = textnorm.batch_token_stream(htmls, texts)
    assert (np.diff(doc_idx) >= 0).all()
    for i, (h, t) in enumerate(zip(htmls, texts)):
        dl_ref, counts_ref = textnorm.fast_token_counts(h, t)
        m = doc_idx == i
        got = {uniq[c]: int(v) for c, v in zip(codes[m], tfs[m])}
        assert got == dict(counts_ref), i
        assert int(dls[i]) == dl_ref, i

    dls, doc_idx, codes, tfs, uniq, pos = textnorm.batch_token_stream(
        htmls, texts, with_positions=True
    )
    st_off = np.zeros(tfs.size, dtype=np.int64)
    np.cumsum(tfs[:-1], out=st_off[1:])
    for i, (h, t) in enumerate(zip(htmls, texts)):
        dl_ref, items = textnorm.fast_token_positions(h, t)
        exp = {term: (tfv, list(ps)) for term, tfv, ps in items}
        got = {
            uniq[codes[j]]: (int(tfs[j]), pos[st_off[j] : st_off[j] + tfs[j]].tolist())
            for j in np.flatnonzero(doc_idx == i)
        }
        assert got == exp, i
        assert int(dls[i]) == dl_ref, i

    @settings(max_examples=100, deadline=None)
    @given(st.lists(st.text(max_size=80), max_size=8))
    def prop(ts):
        hs = [None] * len(ts)
        dls, doc_idx, codes, tfs, uniq, _ = textnorm.batch_token_stream(hs, ts)
        for i, t in enumerate(ts):
            dl_ref, counts_ref = textnorm.fast_token_counts(None, t)
            m = doc_idx == i
            got = {uniq[c]: int(v) for c, v in zip(codes[m], tfs[m])}
            assert got == dict(counts_ref)
            assert int(dls[i]) == dl_ref

    prop()
