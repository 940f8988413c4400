"""Deterministic text extraction / normalization / tokenization.

The pgstream analog is the deterministic transformer system
(/root/reference/pkg/transformers/generators/deterministic_bytes_generator.go:9-16
— same input must always produce the same output) and the string sanitizer
(/root/reference/pkg/wal/processor/sanitizer/wal_sanitizer.go:15-60 — strips
NUL bytes). Our invariant (BASELINE.json input_hint): extracted text is
byte-identical per url across runs, machines and parallelism levels, so we
pin everything to pure CPython stdlib (unicodedata NFKC, html.unescape,
re) — no environment-dependent libraries.

These functions are used by three independent consumers which must agree
exactly: the Spark vectorized UDF stages (extract.py), the numpy
brute-force oracle (oracle.py), and — for the driver's DuckDB correctness
gate — an equivalent SQL spelling (``lower`` + ``regexp_extract_all
('[a-z0-9]+')``), which is exact on the ASCII test corpora.
"""

from __future__ import annotations

import html as _html
import re
import unicodedata

# Tokens are maximal runs of ASCII lowercase alphanumerics AFTER NFKC +
# lower(). Chosen so the DuckDB oracle spelling
#   regexp_extract_all(lower(text), '[a-z0-9]+')
# is byte-equal on ASCII input.
TOKEN_RE = re.compile(r"[a-z0-9]+")

_NUL_RE = re.compile("\x00")
_WS_RE = re.compile(r"\s+")
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAG_RE = re.compile(r"<[^>]*>")


def strip_html(html_bytes: bytes) -> str:
    """HTML bytes -> visible text. Deterministic, stdlib-only.

    Drops <script>/<style> subtrees, replaces remaining tags with a space,
    unescapes entities. This is the fallback path for rows whose ``text``
    column is NULL (html-only documents).
    """
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _SCRIPT_STYLE_RE.sub(" ", raw)
    raw = _TAG_RE.sub(" ", raw)
    return _html.unescape(raw)


def normalize(text: str) -> str:
    """Unicode NFKC -> lower -> strip NULs -> collapse whitespace.

    The NUL strip mirrors pgstream's sanitizer (Postgres rejects 0x00 in
    text); the whole chain is the deterministic-transform invariant.
    """
    t = unicodedata.normalize("NFKC", text)
    t = t.lower()
    t = _NUL_RE.sub("", t)
    t = _WS_RE.sub(" ", t).strip()
    return t


def extract_text(html_bytes: bytes | None, text: str | None) -> str:
    """Canonical extracted+normalized text for one document.

    Prefers the pre-extracted ``text`` column; falls back to stripping
    ``html``. Returns "" when both are NULL (doc indexes as empty).
    """
    if text is not None:
        return normalize(text)
    if html_bytes is not None:
        return normalize(strip_html(html_bytes))
    return ""


def tokenize(norm_text: str) -> list[str]:
    """Normalized text -> token list (maximal [a-z0-9]+ runs)."""
    return TOKEN_RE.findall(norm_text)


def token_counts(norm_text: str) -> tuple[int, list[tuple[str, int]]]:
    """-> (doclen, [(term, tf)] sorted by term).

    Sorted-by-term output is load-bearing: BM25 scores are accumulated in
    sorted term order everywhere (engine, oracle, SQL) so float64 sums are
    bit-identical — the rank-identity requirement.
    """
    toks = tokenize(norm_text)
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    return len(toks), sorted(counts.items())


def fast_token_counts(
    html_bytes: bytes | None, text: str | None
) -> tuple[int, list[tuple[str, int]]]:
    """Hot-path tokenizer: TOKEN-STREAM-EQUIVALENT to
    ``token_counts(extract_text(html, text))`` but ~2x faster.

    Safe shortcuts (each provably token-invariant, property-tested in
    tests/test_textnorm.py):
    - whitespace collapse + strip skipped — ``[a-z0-9]+`` runs can never
      span whitespace, so collapsing separators changes nothing;
    - NUL strip only when a NUL is present (C-scan ``in`` check) — NULs DO
      merge adjacent runs ("a\\x00b" -> "ab"), so the strip itself is kept;
    - counting via collections.Counter (C-accelerated) and returned
      UNSORTED — per-doc term order is irrelevant to the index build (the
      flush lexsort orders postings); query-side score accumulation order
      comes from the sorted lexicon, not from here.
    """
    from collections import Counter

    if text is not None:
        t = text
    elif html_bytes is not None:
        t = strip_html(html_bytes)
    else:
        return 0, []
    t = unicodedata.normalize("NFKC", t).lower()
    if "\x00" in t:
        t = t.replace("\x00", "")
    toks = TOKEN_RE.findall(t)
    return len(toks), list(Counter(toks).items())


def batch_token_stream(htmls, texts, with_positions: bool = False):
    """Arrow-vectorized batch tokenizer over python lists (the original
    entry point — salt planning and tests). Input: aligned sequences of
    html (bytes|None) and text (str|None). Returns ``(doclens, doc_idx,
    codes, tfs, uniques, pos_flat)`` with ``uniques`` as an OBJECT numpy
    array (may contain duplicates across the ascii/fallback sections —
    consumers factorize/group by string). See _token_stream_core for the
    tokenization semantics and batch_token_stream_arrow for the
    Arrow-native build-path variant."""
    import numpy as np
    import pyarrow as pa

    resolved = []
    for h, t in zip(htmls, texts):
        if isinstance(t, str):
            resolved.append(t)
        elif isinstance(h, (bytes, bytearray)):
            resolved.append(strip_html(h))
        else:
            resolved.append("")
    arr = pa.array(resolved, type=pa.string())
    dl, di, co, tf, uniq_arrow, pos = _token_stream_core(
        arr, resolved.__getitem__, with_positions
    )
    uniques = (
        np.asarray(uniq_arrow.to_pylist(), dtype=object)
        if len(uniq_arrow)
        else np.zeros(0, dtype=object)
    )
    return dl, di, co, tf, uniques, pos


def batch_token_stream_arrow(html_arr, text_arr, with_positions: bool = False):
    """Arrow-native batch tokenizer (the build hot path): input columns stay
    Arrow end-to-end — NO per-document Python string objects are created
    for ASCII text rows (the overwhelming majority of webtext), which cuts
    the tokenize stage's allocation/GC and memory traffic (the contended
    resource when many build workers share one socket).

    ``text_arr``: pa.StringArray (null -> html fallback); ``html_arr``:
    pa.BinaryArray or None. Returns the batch_token_stream tuple but with
    ``uniques`` as a pyarrow StringArray."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(text_arr)
    tvalid = pc.is_valid(text_arr)
    if n and not pc.all(tvalid).as_py():
        tv = tvalid.to_numpy(zero_copy_only=False)
        miss = np.flatnonzero(~tv)
        # html-only docs (minority): python strip_html per doc, scattered
        # back via if_else — text rows never touch Python
        sparse = np.full(n, None, dtype=object)
        for i in miss:
            h = (
                html_arr[int(i)].as_py()
                if html_arr is not None and html_arr[int(i)].is_valid
                else None
            )
            sparse[i] = strip_html(h) if h is not None else ""
        arr = pc.if_else(tvalid, text_arr, pa.array(sparse, type=pa.string()))
    else:
        arr = text_arr

    def resolve(i: int) -> str:
        v = arr[int(i)].as_py()
        return v if v is not None else ""

    return _token_stream_core(arr, resolve, with_positions)


def _token_stream_core(arr, resolve_fb, with_positions: bool = False):
    """Shared tokenizer core: the whole normalize -> lower -> split ->
    count pipeline runs in Arrow C++ kernels (one call per BATCH, zero
    per-token Python objects) for ASCII documents — ~10x the per-doc
    path, measured. Non-ASCII documents (where NFKC is not the identity)
    take the pinned per-doc CPython path (``resolve_fb(i)`` supplies the
    raw resolved text), so the token stream is EXACTLY
    ``fast_token_counts``/``fast_token_positions`` per document — the
    byte-identical-extraction invariant (BASELINE.json input_hint) holds
    bit-for-bit. Property-tested against the per-doc path in
    tests/test_textnorm.py.

    ``arr``: pa.StringArray of resolved text (nulls treated as "").
    Returns ``(doclens, doc_idx, codes, tfs, uniques, pos_flat)``:

    - doclens  int64[n_docs]   token count per input doc (post-LWW rows)
    - doc_idx  int64[n_post]   posting -> input row index, ascending
    - codes    int64[n_post]   posting -> index into ``uniques``
    - tfs      int64[n_post]   term frequency
    - uniques  pa.StringArray  term strings (MAY contain duplicates across
      the ascii/fallback sections — consumers factorize/group)
    - pos_flat int64[sum tfs]  ascending token positions per posting,
      posting-major (``None`` unless ``with_positions``)
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n = len(arr)
    if arr.null_count:
        arr = arr.fill_null("")
    ascii_mask = pc.string_is_ascii(arr)
    fb_idx = np.zeros(0, dtype=np.int64)
    if n and not pc.all(ascii_mask).as_py():
        ascii_np = ascii_mask.to_numpy(zero_copy_only=False)
        fb_idx = np.flatnonzero(~ascii_np)
        arr = pc.if_else(ascii_mask, arr, pa.scalar("", type=pa.string()))
    # NUL strip mirrors the sanitizer; on ASCII input NFKC is the identity,
    # so ascii_lower + [a-z0-9]+ runs == the full normalize chain.
    arr = pc.replace_substring(arr, "\x00", "")
    toks = pc.split_pattern_regex(pc.ascii_lower(arr), "[^a-z0-9]+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    keep = pc.not_equal(flat, "")  # split artifacts at run boundaries
    flat = flat.filter(keep)
    parent = parent[keep.to_numpy(zero_copy_only=False)]
    nt = len(flat)
    doclens = np.bincount(parent, minlength=n).astype(np.int64)
    if nt:
        denc = pc.dictionary_encode(flat)
        codes_tok = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        uniques = denc.dictionary  # stays ARROW — no python string objects
    else:
        codes_tok = np.zeros(0, dtype=np.int64)
        uniques = pa.array([], type=pa.string())
    U = max(1, len(uniques))
    comp = parent * U + codes_tok  # (doc, term) composite; parent ascending
    pos_flat = None
    if with_positions and nt:
        doc_starts = np.concatenate(([0], np.flatnonzero(parent[1:] != parent[:-1]) + 1))
        doc_counts = np.diff(np.append(doc_starts, nt))
        pos_tok = np.arange(nt, dtype=np.int64) - np.repeat(doc_starts, doc_counts)
        # stable order by (doc, term) keeps positions ascending per posting
        kbits = max(1, int(nt - 1).bit_length())
        if int(comp[-1]) < (1 << (62 - kbits)):
            comp2 = (comp << np.int64(kbits)) | np.arange(nt, dtype=np.int64)
            comp2.sort()
            order = comp2 & np.int64((1 << kbits) - 1)
            comp = comp2 >> np.int64(kbits)
        else:
            order = np.argsort(comp, kind="stable")
            comp = comp[order]
        pos_flat = pos_tok[order]
    else:
        comp.sort()
    if nt:
        starts = np.concatenate(([0], np.flatnonzero(comp[1:] != comp[:-1]) + 1))
        tfs = np.diff(np.append(starts, nt))
        pkeys = comp[starts]
        doc_idx = pkeys // U
        codes = pkeys % U
    else:
        starts = np.zeros(0, dtype=np.int64)
        tfs = np.zeros(0, dtype=np.int64)
        doc_idx = np.zeros(0, dtype=np.int64)
        codes = np.zeros(0, dtype=np.int64)
    if fb_idx.size:
        # non-ASCII docs: pinned per-doc path, then a stable re-sort by doc
        # so postings stay globally doc-ascending (the splice invariant)
        f_doc, f_code, f_tf, f_uniq, f_pos = [], [], [], [], []
        voff = len(uniques)
        for i in fb_idx:
            if with_positions:
                dl, items = fast_token_positions(None, resolve_fb(int(i)))
                for term, tfv, ps in items:
                    f_uniq.append(term)
                    f_code.append(voff)
                    voff += 1
                    f_doc.append(i)
                    f_tf.append(tfv)
                    f_pos.extend(ps)
            else:
                dl, counts = fast_token_counts(None, resolve_fb(int(i)))
                for term, tfv in counts:
                    f_uniq.append(term)
                    f_code.append(voff)
                    voff += 1
                    f_doc.append(i)
                    f_tf.append(tfv)
            doclens[i] = dl
        if f_code:
            uniques = pa.concat_arrays(
                [uniques, pa.array(f_uniq, type=pa.string())]
            )
            doc_idx = np.concatenate((doc_idx, np.asarray(f_doc, dtype=np.int64)))
            codes = np.concatenate((codes, np.asarray(f_code, dtype=np.int64)))
            old_tfs = tfs
            tfs = np.concatenate((tfs, np.asarray(f_tf, dtype=np.int64)))
            order = np.argsort(doc_idx, kind="stable")
            if with_positions:
                pos_parts = (
                    [pos_flat] if pos_flat is not None and pos_flat.size else []
                ) + [np.asarray(f_pos, dtype=np.int64)]
                pos_all = np.concatenate(pos_parts)
                # ragged gather of position slices into the new posting order
                st = np.zeros(tfs.size, dtype=np.int64)
                np.cumsum(tfs[:-1], out=st[1:])
                lens = tfs[order]
                out_starts = np.zeros(lens.size, dtype=np.int64)
                np.cumsum(lens[:-1], out=out_starts[1:])
                total = int(lens.sum())
                gidx = (
                    np.repeat(st[order], lens)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(out_starts, lens)
                )
                pos_flat = pos_all[gidx]
                del old_tfs
            doc_idx = doc_idx[order]
            codes = codes[order]
            tfs = tfs[order]
    return doclens, doc_idx, codes, tfs, uniques, pos_flat


def fast_token_positions(
    html_bytes: bytes | None, text: str | None
) -> tuple[int, list[tuple[str, int, list[int]]]]:
    """Positional variant of fast_token_counts:
    -> (doclen, [(term, tf, ascending 0-based token positions)]).

    Same normalization shortcuts as fast_token_counts (token-stream
    equivalent to the slow path); positions are token indices in the
    normalized stream — the coordinates phrase/proximity queries match on
    (Lucene text-field position semantics)."""
    if text is not None:
        t = text
    elif html_bytes is not None:
        t = strip_html(html_bytes)
    else:
        return 0, []
    t = unicodedata.normalize("NFKC", t).lower()
    if "\x00" in t:
        t = t.replace("\x00", "")
    toks = TOKEN_RE.findall(t)
    d: dict[str, list[int]] = {}
    for i, tok in enumerate(toks):
        ps = d.get(tok)
        if ps is None:
            d[tok] = [i]
        else:
            ps.append(i)
    return len(toks), [(tok, len(ps), ps) for tok, ps in d.items()]
