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
