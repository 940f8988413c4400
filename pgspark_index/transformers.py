"""Deterministic column-transformer catalog + rule map.

Spark-first re-expression of pgstream's transformer system
(/root/reference/pkg/transformers/transformer.go:11-63 — 25 scalar
transformer types with per-column rules, dynamic multi-column parameters,
and deterministic hash-based generators,
pkg/transformers/generators/deterministic_bytes_generator.go:9-16; rule
wiring and validation modes in
pkg/wal/processor/transformer/wal_transformer.go:42-55,110-195).

Each transformer here is a pure Spark Column expression (JVM-side,
whole-stage codegen — the fast path; pandas UDFs are reserved for kernels
SQL can't express). Determinism mirrors the reference: same input row ->
same output, no RNG, hashes only. Every transformer is also expressible in
ANSI-ish SQL, so the driver's DuckDB oracle can verify the rule map
bit-for-bit (hash60 = md5-derived 60-bit int, identical in both engines).

Catalog (reference analog in parens):
- masking          (pkg/transformers masking): keep first/last n chars,
                   mask the middle with '*'
- hash_email       (neosync_email): md5 the local part, keep the domain
- literal_string   (literal_string): constant replacement
- template         (template): format-string over OTHER columns of the
                   same row — the dynamic-parameters feature
                   (transformer.go:178-216)
- hash_int         (greenmask_integer, deterministic mode): 60-bit
                   md5-derived integer fingerprint
- normalize_text   (sanitizer + string): lower, strip NULs, collapse
                   whitespace, trim
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash60(col) -> Column:
    """md5-derived 60-bit int — reproducible in DuckDB as
    ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def masking(col: Column, keep_first: int = 2, keep_last: int = 2) -> Column:
    """Mask all but the first/last n chars with '*' (short values fully
    masked)."""
    c = col.cast("string")
    n = F.length(c)
    masked = F.concat(
        F.substring(c, 1, keep_first),
        F.repeat(F.lit("*"), F.greatest(n - keep_first - keep_last, F.lit(0))),
        F.when(n > keep_first + keep_last, F.substring(c, -keep_last, keep_last))
        .otherwise(F.lit("")),
    )
    return F.when(n <= keep_first + keep_last, F.repeat(F.lit("*"), n)).otherwise(masked)


def hash_email(col: Column) -> Column:
    """Deterministic email anonymization: md5 the local part (12 hex
    chars), keep the domain — the neosync_email shape."""
    c = col.cast("string")
    local = F.substring_index(c, "@", 1)
    domain = F.substring_index(c, "@", -1)
    return F.concat(F.substring(F.md5(local), 1, 12), F.lit("@"), domain)


def literal_string(value: str) -> Column:
    return F.lit(value)


def template(fmt: str, *cols: Column) -> Column:
    """printf-style template over other columns of the same row — the
    dynamic multi-column parameter surface."""
    return F.format_string(fmt, *cols)


def hash_int(col: Column) -> Column:
    return hash60(col.cast("string"))


def normalize_text(col: Column) -> Column:
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col.cast("string")), "\x00", ""), r"\s+", " "
        )
    )


# rule spec: {"type": <name>, ...params}; "template" takes fmt + cols
_CATALOG = {
    "masking": lambda df, spec, col: masking(
        F.col(col), spec.get("keep_first", 2), spec.get("keep_last", 2)
    ),
    "hash_email": lambda df, spec, col: hash_email(F.col(col)),
    "literal_string": lambda df, spec, col: literal_string(spec["value"]),
    "template": lambda df, spec, col: template(
        spec["fmt"], *[F.col(c) for c in spec.get("cols", [col])]
    ),
    "hash_int": lambda df, spec, col: hash_int(F.col(col)),
    "normalize_text": lambda df, spec, col: normalize_text(F.col(col)),
}

CATALOG_TYPES = sorted(_CATALOG)


def apply_rules(
    df: DataFrame, rules: dict[str, dict], validation: str = "strict"
) -> DataFrame:
    """Apply a column -> transformer-spec rule map.

    ``validation``: "strict" errors on a rule naming a missing column or an
    unknown transformer type; "relaxed" skips such rules — the reference's
    strict/relaxed table-level validation modes
    (wal_transformer.go:42-55)."""
    out = df
    exprs = {}
    for col, spec in rules.items():
        ttype = spec.get("type")
        if col not in df.columns:
            if validation == "strict":
                raise ValueError(f"transform rule targets missing column {col!r}")
            continue
        maker = _CATALOG.get(ttype)
        if maker is None:
            if validation == "strict":
                raise ValueError(f"unknown transformer type {ttype!r} for {col!r}")
            continue
        exprs[col] = maker(df, spec, col)
    if exprs:
        out = out.withColumns(exprs)
    return out
