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

Catalog (reference analog in parens; transformer.go:38-63 lists the 25
reference types — every deterministic one is re-expressed here):
- masking          (masking): keep first/last n chars, mask middle with '*'
- hash_email       (neosync_email): md5 the local part, keep the domain
- email            (email): as hash_email, optionally anonymizing the
                   domain too (email_transformer.go modes)
- literal_string   (literal_string): constant replacement
- template         (template): format-string over OTHER columns of the
                   same row — the dynamic-parameters feature
                   (transformer.go:178-216)
- hash_int         (greenmask_integer, deterministic mode): 60-bit
                   md5-derived integer fingerprint
- normalize_text   (sanitizer + string): lower, strip NULs, collapse
                   whitespace, trim
- string           (string / neosync_string / greenmask_string,
                   deterministic mode): hash-derived bounded-length string
- neosync_firstname / neosync_lastname / neosync_fullname
                   (neosync_* names): hash-indexed pick from a fixed name
                   list — deterministic per input
- phone_number     (phone_number): hash-derived +CC-NNNNNNN string
- greenmask_integer(greenmask_integer): min + hash % (max-min+1)
- greenmask_float  (greenmask_float): hash-derived uniform in [min,max), 4dp
- greenmask_uuid   (greenmask_uuid): md5 hex formatted 8-4-4-4-12
- greenmask_boolean(greenmask_boolean): hash parity
- greenmask_choice (greenmask_choice): hash-indexed pick from choices
- greenmask_unix_timestamp (greenmask_unix_timestamp): min + hash % range
- greenmask_date   (greenmask_date): epoch-day arithmetic, ISO string
- greenmask_utc_timestamp (greenmask_utc_timestamp): epoch-sec arithmetic,
                   'yyyy-MM-dd HH:mm:ss' string (session tz pinned UTC)
- keyed_hash       (encrypted_aes_siv analog): md5(key || value) — the
                   SIV property this pipeline needs is determinism under a
                   key; real AES-SIV needs a crypto lib absent here
- encrypted_aes    (encrypted_aes_siv): Spark-native aes_encrypt in ECB
                   mode (deterministic) + base64; JVM-only, verified by
                   pytest roundtrip (no DuckDB analog)
- json_ops / map_ops (json / hstore + *_transformer_operation.go): parse a
                   flat JSON object / take a map column, apply per-key
                   set / hash / delete / mask operations, re-serialize

Not carried: pg_anonymizer (delegates to a PG extension — no engine
semantics of its own).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# deterministic name pools for the neosync_* analogs (hash-indexed)
FIRST_NAMES = ["alice", "bob", "carol", "david", "erin", "frank", "grace", "henry"]
LAST_NAMES = ["smith", "jones", "chen", "garcia", "patel", "kim", "mueller", "rossi"]


def hash60(col) -> Column:
    """md5-derived 60-bit int — reproducible in DuckDB as
    ('0x' || substr(md5(x), 1, 15))::BIGINT."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _hslice(col, start: int, n: int) -> Column:
    """Integer from hex chars [start, start+n) of md5(col) — the
    deterministic-bytes generator analog
    (generators/deterministic_bytes_generator.go:9-16). DuckDB:
    ('0x' || substr(md5(x), start, n))::BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), start, n), 16, 10).cast("long")


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


def email(col: Column, keep_domain: bool = True) -> Column:
    """email_transformer.go modes: anonymize the local part always, the
    domain optionally (replaced with a hash-derived one)."""
    if keep_domain:
        return hash_email(col)
    c = col.cast("string")
    local = F.substring_index(c, "@", 1)
    domain = F.substring_index(c, "@", -1)
    return F.concat(
        F.substring(F.md5(local), 1, 12),
        F.lit("@"),
        F.substring(F.md5(domain), 1, 8),
        F.lit(".example"),
    )


def det_string(col: Column, min_len: int = 4, max_len: int = 16) -> Column:
    """Deterministic bounded-length lowercase-hex string (string /
    neosync_string / greenmask_string deterministic mode): length is
    hash-derived in [min_len, max_len], content from repeated md5."""
    span = max(max_len - min_len + 1, 1)
    ln = (F.pmod(_hslice(col, 1, 6), F.lit(span)) + F.lit(min_len)).cast("int")
    pool = F.concat(
        F.md5(col.cast("string")), F.md5(F.concat(col.cast("string"), F.lit("+")))
    )
    return pool.substr(F.lit(1), ln)


def pick(col: Column, values: list[str]) -> Column:
    """Hash-indexed deterministic pick from a fixed pool (neosync name
    generators / greenmask_choice shape)."""
    return F.element_at(
        F.array(*[F.lit(v) for v in values]),
        (F.pmod(_hslice(col, 1, 6), F.lit(len(values))) + 1).cast("int"),
    )


def phone_number(col: Column) -> Column:
    """+CC-NNNNNNN, both hash-derived, zero-padded — phone_number shape."""
    cc = F.pmod(_hslice(col, 1, 4), F.lit(98)) + 1
    num = F.pmod(_hslice(col, 5, 10), F.lit(10_000_000))
    return F.concat(F.lit("+"), cc.cast("string"), F.lit("-"), F.lpad(num.cast("string"), 7, "0"))


def greenmask_integer(col: Column, min_v: int = 0, max_v: int = 1_000_000) -> Column:
    return (F.pmod(_hslice(col, 1, 12), F.lit(max_v - min_v + 1)) + F.lit(min_v)).cast(
        "long"
    )


def greenmask_float(col: Column, min_v: float = 0.0, max_v: float = 1.0) -> Column:
    u = _hslice(col, 1, 9) / F.lit(float(16**9))  # uniform [0,1)
    return F.round(F.lit(min_v) + u * F.lit(max_v - min_v), 4)


def greenmask_uuid(col: Column) -> Column:
    h = F.md5(col.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def greenmask_boolean(col: Column) -> Column:
    return F.pmod(_hslice(col, 1, 6), F.lit(2)) == 0


def greenmask_unix_timestamp(
    col: Column, min_ts: int = 0, max_ts: int = 2_000_000_000
) -> Column:
    return (F.pmod(_hslice(col, 1, 12), F.lit(max_ts - min_ts)) + F.lit(min_ts)).cast(
        "long"
    )


def greenmask_date(col: Column, min_day: int = 0, max_day: int = 20_000) -> Column:
    """ISO date string via epoch-day arithmetic (no tz involvement)."""
    days = (F.pmod(_hslice(col, 1, 10), F.lit(max_day - min_day)) + F.lit(min_day)).cast(
        "int"
    )
    return F.date_add(F.to_date(F.lit("1970-01-01")), days).cast("string")


def greenmask_utc_timestamp(
    col: Column, min_ts: int = 0, max_ts: int = 2_000_000_000
) -> Column:
    """'yyyy-MM-dd HH:mm:ss' string via epoch-second arithmetic; session
    timezone is pinned UTC so this is tz-stable (DuckDB analog uses pure
    TIMESTAMP + INTERVAL arithmetic, no tz either)."""
    secs = greenmask_unix_timestamp(col, min_ts, max_ts)
    return F.date_format(F.timestamp_seconds(secs), "yyyy-MM-dd HH:mm:ss")


def keyed_hash(col: Column, key: str) -> Column:
    """Deterministic keyed pseudonymization — the property AES-SIV provides
    in the reference (same key + plaintext -> same token,
    encrypted_aes_siv_transformer.go); md5(key || value), hex."""
    return F.md5(F.concat(F.lit(key), col.cast("string")))


def encrypted_aes(col: Column, key: str) -> Column:
    """Spark-native deterministic encryption: aes_encrypt ECB + base64.
    ECB is the deterministic mode (SIV analog within Spark built-ins);
    JVM-only — verified by pytest decrypt-roundtrip, no SQL oracle."""
    return F.base64(F.aes_encrypt(col.cast("string"), F.lit(key), F.lit("ECB")))


def map_ops(col: Column, ops: dict[str, dict]) -> Column:
    """Per-key operations over a map<string,string> column — the hstore /
    json operation set (hstore_transformer_operation.go,
    json_transformer_operation.go): set (literal), hash, mask, delete.
    Pure map expressions: transform_values + map_filter (JVM-side)."""
    deleted = [k for k, op in ops.items() if op.get("op") == "delete"]
    out = col
    if deleted:
        dels = F.array(*[F.lit(k) for k in deleted])
        out = F.map_filter(out, lambda k, _v: ~F.array_contains(dels, k))

    def _apply(k: Column, v: Column) -> Column:
        expr = v
        for key, op in ops.items():
            kind = op.get("op")
            if kind == "set":
                expr = F.when(k == key, F.lit(str(op["value"]))).otherwise(expr)
            elif kind == "hash":
                expr = F.when(k == key, F.md5(v)).otherwise(expr)
            elif kind == "mask":
                expr = F.when(k == key, masking(v, op.get("keep_first", 1), op.get("keep_last", 1))).otherwise(expr)
        return expr

    if any(op.get("op") in ("set", "hash", "mask") for op in ops.values()):
        out = F.transform_values(out, _apply)
    # "set" is an upsert (json_transformer_operation.go set semantics):
    # add the key when absent
    for key, op in ops.items():
        if op.get("op") == "set":
            out = F.when(F.array_contains(F.map_keys(out), key), out).otherwise(
                F.map_concat(out, F.create_map(F.lit(key), F.lit(str(op["value"]))))
            )
    return out


def json_ops(col: Column, ops: dict[str, dict]) -> Column:
    """json transformer: parse a FLAT json object to map<string,string>,
    apply the op set, re-serialize with sorted keys (deterministic text).
    Nested paths are out of scope, as in the reference's flat-operation
    form (json_transformer_operation.go)."""
    m = map_ops(F.from_json(col.cast("string"), "map<string,string>"), ops)
    # to_json over map_from_arrays(sorted keys) gives canonical key order
    keys = F.array_sort(F.map_keys(m))
    vals = F.transform(keys, lambda k: F.element_at(m, k))
    return F.to_json(F.map_from_arrays(keys, vals))


# rule spec: {"type": <name>, ...params}; "template" takes fmt + cols
_CATALOG = {
    "masking": lambda df, spec, col: masking(
        F.col(col), spec.get("keep_first", 2), spec.get("keep_last", 2)
    ),
    "hash_email": lambda df, spec, col: hash_email(F.col(col)),
    "email": lambda df, spec, col: email(F.col(col), spec.get("keep_domain", True)),
    "literal_string": lambda df, spec, col: literal_string(spec["value"]),
    "template": lambda df, spec, col: template(
        spec["fmt"], *[F.col(c) for c in spec.get("cols", [col])]
    ),
    "hash_int": lambda df, spec, col: hash_int(F.col(col)),
    "normalize_text": lambda df, spec, col: normalize_text(F.col(col)),
    "string": lambda df, spec, col: det_string(
        F.col(col), spec.get("min_len", 4), spec.get("max_len", 16)
    ),
    "neosync_firstname": lambda df, spec, col: pick(F.col(col), FIRST_NAMES),
    "neosync_lastname": lambda df, spec, col: pick(F.col(col), LAST_NAMES),
    "neosync_fullname": lambda df, spec, col: F.concat_ws(
        " ", pick(F.col(col), FIRST_NAMES), pick(F.concat(F.col(col), F.lit("#")), LAST_NAMES)
    ),
    "phone_number": lambda df, spec, col: phone_number(F.col(col)),
    "greenmask_integer": lambda df, spec, col: greenmask_integer(
        F.col(col), spec.get("min", 0), spec.get("max", 1_000_000)
    ),
    "greenmask_float": lambda df, spec, col: greenmask_float(
        F.col(col), spec.get("min", 0.0), spec.get("max", 1.0)
    ),
    "greenmask_uuid": lambda df, spec, col: greenmask_uuid(F.col(col)),
    "greenmask_boolean": lambda df, spec, col: greenmask_boolean(F.col(col)),
    "greenmask_choice": lambda df, spec, col: pick(F.col(col), spec["choices"]),
    "greenmask_unix_timestamp": lambda df, spec, col: greenmask_unix_timestamp(
        F.col(col), spec.get("min", 0), spec.get("max", 2_000_000_000)
    ),
    "greenmask_date": lambda df, spec, col: greenmask_date(
        F.col(col), spec.get("min_day", 0), spec.get("max_day", 20_000)
    ),
    "greenmask_utc_timestamp": lambda df, spec, col: greenmask_utc_timestamp(
        F.col(col), spec.get("min", 0), spec.get("max", 2_000_000_000)
    ),
    "keyed_hash": lambda df, spec, col: keyed_hash(F.col(col), spec["key"]),
    "encrypted_aes": lambda df, spec, col: encrypted_aes(F.col(col), spec["key"]),
    "json": lambda df, spec, col: json_ops(F.col(col), spec["ops"]),
    "hstore": lambda df, spec, col: map_ops(F.col(col), spec["ops"]),
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
