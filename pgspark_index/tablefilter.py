"""Config-driven table filtering with wildcards + wildcard source discovery.

Re-expresses two reference components:
- the WAL table filter's include/exclude rule engine
  (/root/reference/pkg/wal/processor/filter/wal_filter.go:131-219):
  wildcards `schema.*` and `*.*`; precedence
  exclude > exact-include > schema-only > wildcard-include;
- the snapshot table finder's wildcard expansion against live catalogs
  (/root/reference/pkg/snapshot/generator/postgres/tablefinder/
  pg_snapshot_table_finder.go:70-151).

Two equivalent forms are provided:
- ``table_allowed`` — pure-Python predicate (unit-testable rule engine);
- ``allowed_expr`` — the same precedence compiled to ONE Spark Column
  expression (JVM-side, pushdown-friendly) for filtering relations of
  (schema, table) rows at any scale. The expression uses only equality/IN
  and CASE, so a SQL oracle can replicate it exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class FilterConfig:
    """include/exclude entries are 'schema.table', 'schema.*' or '*.*';
    schema_only lists schemas whose DDL flows but whose data doesn't
    (mapped here to: tables excluded, schema recorded)."""

    include: list[str] = field(default_factory=list)
    exclude: list[str] = field(default_factory=list)
    schema_only: list[str] = field(default_factory=list)

    def _split(self, entries: list[str]) -> tuple[set[tuple[str, str]], set[str], bool]:
        exact, schema_wild, all_wild = set(), set(), False
        for e in entries:
            s, _, t = e.partition(".")
            if s == "*" and t == "*":
                all_wild = True
            elif t == "*":
                schema_wild.add(s)
            else:
                exact.add((s, t))
        return exact, schema_wild, all_wild


def table_allowed(cfg: FilterConfig, schema: str, table: str) -> bool:
    """Reference precedence (wal_filter.go:131-219):
    1. any exclude match (exact, schema.*, *.*) -> denied
    2. exact include -> allowed
    3. schema listed in schema_only -> data denied
    4. wildcard include (schema.* or *.*) -> allowed
    5. default: denied when an include list exists, allowed otherwise."""
    ex_exact, ex_schema, ex_all = cfg._split(cfg.exclude)
    in_exact, in_schema, in_all = cfg._split(cfg.include)
    if ex_all or schema in ex_schema or (schema, table) in ex_exact:
        return False
    if (schema, table) in in_exact:
        return True
    if schema in cfg.schema_only:
        return False
    if in_all or schema in in_schema:
        return True
    return not (in_exact or in_schema or in_all)


def allowed_expr(cfg: FilterConfig, schema_col: str = "schema", table_col: str = "table") -> Column:
    """The same precedence as ONE Column expression over (schema, table)."""
    s, t = F.col(schema_col), F.col(table_col)
    qual = F.concat_ws(".", s, t)
    ex_exact, ex_schema, ex_all = cfg._split(cfg.exclude)
    in_exact, in_schema, in_all = cfg._split(cfg.include)

    def _in(col, values):
        return col.isin(sorted(values)) if values else F.lit(False)

    excluded = (
        F.lit(ex_all)
        | _in(s, ex_schema)
        | _in(qual, {f"{a}.{b}" for a, b in ex_exact})
    )
    exact_inc = _in(qual, {f"{a}.{b}" for a, b in in_exact})
    schema_only = _in(s, set(cfg.schema_only))
    wild_inc = F.lit(in_all) | _in(s, in_schema)
    default = F.lit(not (in_exact or in_schema or in_all))
    return F.when(excluded, F.lit(False)).otherwise(
        F.when(exact_inc, F.lit(True)).otherwise(
            F.when(schema_only, F.lit(False)).otherwise(
                F.when(wild_inc, F.lit(True)).otherwise(default)
            )
        )
    )


def filter_tables(df: DataFrame, cfg: FilterConfig, schema_col: str = "schema", table_col: str = "table") -> DataFrame:
    return df.filter(allowed_expr(cfg, schema_col, table_col))


def find_tables(
    catalog: list[tuple[str, str]] | DataFrame, patterns: list[str]
) -> list[tuple[str, str]]:
    """Expand wildcard patterns against a catalog listing of
    (schema, table) — the table finder. ``catalog`` is a list or a
    DataFrame with (schema, table) columns (e.g. from
    spark.catalog.listTables per database)."""
    if isinstance(catalog, DataFrame):
        rows = [(r[0], r[1]) for r in catalog.select("schema", "table").collect()]
    else:
        rows = list(catalog)
    out = []
    pats = [p.partition(".") for p in patterns]
    for schema, table in rows:
        for ps, _, pt in pats:
            if (ps == "*" or ps == schema) and (pt == "*" or pt == table):
                out.append((schema, table))
                break
    return sorted(set(out))
