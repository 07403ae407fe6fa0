"""``CREATE DYNAMIC TABLE`` DDL surface: accept the reference's
verbatim SQL text and infer the maintenance metadata.

The reference's entire view interface is ONE DDL string
(``notebooks/0_start_here.ipynb`` cell ``create_dynamic_table``)::

    CREATE OR REPLACE DYNAMIC TABLE cdc_prod.analytics.customer_purchase_summary
    TARGET_LAG = '1 minute'
    WAREHOUSE = cdc_ds_wh
    REFRESH_MODE = INCREMENTAL
    AS SELECT ... FROM CONNECTOR_DEST_DB."raw_cdc"."transactions" t
    JOIN ... c ON t.customer_id = c.customer_id ...

A Snowflake user never supplies fact/dim metadata -- the engine works
it out from the query.  This parser does the same for the star-join
shape the incremental maintainer supports:

- **name**: last component of the qualified identifier;
- **properties**: TARGET_LAG (lag SLO), REFRESH_MODE
  (incremental|full), WAREHOUSE (accepted and recorded; compute
  binding is a documented no-op, SURVEY.md C6);
- **fact table**: the FROM-clause table;
- **dims**: each JOINed table, keyed by the equi-conjunct that links
  it to the fact alias (extra cross-dimension conjuncts like
  ``m.merchant_category = p.product_category`` ride along in the query
  itself -- they don't define the merge key);
- **fact/view key**: the first projected bare fact column;
- table references are rewritten to bare names so the defining query
  runs over the store's temp views.

Anything outside that shape (no bare fact column in the projection, a
JOIN with no fact equi-conjunct, GROUP BY with INCREMENTAL) raises a
loud ``ValueError`` instead of silently maintaining a wrong view --
use ``REFRESH_MODE = FULL`` or the explicit-metadata API for those.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_IDENT = r'(?:[A-Za-z_][\w$]*|"[^"]+")'
_TABLE_REF = rf"{_IDENT}(?:\s*\.\s*{_IDENT})*"
_RESERVED = {
    "join", "inner", "left", "right", "full", "cross", "on", "where",
    "group", "order", "having", "limit", "union", "as",
}


def _bare(ref: str) -> str:
    """Last component of a qualified identifier, unquoted."""
    return re.split(r"\s*\.\s*", ref.strip())[-1].strip('"')


@dataclass
class ParsedDynamicTableDDL:
    name: str
    target_lag: str
    refresh_mode: str
    warehouse: str | None
    select_sql: str  # rewritten to bare table names
    fact_table: str
    fact_key: str
    view_key: str
    dims: dict[str, tuple[str, str]]


def parse_dynamic_table_ddl(ddl: str) -> ParsedDynamicTableDDL:
    s = ddl.strip().rstrip(";").strip()
    head = re.match(
        rf"(?is)^CREATE\s+(?:OR\s+REPLACE\s+)?DYNAMIC\s+TABLE\s+({_TABLE_REF})", s
    )
    if not head:
        raise ValueError("not a CREATE [OR REPLACE] DYNAMIC TABLE statement")
    name = _bare(head.group(1))
    rest = s[head.end():]
    body = re.search(r"(?is)\bAS\b\s*(SELECT\b.*)$", rest)
    if not body:
        raise ValueError("missing AS SELECT body")
    props, select_sql = rest[: body.start()], body.group(1)

    def prop(pattern: str) -> str | None:
        m = re.search(pattern, props, re.I)
        return m.group(1) if m else None

    target_lag = prop(r"TARGET_LAG\s*=\s*'([^']+)'") or "1 minute"
    refresh_mode = (prop(r"REFRESH_MODE\s*=\s*(\w+)") or "INCREMENTAL").lower()
    warehouse = prop(r"WAREHOUSE\s*=\s*(\w+)")
    if refresh_mode not in ("incremental", "full"):
        raise ValueError(f"unsupported REFRESH_MODE {refresh_mode!r}")

    # ---- join tree ---------------------------------------------------------
    def _alias(raw: str | None, table: str) -> str:
        if raw and raw.lower() not in _RESERVED:
            return raw
        return table

    from_m = re.search(
        rf"(?is)\bFROM\s+({_TABLE_REF})(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?", select_sql
    )
    if not from_m:
        raise ValueError("missing FROM clause")
    fact_table = _bare(from_m.group(1))
    fact_alias = _alias(from_m.group(2), fact_table)

    refs_to_rewrite = {from_m.group(1)}
    alias_to_table = {fact_alias: fact_table}
    dims: dict[str, tuple[str, str]] = {}
    join_iter = list(
        re.finditer(
            rf"(?is)\bJOIN\s+({_TABLE_REF})(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?\s+ON\s+"
            r"(.*?)(?=\b(?:JOIN|LEFT|RIGHT|INNER|WHERE|GROUP|ORDER|LIMIT)\b|$)",
            select_sql,
        )
    )
    for jm in join_iter:
        table = _bare(jm.group(1))
        alias = _alias(jm.group(2), table)
        alias_to_table[alias] = table
        refs_to_rewrite.add(jm.group(1))
        link = None
        for conj in re.split(r"(?i)\bAND\b", jm.group(3)):
            eq = re.match(
                r"\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*=\s*([A-Za-z_]\w*)\.([A-Za-z_]\w*)\s*$",
                conj.strip(),
            )
            if not eq:
                continue
            a1, c1, a2, c2 = eq.groups()
            if a1 == fact_alias and a2 == alias:
                link = (c1, c2)
            elif a2 == fact_alias and a1 == alias:
                link = (c2, c1)
        if link is None:
            raise ValueError(
                f"JOIN of {table!r} has no equi-conjunct with the fact table "
                f"{fact_table!r}; incremental maintenance needs a fact-keyed "
                "star join -- use REFRESH_MODE = FULL or the explicit API"
            )
        dims[table] = link

    # ---- merge key: first projected bare fact column -----------------------
    select_list = re.match(r"(?is)SELECT\s+(.*?)\bFROM\b", select_sql).group(1)
    fact_key = view_key = None
    for item in select_list.split(","):
        m = re.match(
            rf"\s*{re.escape(fact_alias)}\.([A-Za-z_]\w*)"
            r"(?:\s+AS\s+([A-Za-z_]\w*))?\s*$",
            item.strip(),
            re.I,
        )
        if m:
            fact_key = m.group(1)
            view_key = m.group(2) or m.group(1)
            break
    if fact_key is None:
        raise ValueError(
            "no bare fact column in the projection to use as the merge key; "
            "incremental maintenance cannot anchor this view -- use "
            "REFRESH_MODE = FULL or the explicit API"
        )
    if refresh_mode == "incremental" and re.search(r"(?i)\bGROUP\s+BY\b", select_sql):
        raise ValueError(
            "GROUP BY in a DDL-defined view needs an explicit group_col for "
            "incremental maintenance; use dynamic_table_from_sql(group_col=...) "
            "or REFRESH_MODE = FULL"
        )

    # ---- rewrite qualified references to bare store names ------------------
    for ref in sorted(refs_to_rewrite, key=len, reverse=True):
        select_sql = select_sql.replace(ref, _bare(ref))

    return ParsedDynamicTableDDL(
        name=name,
        target_lag=target_lag,
        refresh_mode=refresh_mode,
        warehouse=warehouse,
        select_sql=select_sql,
        fact_table=fact_table,
        fact_key=fact_key,
        view_key=view_key,
        dims=dims,
    )
