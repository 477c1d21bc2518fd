"""``@param`` query templating + correlated query data sources.

The reference extracts ``@name`` parameters from configured SQL and binds
them from (1) global config params, then (2) the current source row
(api:conf/PreparedQuery.java:16-76), in four contexts
(api:conf/types/ParameterContextType.java:1-60): SELECT_FIELD
(``SELECT @p AS v``), COMPARE_CLAUSE (``att = @p``), IN_CLAUSE
(``att IN (@p)``), DB_RESOURCE (``FROM @tab``). An
``extraQueryDataSource`` (api:conf/QueryDataSourceConfig.java:339-350,
README.md:251-256) then runs that query once per source row to feed
destination mappings, dropping the row when ``required`` and no result.

Spark-first rewrite — the per-row correlated query becomes ONE join:

- config-bound params are substituted before planning (literals in value
  contexts, bare identifiers after FROM/JOIN) — constant for every row;
- row-bound COMPARE/IN params become join keys (equi-join, broadcast when
  the query side is a dimension);
- row-bound SELECT_FIELD params become post-join projections of source
  columns (no join needed for them at all);
- DB_RESOURCE is config-bound only — as in the reference, one prepared
  query scans one resource, it cannot vary per row.

``required=True`` ⇒ inner join (row ignored when the query returns
nothing), else left join — exactly the survey's prescription (SURVEY.md
§2.3). Supported query shape: single-table ``SELECT ... FROM ... [WHERE
...]`` — the shape the reference's extraQueryDataSource uses.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PARAM = r"@([A-Za-z_]\w*)"
_QUERY_SHAPE = re.compile(
    r"^\s*SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<tab>\S+)(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


class UnboundParamError(ValueError):
    """A ``@param`` bound neither by config params nor by a source column —
    the ForbiddenOperationException path of PreparedQuery.loadQueryParamValues."""


def sql_literal(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _split_top_level(text: str, sep: str = ",") -> list[str]:
    """Split on separators outside parentheses/quotes (select-list items)."""
    items, depth, start, in_str = [], 0, 0, False
    for i, ch in enumerate(text):
        if in_str:
            in_str = ch != "'"
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == sep and depth == 0:
            items.append(text[start:i].strip())
            start = i + 1
    items.append(text[start:].strip())
    return [s for s in items if s]


@dataclass
class ParsedQuery:
    select_items: list[str]                # residual select expressions
    table: str                             # resolved resource name
    where: str | None                      # residual WHERE (row params removed)
    join_pairs: list[tuple[str, str]]      # (query column, src row field)
    select_binds: list[tuple[str, str]]    # (output alias, src row field)


def parse_prepared_query(query: str, config_params: dict | None = None) -> ParsedQuery:
    params = config_params or {}

    # DB_RESOURCE context first: "FROM @tab" — config-bound identifier.
    def _resource(m: re.Match) -> str:
        name = m.group(2)
        if name not in params:
            raise UnboundParamError(f"DB_RESOURCE param @{name} must be config-bound")
        return m.group(1) + str(params[name])

    query = re.sub(rf"(\bFROM\s+|\bJOIN\s+)@(\w+)", _resource, query, flags=re.IGNORECASE)
    # Every other config param is a value context → SQL literal.
    query = re.sub(
        _PARAM, lambda m: sql_literal(params[m.group(1)]) if m.group(1) in params else m.group(0), query
    )

    m = _QUERY_SHAPE.match(query)
    if not m:
        raise ValueError(f"unsupported prepared-query shape: {query!r}")
    table, where = m.group("tab"), m.group("where")

    select_items, select_binds = [], []
    for item in _split_top_level(m.group("sel")):
        b = re.match(rf"^{_PARAM}(?:\s+AS\s+(\w+))?$", item, re.IGNORECASE)
        if b:
            select_binds.append((b.group(2) or b.group(1), b.group(1)))
        else:
            select_items.append(item)

    join_pairs: list[tuple[str, str]] = []
    if where:
        def _compare(mm: re.Match) -> str:
            join_pairs.append((mm.group(1), mm.group(2)))
            return "TRUE"

        # COMPARE_CLAUSE: col = @p   |   IN_CLAUSE: col IN (@p)
        where = re.sub(rf"([\w.]+)\s*=\s*{_PARAM}", _compare, where)
        where = re.sub(rf"([\w.]+)\s+IN\s*\(\s*{_PARAM}\s*\)", _compare, where, flags=re.IGNORECASE)
        leftover = re.search(_PARAM, where)
        if leftover:
            raise UnboundParamError(f"@{leftover.group(1)} not bindable in context: {where!r}")
        where = where.strip() or None
    return ParsedQuery(select_items, table, where, join_pairs, select_binds)


@dataclass
class QuerySourceConfig:
    """extraQueryDataSource: a correlated query feeding extra columns."""

    name: str
    query: str
    resources: dict[str, str] = field(default_factory=dict)  # table name → parquet path
    required: bool = False
    unique: bool = True  # one related record per source row (DAO.find contract)


def apply_query_source(
    spark: SparkSession,
    src: DataFrame,
    qs: QuerySourceConfig,
    config_params: dict | None = None,
) -> DataFrame:
    """Attach the query source's columns to ``src`` via one join."""
    pq = parse_prepared_query(qs.query, config_params)
    path = qs.resources.get(pq.table, pq.table)
    dim = spark.read.parquet(path)
    if pq.where:
        dim = dim.filter(F.expr(pq.where))

    key_aliases = [f"__qk_{i}" for i in range(len(pq.join_pairs))]
    exprs = list(pq.select_items) or (["*"] if not pq.join_pairs else [])
    exprs += [f"{qcol} AS {ka}" for ka, (qcol, _) in zip(key_aliases, pq.join_pairs)]
    if exprs:
        dim = dim.selectExpr(*exprs)

    if qs.unique:
        # The reference's DAO.find returns ONE related record; make the
        # multi-match case deterministic: keep the first row in the total
        # order of all payload columns within each key group.
        payload = [c for c in dim.columns if c not in key_aliases]
        if payload:
            w = Window.partitionBy(*key_aliases).orderBy(*[F.asc(c) for c in payload])
            dim = (
                dim.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            dim = dim.dropDuplicates(key_aliases)
    if pq.join_pairs or pq.select_items:
        # No row-bound params ⇒ the query is UNCORRELATED: the same related
        # record attaches to every row (the join degenerates to a broadcast
        # cross join of the one-record dim; `required` still drops all rows
        # when it returns nothing — the reference's per-row find would have
        # found nothing for every row too)
        on = F.lit(True)
        for ka, (_, src_field) in zip(key_aliases, pq.join_pairs):
            on = on & (src[src_field] == dim[ka])
        out = src.join(F.broadcast(dim), on, "inner" if qs.required else "left")
        out = out.drop(*key_aliases)
    else:
        out = src
    for alias, src_field in pq.select_binds:
        out = out.withColumn(alias, F.col(src_field))
    return out
