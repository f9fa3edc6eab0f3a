"""MySQL/dataux-dialect → Spark SQL rewrite pass.

The reference accepts a MySQL-flavored dialect (qlbridge lexer) with a few
engine-specific functions. We do NOT re-implement a SQL parser — Spark SQL's
parser is the parser. This module performs the *light textual rewrites* needed
so the reference's dialect parses and means the same thing in Spark SQL:

  - backtick-quoted dotted identifiers: `repository.name` → `repository`.`name`
    (reference: nested-doc fields queried as a single backticked token,
     /root/reference/backends/elasticsearch/es_test.go:272-273)
  - cardinality(f)  → approx_count_distinct(f)
    (reference: ES cardinality agg, backends/elasticsearch/sqltoes.go:599-611)
  - exists(f) / missing(f) → (f IS NOT NULL) / (f IS NULL)
    (reference: sqltoes.go:557-586, backends/mongo/sql_to_mgo.go:612-635)
  - CAST(x AS CHAR) → CAST(x AS STRING)
    (reference dialect test: backends/mongo/mgo_test.go:383-408)
  - trailing `WITH distributed=true[, node_ct=N]` hint → stripped
    (reference: planner/executor.go:112-116 — Spark is always distributed)
  - @@global_var / @user_var → session-context literal substitution
    (reference: frontends/mysqlfe/mysql_session.go:17-83)
  - current_user() / connection_id() / database() → session literals
    (reference: frontends/mysqlfe/mysql_functions.go:18-36)

Everything is applied only OUTSIDE string literals via a conservative
lexer-split (single-quote, double-quote, backtick regions).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ---------------------------------------------------------------- tokenizing

_SEGMENT_RE = re.compile(
    r"""
      (?P<squote> '(?:[^'\\]|\\.|'')*' )
    | (?P<dquote> "(?:[^"\\]|\\.|"")*" )
    | (?P<btick>  `[^`]*` )
    | (?P<code>   [^'"`]+ )
    """,
    re.VERBOSE | re.DOTALL,
)


def _segments(sql: str):
    """Yield (kind, text) where kind ∈ {squote,dquote,btick,code}."""
    for m in _SEGMENT_RE.finditer(sql):
        yield m.lastgroup, m.group(0)


def _map_code(sql: str, fn) -> str:
    """Apply fn to code segments only, passing through quoted regions."""
    out = []
    for kind, text in _segments(sql):
        out.append(fn(text) if kind == "code" else text)
    return "".join(out)


# ---------------------------------------------------------------- rewrites

_DISTRIBUTED_HINT_RE = re.compile(
    r"\bWITH\s+distributed\s*=\s*\w+\s*(?:,\s*node_ct\s*=\s*\d+\s*)?;?\s*$",
    re.IGNORECASE,
)

_CAST_CHAR_RE = re.compile(r"\bAS\s+CHAR\s*\)", re.IGNORECASE)
_CARDINALITY_RE = re.compile(r"\bcardinality\s*\(", re.IGNORECASE)
_EXISTS_RE = re.compile(r"\bexists\s*\(\s*([A-Za-z_][\w.]*|`[^`]+`)\s*\)", re.IGNORECASE)
_MISSING_RE = re.compile(r"\bmissing\s*\(\s*([A-Za-z_][\w.]*|`[^`]+`)\s*\)", re.IGNORECASE)
_SESSION_FN_RE = re.compile(r"\b(current_user|connection_id|database)\s*\(\s*\)", re.IGNORECASE)

# qlbridge-builtin spellings that are pure renames of Spark natives
# (library loaded wholesale in the reference, runtestserver.go:74; the
# value-typed conversions toint/tonumber/todate etc. are UDFs in
# functions/registry.py, everything here stays JVM-native)
_FN_RENAMES = {
    "tolower": "lower",
    "toupper": "upper",
    "strip": "trim",
    "oneof": "coalesce",      # first non-null (qlbridge OneOf)
    "yy": "year",
    "mm": "month",
    "dd": "day",
    "hourofday": "hour",
    "dayofweek": "dayofweek",
    "totimestamp": "unix_timestamp",  # epoch seconds
    "todatetime": "todate",           # same loose parser
    "mapkeys": "map_keys",
    "mapvalues": "map_values",
}
_FN_RENAME_RE = re.compile(
    r"\b(" + "|".join(_FN_RENAMES) + r")\s*\(", re.IGNORECASE
)
_VAR_RE = re.compile(r"@@?([A-Za-z_][\w.]*)")


def _quote_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v).replace("'", "''")
    return f"'{s}'"


@dataclass
class SessionContext:
    """Per-connection session state (reference: mysql_session.go:17-83).

    Holds MySQL global-ish variables (@@x) and user variables (@x); dataux
    evaluates these in an expression context — here they substitute as
    literals during the rewrite pass, which preserves semantics because the
    reference also resolves them before source pushdown.
    """

    variables: dict = field(default_factory=dict)
    user: str = "root"
    connection_id: int = 1
    current_schema: str = "default"

    DEFAULTS = {
        "max_allowed_packet": 67108864,
        "session.auto_increment_increment": 1,
        "auto_increment_increment": 1,
        "autocommit": 1,
        "tx_isolation": "REPEATABLE-READ",
        "version": "5.7.0-dataux-spark",
        "version_comment": "dataux_spark",
        "character_set_client": "utf8",
        "collation_connection": "utf8_general_ci",
        "sql_mode": "",
    }

    def get(self, name: str):
        key = name.lower()
        if key in self.variables:
            return self.variables[key]
        if key.startswith("session."):
            key = key[len("session.") :]
        return self.DEFAULTS.get(key)

    def set(self, name: str, value) -> None:
        self.variables[name.lower()] = value


def split_statements(sql: str) -> list[str]:
    """Split on top-level semicolons (outside quotes)."""
    parts, buf = [], []
    for kind, text in _segments(sql):
        if kind != "code":
            buf.append(text)
            continue
        pieces = text.split(";")
        for i, piece in enumerate(pieces):
            if i > 0:
                parts.append("".join(buf))
                buf = []
            buf.append(piece)
    parts.append("".join(buf))
    return [p.strip() for p in parts if p.strip()]


def rewrite(
    sql: str, ctx: SessionContext | None = None, literal_dotted: set[str] | None = None
) -> str:
    """Rewrite one dataux-dialect statement into Spark SQL.

    literal_dotted: column names that literally contain dots (flattened
    sources) — their backtick tokens stay whole; all other backtick-dotted
    tokens become struct access (`a.b` → `a`.`b`)."""
    ctx = ctx or SessionContext()
    sql = sql.strip().rstrip(";")
    sql = _DISTRIBUTED_HINT_RE.sub("", sql).strip()

    def fix_code(code: str) -> str:
        code = _CAST_CHAR_RE.sub("AS STRING)", code)
        code = _CARDINALITY_RE.sub("approx_count_distinct(", code)
        code = _EXISTS_RE.sub(lambda m: f"({m.group(1)} IS NOT NULL)", code)
        code = _MISSING_RE.sub(lambda m: f"({m.group(1)} IS NULL)", code)
        code = _FN_RENAME_RE.sub(lambda m: _FN_RENAMES[m.group(1).lower()] + "(", code)

        def session_fn(m):
            name = m.group(1).lower()
            if name == "current_user":
                return _quote_literal(ctx.user)
            if name == "connection_id":
                return _quote_literal(ctx.connection_id)
            return _quote_literal(ctx.current_schema)

        code = _SESSION_FN_RE.sub(session_fn, code)
        code = _VAR_RE.sub(lambda m: _quote_literal(ctx.get(m.group(1))), code)
        return code

    sql = _map_code(sql, fix_code)

    # `a.b.c` → `a`.`b`.`c` (dotted nested-field identifiers), unless the
    # dotted name IS a literal column of a flattened source
    literal_dotted = literal_dotted or set()
    out = []
    for kind, text in _segments(sql):
        if kind == "btick" and "." in text:
            inner = text[1:-1]
            if inner not in literal_dotted:
                text = ".".join(f"`{p}`" for p in inner.split("."))
        out.append(text)
    return "".join(out)


_SET_RE = re.compile(
    r"^\s*SET\s+(?:SESSION\s+|GLOBAL\s+)?@?@?([A-Za-z_][\w.]*)\s*(?::?=)\s*(.+?)\s*$",
    re.IGNORECASE | re.DOTALL,
)


def parse_set(sql: str):
    """Parse `SET @var = value` / `SET name = value`; returns (name, value) or None.

    Reference accepts and no-ops SET/COMMIT/ROLLBACK (mysql_handler.go:205-222)
    but stores user @vars readable via SELECT @var (mgo_test.go:123-173).
    """
    m = _SET_RE.match(sql.strip().rstrip(";"))
    if not m:
        return None
    name, raw = m.group(1), m.group(2).strip()
    if (raw.startswith("'") and raw.endswith("'")) or (raw.startswith('"') and raw.endswith('"')):
        value = raw[1:-1]
    else:
        try:
            value = int(raw)
        except ValueError:
            try:
                value = float(raw)
            except ValueError:
                value = {"true": True, "false": False}.get(raw.lower(), raw)
    return name, value
