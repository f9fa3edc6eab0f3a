"""Dialect function shims registered on the SparkSession.

The reference loads qlbridge's whole builtin function library
(frontends/mysqlfe/testmysql/runtestserver.go:74 — builtins.LoadAllBuiltins)
and exposes a custom-function registry as a first-class feature
(/root/reference/README.md:40, expr.FuncAdd at mysql_functions.go:20).

Spark-first: pyspark.sql.functions is a superset of qlbridge's builtins; we
register *names* Spark lacks under the reference's spelling so reference
queries run unchanged. Everything here is either a SQL-expression macro
(JVM-side, codegen'd — preferred) or an Arrow-batched pandas UDF — no
row-at-a-time Python UDF is registered anywhere.

Custom user functions: Engine.add_function(name, fn_or_sql) mirrors
expr.FuncAdd (reference mysql_functions.go:53-78).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.TimestampType())
def _todate(s: pd.Series) -> pd.Series:
    """Loose date parsing — reference parses timestamps via dateparse
    (testutil/testsetup.go:42-46, builtin `todate` used at
    backends/mongo/mgo_test.go:719). Arrow-vectorized; literal args are
    constant-folded by Catalyst before reaching the UDF in most plans."""
    out = pd.to_datetime(s, errors="coerce", utc=True, format="mixed")
    try:
        return out.dt.tz_localize(None)
    except (TypeError, AttributeError):
        return out


@F.pandas_udf(T.StringType())
def _qb_strftime(ts: pd.Series, fmt: pd.Series) -> pd.Series:
    """qlbridge extract(t, strftime-fmt) — C-style format codes, which
    Spark's date_format (Java patterns) can't take directly.  Arrow-batched;
    the format is almost always a literal, so the vectorized single-format
    path is the hot one."""
    t = pd.to_datetime(ts, errors="coerce")
    if fmt.nunique(dropna=True) <= 1:
        f = fmt.dropna().iloc[0] if fmt.notna().any() else None
        if f is None:
            return pd.Series([None] * len(ts), dtype=object)
        out = t.dt.strftime(f)
        return out.where(t.notna(), None)
    return pd.Series(
        [None if (pd.isna(a) or b is None) else a.strftime(b) for a, b in zip(t, fmt)],
        dtype=object,
    )


def scalar_pandas_udf(fn, ret_type):
    """Arrow-batched wrapper for a scalar Python function of any arity:
    the batch crosses the JVM↔Python boundary ONCE as an Arrow record
    batch (the ~10-100× win over a row-at-a-time UDF's per-row pickling);
    the element loop stays Python because these are parity functions with
    qlbridge's loose parse-what-you-can semantics, not numeric kernels.
    NaN from pandas normalizes to None so scalar fns see SQL NULL."""

    def u(*cols):
        it = zip(*[c.where(pd.notna(c), None) for c in cols])
        return pd.Series([fn(*xs) for xs in it], dtype=object)

    return F.pandas_udf(u, ret_type)



def register_all(spark: SparkSession) -> None:
    spark.udf.register("todate", _todate)
    spark.udf.register("qb_strftime", _qb_strftime)
    spark.udf.register("seconds", scalar_pandas_udf(_seconds, T.DoubleType()))

    # qlbridge-builtin spellings Spark lacks (qlbridge builtins loaded
    # wholesale at runtestserver.go:74; usage shapes in SURVEY §2.8).
    #
    # Every registration below is an Arrow-batched pandas UDF —
    # no row-at-a-time Python UDF is registered anywhere. The heavily-used
    # names (exists/missing/cardinality/terms/cast/char_length/…) and the
    # prefix/suffix tests (hasprefix/hassuffix → startswith/endswith, r9)
    # are dialect.py REWRITES that stay JVM-side and codegen'd; the shims
    # kept here cover the long tail Spark has no native expression for —
    # useragent sniffing, qlbridge's LOOSE url/email pulls (strip +
    # lowercase + parse-what-you-can, NULL never error — urlparse
    # semantics no SQL expression spells), loose casts — and
    # batch-transfer once per Arrow batch even when a query does drag
    # one across a large scan.

    # loose type-conversion family (qlbridge CastIntSafe-style semantics:
    # parse what you can, NULL on failure — never error)
    spark.udf.register("toint", scalar_pandas_udf(_toint, T.LongType()))
    spark.udf.register("tonumber", scalar_pandas_udf(_tonumber, T.DoubleType()))
    spark.udf.register("tobool", scalar_pandas_udf(_tobool, T.BooleanType()))

    # email / url extraction family (qlbridge email(), domain(), host(),
    # path(), qs() builtins)
    spark.udf.register(
        "email",
        scalar_pandas_udf(lambda s: s.strip().lower() if isinstance(s, str) and "@" in s else None,
               T.StringType()),
    )
    spark.udf.register(
        "emaildomain",
        scalar_pandas_udf(lambda s: s.strip().lower().rsplit("@", 1)[1] if isinstance(s, str) and "@" in s else None,
               T.StringType()),
    )
    spark.udf.register(
        "emailname",
        scalar_pandas_udf(lambda s: s.strip().lower().rsplit("@", 1)[0] if isinstance(s, str) and "@" in s else None,
               T.StringType()),
    )
    spark.udf.register("host", scalar_pandas_udf(_host, T.StringType()))
    spark.udf.register("domain", scalar_pandas_udf(_domain, T.StringType()))
    spark.udf.register("urlpath", scalar_pandas_udf(_urlpath, T.StringType()))
    spark.udf.register("qs", scalar_pandas_udf(_qs, T.StringType()))
    spark.udf.register("urldecode", scalar_pandas_udf(_urldecode, T.StringType()))
    spark.udf.register("urlmain", scalar_pandas_udf(_urlmain, T.StringType()))
    spark.udf.register("urlminusqs", scalar_pandas_udf(_urlminusqs, T.StringType()))
    spark.udf.register("useragent", scalar_pandas_udf(_useragent, T.StringType()))
    spark.udf.register(
        "useragent_map",
        scalar_pandas_udf(_useragent_map, T.MapType(T.StringType(), T.StringType())),
    )
    spark.udf.register("typewriter", scalar_pandas_udf(_typewriter, T.StringType()))


def _typewriter(s):
    """mysqlfe typewriter(v) — sniff a string's value type, name the mysql
    column type it maps to (frontends/mysqlfe/sql_writer.go:19-88; probe
    order int → bool → float → time mirrors qlbridge value.ValueFromString).
    Used by SHOW CREATE TABLE generation in the reference."""
    if not isinstance(s, str):
        return None
    v = s.strip()
    try:
        int(v)
        return "bigint"
    except ValueError:
        pass
    if v in ("1", "t", "T", "TRUE", "true", "True", "0", "f", "F", "FALSE", "false", "False"):
        return "tinyint"
    try:
        float(v)
        return "double"
    except ValueError:
        pass
    if v and not pd.isna(pd.to_datetime(pd.Series([v]), errors="coerce", format="mixed", utc=True).iloc[0]):
        return "datetime"
    return "varchar(255)"


def _useragent_map(s):
    """qlbridge useragent.map(ua) — every parsed attribute as one map
    (dialect rewrites the dotted spelling to this name)."""
    if not isinstance(s, str):
        return None
    return {a: _useragent(s, a) for a in ("bot", "browser", "os")}


def _toint(s):
    if s is None:
        return None
    try:
        return int(float(str(s).strip().strip('"').replace(",", "")))
    except (ValueError, TypeError):
        return None


def _tonumber(s):
    if s is None:
        return None
    try:
        return float(str(s).strip().strip('"').replace(",", ""))
    except (ValueError, TypeError):
        return None


_TRUTHY = {"true", "t", "1", "yes", "y"}
_FALSY = {"false", "f", "0", "no", "n"}


def _tobool(s):
    if s is None:
        return None
    v = str(s).strip().lower()
    if v in _TRUTHY:
        return True
    if v in _FALSY:
        return False
    return None


def _parse_url(s):
    from urllib.parse import urlparse

    if not isinstance(s, str) or not s:
        return None
    return urlparse(s if "://" in s else "http://" + s)


def _host(s):
    u = _parse_url(s)
    return u.hostname if u and u.hostname else None


def _domain(s):
    h = _host(s)
    if not h:
        return None
    parts = h.split(".")
    return ".".join(parts[-2:]) if len(parts) >= 2 else h


def _urlpath(s):
    u = _parse_url(s)
    return u.path if u and u.path else None


def _qs(s, param):
    from urllib.parse import parse_qs

    u = _parse_url(s)
    if not u or param is None:
        return None
    vals = parse_qs(u.query).get(param)
    return vals[0] if vals else None


def _seconds(v):
    """qlbridge seconds(): '[[hh:]mm:]ss' or plain number → float seconds."""
    if v is None:
        return None
    s = str(v).strip()
    if ":" in s:
        try:
            nums = [float(p) for p in s.split(":")]
        except ValueError:
            return None
        sec = 0.0
        for p in nums:
            sec = sec * 60 + p
        return sec
    try:
        return float(s)
    except ValueError:
        return None


def _urldecode(s):
    from urllib.parse import unquote_plus

    return unquote_plus(s) if isinstance(s, str) else None


def _urlmain(s):
    """qlbridge urlmain(): host + path, scheme and query stripped."""
    u = _parse_url(s)
    if not u or not u.hostname:
        return None
    return u.hostname + (u.path or "")


def _urlminusqs(s, param):
    """qlbridge urlminusqs(url, qskey): url with that one qs param removed."""
    from urllib.parse import parse_qsl, urlencode, urlunparse

    if not isinstance(s, str) or param is None:
        return None
    u = _parse_url(s)
    if not u:
        return None
    pairs = [(k, v) for k, v in parse_qsl(u.query, keep_blank_values=True) if k != param]
    rebuilt = urlunparse((u.scheme, u.netloc, u.path, u.params, urlencode(pairs), u.fragment))
    return rebuilt


_UA_BOTS = ("bot", "crawler", "spider", "slurp", "archiver")
_UA_BROWSERS = ("edge", "opr", "opera", "chrome", "firefox", "safari", "msie", "trident")
_UA_OSES = ("windows", "android", "iphone", "ipad", "mac os", "macintosh", "linux", "cros")


def _useragent(s, attr):
    """qlbridge useragent(ua, attr) — reference uses a UA-parser library;
    that isn't in this container, so this is a deterministic heuristic
    covering the attrs qlbridge exposes (bot/browser/os)."""
    if not isinstance(s, str) or attr is None:
        return None
    ua, attr = s.lower(), str(attr).lower()
    if attr == "bot":
        return "true" if any(b in ua for b in _UA_BOTS) else "false"
    if attr == "browser":
        for name in _UA_BROWSERS:
            if name in ua:
                return {"opr": "opera", "trident": "msie"}.get(name, name)
        return "unknown"
    if attr == "os":
        for name in _UA_OSES:
            if name in ua:
                return {"macintosh": "mac os", "cros": "chrome os"}.get(name, name)
        return "unknown"
    return None
