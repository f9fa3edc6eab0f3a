"""Interactive SQL REPL — the user-facing stand-in for the reference's
MySQL-wire listener (a dataux user types SQL at a mysql prompt; a
dataux_spark user types the same SQL here — SURVEY §2.1: the wire protocol
itself is intentionally not ported, the statement surface is).

Usage:
    python3 tools/repl.py [--sf-dir /root/testdata/sf0.001] [--cpus N]

Statements end with `;`. Everything Engine.sql accepts works: SELECT with
the dataux dialect (terms(), exists(), @vars, qlbridge builtins), SHOW /
DESCRIBE mysql layouts, CREATE/ALTER/DROP SOURCE, DML, VERSION AS OF.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def render(result, max_rows: int = 50) -> str:
    """Format one Engine.sql result the way the mysql client would."""
    if result is None:
        return "OK"
    if hasattr(result, "affected"):  # DmlResult
        return f"Query OK, {result.affected} rows affected"
    rows = result.limit(max_rows + 1).collect()
    cols = result.columns
    shown = rows[:max_rows]
    widths = [
        max(len(c), *(len(str(r[i])) for r in shown)) if shown else len(c)
        for i, c in enumerate(cols)
    ]
    sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
    out = [sep, "|" + "|".join(f" {c:<{w}} " for c, w in zip(cols, widths)) + "|", sep]
    for r in shown:
        out.append(
            "|" + "|".join(f" {str(v):<{w}} " for v, w in zip(r, widths)) + "|"
        )
    out.append(sep)
    n = len(shown)
    out.append(f"{n} row{'s' if n != 1 else ''}{' (truncated)' if len(rows) > max_rows else ''}")
    return "\n".join(out)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()

    from dataux_spark import Engine, get_spark
    from dataux_spark.engine import QueryError

    os.environ.setdefault("SPARK_GRAFT_CPUS", str(args.cpus))
    spark = get_spark("repl")
    eng = Engine(spark)
    eng.register_parquet_dir("tpch", args.sf_dir)
    print(f"dataux_spark repl — tables from {args.sf_dir}; end statements with ;")

    buf: list[str] = []
    prompt = "sql> "
    while True:
        try:
            line = input(prompt)
        except EOFError:
            break
        buf.append(line)
        if not line.rstrip().endswith(";"):
            prompt = "  -> "
            continue
        stmt, buf, prompt = " ".join(buf).strip(), [], "sql> "
        if stmt.rstrip(";").strip().lower() in ("exit", "quit"):
            break
        try:
            print(render(eng.sql(stmt)))
        except QueryError as e:
            print(f"ERROR: {e}")


if __name__ == "__main__":
    main()
