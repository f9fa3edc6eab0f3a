"""Data-quality expectations — the declarative validate/quarantine gate a
training-data pipeline runs before a table write (the Delta Live Tables
`EXPECT ... ON VIOLATION` shape). Beyond-reference extension: the
reference validates schemas at scan time (backends/*/source discovery)
but has no row-level data contracts.

An expectation is (name, predicate, action):
  warn — violations counted in the report but rows kept
  drop — violating rows diverted to the quarantine frame
  fail — like drop, plus `enforce()` raises if any row violates

Scale design: every rule is a JVM boolean expression evaluated inside
ONE scan projection — N rules cost one pass, not N. The report is a
single aggregate of conditional sums (one 1-row exchange); the
pass/quarantine split reuses the same projected scan, so a
validate-then-write pipeline reads the input exactly once per output
frame with zero shuffles. Rule violations ride along as a sorted
name array, making the quarantine frame self-describing (each bad row
says which contracts it broke).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

_ACTIONS = ("warn", "drop", "fail")


@dataclass(frozen=True)
class Expectation:
    """One named data contract. `predicate` is a SQL boolean expression
    string (or Column) that must hold for a row to be clean. NULL
    predicate results count as violations (a contract that cannot be
    evaluated is not satisfied) — the same three-valued-logic choice
    SQL CHECK constraints make in reverse; we take the strict side
    because a quality gate's job is to catch the weird rows."""

    name: str
    predicate: str
    action: str = "drop"

    def __post_init__(self):
        if self.action not in _ACTIONS:
            raise ValueError(
                f"expectation {self.name!r}: action must be one of {_ACTIONS}, "
                f"got {self.action!r}"
            )


def _holds(rule: Expectation) -> Column:
    # strict: NULL -> violation
    cond = F.expr(rule.predicate) if isinstance(rule.predicate, str) else rule.predicate
    return F.coalesce(cond.cast("boolean"), F.lit(False))


def expectation_report(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """Per-rule violation stats in one scan: (rule, action, n_rows,
    n_violations, violation_pct), one row per rule in declaration order.
    The whole rule set folds into a single aggregate row (conditional
    sums) that stack() pivots — adding a rule adds a column to the
    partial aggregate, not a job."""
    esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")  # noqa: E731
    aggs = [F.count("*").alias("__n")]
    for i, r in enumerate(rules):
        aggs.append(
            F.sum(F.when(~_holds(r), 1).otherwise(0)).cast("bigint").alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    parts = ", ".join(
        f"'{esc(r.name)}', '{r.action}', `__v{i}`" for i, r in enumerate(rules)
    )
    return one.select(
        "__n",
        F.expr(f"stack({len(rules)}, {parts}) AS (rule, action, n_violations)"),
    ).select(
        "rule",
        "action",
        F.col("__n").alias("n_rows"),
        "n_violations",
        F.round(F.col("n_violations") * 100.0 / F.greatest(F.col("__n"), F.lit(1)), 4)
        .alias("violation_pct"),
    )


def split_on_expectations(
    df: DataFrame, rules: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(passed, quarantined). A row is quarantined when it violates any
    drop/fail rule; warn rules never divert rows. The quarantine frame
    carries `violations` — the sorted array of ALL rule names the row
    broke (warn included: the quarantine record should tell the whole
    story of the row). Both frames derive from one projected scan; the
    violation array is built with JVM array ops (no UDF)."""
    marks = F.array(
        *[
            F.when(~_holds(r), F.lit(r.name)).otherwise(F.lit(None))
            for r in rules
        ]
    )
    gate = F.array(
        *[
            F.when(~_holds(r), F.lit(r.name)).otherwise(F.lit(None))
            for r in rules
            if r.action in ("drop", "fail")
        ]
        or [F.lit(None).cast("string")]
    )
    tagged = df.withColumn(
        "violations", F.array_sort(F.filter(marks, lambda x: x.isNotNull()))
    ).withColumn("__gated", F.size(F.filter(gate, lambda x: x.isNotNull())) > 0)
    passed = tagged.filter(~F.col("__gated")).drop("violations", "__gated")
    quarantined = tagged.filter(F.col("__gated")).drop("__gated")
    return passed, quarantined


def enforce(df: DataFrame, rules: list[Expectation]) -> DataFrame:
    """The write-path gate: raises ExpectationError if any `fail` rule
    is violated (ONE count over the scan — the same job a validating
    writer would run anyway), otherwise returns the passed frame with
    drop-rule rows removed. Use in front of a sink:
    `store.commit(enforce(batch, rules))`."""
    hard = [r for r in rules if r.action == "fail"]
    if hard:
        bad = F.array(
            *[F.when(~_holds(r), F.lit(r.name)).otherwise(F.lit(None)) for r in hard]
        )
        hit = (
            df.select(F.explode(F.filter(bad, lambda x: x.isNotNull())).alias("rule"))
            .groupBy("rule")
            .count()
            .collect()
        )
        if hit:
            detail = ", ".join(f"{r['rule']}={r['count']}" for r in sorted(hit))
            raise ExpectationError(f"fail-action expectations violated: {detail}")
    passed, _ = split_on_expectations(df, rules)
    return passed


class ExpectationError(ValueError):
    """A fail-action expectation was violated on the write path."""
