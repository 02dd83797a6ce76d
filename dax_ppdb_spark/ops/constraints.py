"""Declarative data-quality constraints: table audits + row-level
violation listings.

The reference enforces integrity point-wise where each write happens —
``rowcount == 1`` guards on point UPDATEs
(``bigquery/ppdb_bigquery.py:620-657``), IntegrityError on duplicate
ledger inserts (``:598-618``), manifest row-count validation on upload
(``python/lsst/dax/ppdb/_ppdb_replica_chunk.py`` consumers) and the
replica-chunk consistency lookup.  This module generalizes those
checks into a declarative constraint set evaluated table-wide — the
ANALYZE/validation layer a training-data pipeline runs before
promoting a corpus snapshot: uniqueness, null policy, accepted
values, ranges, arbitrary CHECK expressions, and referential
integrity.

Scale shape (the whole point at 100 TB):

- Every ROW-LEVEL rule (not-null / accepted-values / in-range /
  check) is fused into ONE aggregate over ONE scan of the table —
  k rules never cost k passes.  The aggregate is a global
  partial+final (map-side combine, one single-row exchange), no
  wide shuffle.
- ``Unique`` is a groupBy on the key with map-side partial counts;
  the excess-row total reduces from O(keys), never O(rows).
- ``ForeignKey`` pre-aggregates the child side to DISTINCT keys
  (with multiplicities) BEFORE the join, so the probe ships O(child
  keys), not O(child rows); the parent side reduces to its distinct
  key set, which AQE broadcasts when it is dimension-sized.

NULL semantics follow ANSI SQL CHECK: a predicate evaluating to
UNKNOWN passes (use :class:`NotNull` to reject nulls explicitly);
``ForeignKey`` ignores rows with any NULL key column (SQL FK
semantics); ``Unique`` groups NULL keys together like GROUP BY.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class NotNull:
    """Column must be non-null."""

    col: str

    @property
    def label(self) -> str:
        return f"not_null({self.col})"


@dataclass(frozen=True)
class AcceptedValues:
    """Column value must be one of ``values`` (NULL passes — ANSI
    CHECK semantics; pair with :class:`NotNull` to reject nulls)."""

    col: str
    values: tuple

    @property
    def label(self) -> str:
        return f"accepted_values({self.col})"


@dataclass(frozen=True)
class InRange:
    """``lo <= col <= hi`` inclusive; either bound may be None for a
    half-open check.  NULL passes (ANSI CHECK semantics)."""

    col: str
    lo: float | int | None = None
    hi: float | int | None = None

    @property
    def label(self) -> str:
        return f"in_range({self.col})"


@dataclass(frozen=True)
class Check:
    """Arbitrary boolean SQL expression over the row; a row violates
    iff the predicate IS FALSE (UNKNOWN passes, per ANSI CHECK)."""

    name: str
    predicate: str

    @property
    def label(self) -> str:
        return f"check({self.name})"


@dataclass(frozen=True)
class Unique:
    """Key columns must identify at most one row.  ``n_violations``
    counts EXCESS rows (``count - 1`` per duplicated key), matching
    "rows you would drop to restore uniqueness"."""

    cols: tuple

    @property
    def label(self) -> str:
        return f"unique({','.join(self.cols)})"


@dataclass(frozen=True)
class ForeignKey:
    """Child ``cols`` must exist in ``ref_cols`` of the parent
    relation.  Rows with any NULL key column are skipped (SQL FK
    semantics) and excluded from ``n_checked``."""

    cols: tuple
    ref: DataFrame
    ref_cols: tuple
    name: str

    @property
    def label(self) -> str:
        return f"foreign_key({self.name})"


Constraint = NotNull | AcceptedValues | InRange | Check | Unique | ForeignKey

_ROW_RULES = (NotNull, AcceptedValues, InRange, Check)


def _passes(rule) -> Column:
    """Boolean predicate (may be UNKNOWN) whose ANSI-CHECK reading
    decides the rule: a row VIOLATES iff this IS FALSE."""
    if isinstance(rule, NotNull):
        # NotNull is the one rule where NULL must fail, so the
        # predicate itself is two-valued.
        return F.col(rule.col).isNotNull()
    if isinstance(rule, AcceptedValues):
        return F.col(rule.col).isin(*rule.values)
    if isinstance(rule, InRange):
        conds = []
        if rule.lo is not None:
            conds.append(F.col(rule.col) >= F.lit(rule.lo))
        if rule.hi is not None:
            conds.append(F.col(rule.col) <= F.lit(rule.hi))
        if not conds:
            return F.lit(True)
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
    if isinstance(rule, Check):
        return F.expr(rule.predicate)
    raise TypeError(f"not a row-level rule: {rule!r}")


def _violates(rule) -> Column:
    """Two-valued violation flag: predicate IS FALSE (UNKNOWN → no
    violation, ANSI CHECK)."""
    return ~F.coalesce(_passes(rule), F.lit(True))


_AUDIT_COLS = ("rule", "n_checked", "n_violations", "passed")


def _finish(df: DataFrame) -> DataFrame:
    return df.select(
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def constraint_audit(df: DataFrame, constraints: Sequence[Constraint]) -> DataFrame:
    """One summary row per rule: ``(rule, n_checked, n_violations,
    passed)``.

    All row-level rules share a single fused aggregate (one scan);
    each :class:`Unique` / :class:`ForeignKey` adds its own key-level
    aggregation, pre-reduced map-side before any join.
    """
    pieces: list[DataFrame] = []

    row_rules = [r for r in constraints if isinstance(r, _ROW_RULES)]
    if row_rules:
        aggs = [F.count(F.lit(1)).alias("__n")] + [
            F.coalesce(F.sum(_violates(r).cast("long")), F.lit(0)).alias(f"__v{i}")
            for i, r in enumerate(row_rules)
        ]
        one = df.agg(*aggs)
        pieces.append(
            one.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(r.label).alias("rule"),
                                F.col("__n").alias("n_checked"),
                                F.col(f"__v{i}").alias("n_violations"),
                            )
                            for i, r in enumerate(row_rules)
                        ]
                    )
                ).alias("s")
            ).select("s.*")
        )

    for rule in constraints:
        if isinstance(rule, Unique):
            g = df.groupBy(*[F.col(c) for c in rule.cols]).agg(
                F.count(F.lit(1)).alias("__c")
            )
            pieces.append(
                g.agg(
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
                    F.coalesce(F.sum(F.col("__c") - 1), F.lit(0)).alias(
                        "n_violations"
                    ),
                ).select(F.lit(rule.label).alias("rule"), "n_checked", "n_violations")
            )
        elif isinstance(rule, ForeignKey):
            nn = F.col(rule.cols[0]).isNotNull()
            for c in rule.cols[1:]:
                nn = nn & F.col(c).isNotNull()
            child = (
                df.filter(nn)
                .groupBy(*[F.col(c) for c in rule.cols])
                .agg(F.count(F.lit(1)).alias("__c"))
            )
            parent = (
                rule.ref.select(
                    *[
                        F.col(rc).alias(c)
                        for c, rc in zip(rule.cols, rule.ref_cols)
                    ]
                )
                .distinct()
                .withColumn("__hit", F.lit(1))
            )
            joined = child.join(parent, list(rule.cols), "left")
            pieces.append(
                joined.agg(
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("n_checked"),
                    F.coalesce(
                        F.sum(F.when(F.col("__hit").isNull(), F.col("__c")).otherwise(0)),
                        F.lit(0),
                    ).alias("n_violations"),
                ).select(F.lit(rule.label).alias("rule"), "n_checked", "n_violations")
            )

    if not pieces:
        raise ValueError("no constraints given")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return _finish(out).orderBy("rule")


def constraint_violations(
    df: DataFrame,
    constraints: Sequence[Constraint],
    id_cols: Sequence[str],
) -> DataFrame:
    """Row-level listing: ``(*id_cols, rule)`` — one row per
    (violating row, violated rule).

    Row-level rules are fused into ONE pass: each row emits the array
    of labels it violates, empty arrays vanish in the explode.  A
    :class:`Unique` rule flags EVERY member of a duplicated key group
    (you want to see the whole group; the audit counts only the
    excess).  A :class:`ForeignKey` rule flags each orphan row.
    """
    ids = [F.col(c) for c in id_cols]
    pieces: list[DataFrame] = []

    row_rules = [r for r in constraints if isinstance(r, _ROW_RULES)]
    if row_rules:
        labels = F.array(
            *[F.when(_violates(r), F.lit(r.label)) for r in row_rules]
        )
        pieces.append(
            df.select(*ids, F.explode(F.filter(labels, lambda x: x.isNotNull())).alias("rule"))
        )

    for rule in constraints:
        if isinstance(rule, Unique):
            from pyspark.sql import Window

            w = Window.partitionBy(*[F.col(c) for c in rule.cols])
            pieces.append(
                df.withColumn("__c", F.count(F.lit(1)).over(w))
                .filter(F.col("__c") > 1)
                .select(*ids, F.lit(rule.label).alias("rule"))
            )
        elif isinstance(rule, ForeignKey):
            nn = F.col(rule.cols[0]).isNotNull()
            for c in rule.cols[1:]:
                nn = nn & F.col(c).isNotNull()
            parent = rule.ref.select(
                *[F.col(rc).alias(c) for c, rc in zip(rule.cols, rule.ref_cols)]
            ).distinct()
            pieces.append(
                df.filter(nn)
                .join(parent, list(rule.cols), "left_anti")
                .select(*ids, F.lit(rule.label).alias("rule"))
            )

    if not pieces:
        raise ValueError("no constraints given")
    out = pieces[0]
    for p in pieces[1:]:
        out = out.unionByName(p)
    return out


class ConstraintViolationError(RuntimeError):
    """A constraint set failed; carries the per-rule audit rows for
    the failing rules (tiny: one row per rule)."""

    def __init__(self, label: str, failed: list) -> None:
        self.label = label
        self.failed = failed
        detail = "; ".join(
            f"{r['rule']}: {r['n_violations']}/{r['n_checked']}" for r in failed
        )
        super().__init__(f"constraint violations in {label}: {detail}")


def enforce_constraints(
    df: DataFrame, constraints: Sequence[Constraint], label: str
) -> list:
    """Audit ``df`` and raise :class:`ConstraintViolationError` if any
    rule fails; returns the (tiny, one-row-per-rule) audit rows when
    everything passes.  The collect is O(rules), never O(rows) — the
    violating rows themselves stay distributed (use
    :func:`constraint_violations` to quarantine them)."""
    rows = constraint_audit(df, constraints).collect()
    failed = [r for r in rows if not r["passed"]]
    if failed:
        raise ConstraintViolationError(label, failed)
    return rows


def constraints_from_spec(spark, spec: Sequence[dict]) -> list:
    """Build a constraint list from a JSON-able spec — the CLI/config
    surface.  Each entry is a dict with ``kind`` plus the rule's
    fields; ``foreign_key.ref`` is a parquet path read via ``spark``.

    Example::

        [{"kind": "not_null", "col": "o_custkey"},
         {"kind": "accepted_values", "col": "o_orderstatus",
          "values": ["O", "F"]},
         {"kind": "in_range", "col": "o_totalprice", "lo": 0},
         {"kind": "check", "name": "pos", "predicate": "o_totalprice > 0"},
         {"kind": "unique", "cols": ["o_orderkey"]},
         {"kind": "foreign_key", "cols": ["o_custkey"],
          "ref": "/data/customer", "ref_cols": ["c_custkey"],
          "name": "orders_custkey"}]
    """
    out: list = []
    for entry in spec:
        kind = entry.get("kind")
        if kind == "not_null":
            out.append(NotNull(entry["col"]))
        elif kind == "accepted_values":
            out.append(AcceptedValues(entry["col"], tuple(entry["values"])))
        elif kind == "in_range":
            out.append(InRange(entry["col"], entry.get("lo"), entry.get("hi")))
        elif kind == "check":
            out.append(Check(entry["name"], entry["predicate"]))
        elif kind == "unique":
            out.append(Unique(tuple(entry["cols"])))
        elif kind == "foreign_key":
            ref = spark.read.parquet(entry["ref"])
            out.append(
                ForeignKey(
                    tuple(entry["cols"]),
                    ref,
                    tuple(entry["ref_cols"]),
                    entry.get("name", ",".join(entry["cols"])),
                )
            )
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
    return out
