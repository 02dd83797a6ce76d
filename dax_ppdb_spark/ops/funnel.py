"""Ordered-funnel analysis over an event stream.

The classic product-analytics operator: for each user, how far they
progressed through an ORDERED sequence of step event types, where
each step must occur strictly after the previous one (a purchase
before the click doesn't count).

Spark shape: one hash partition on the user and a chain of
conditional-min window aggregates — step k's timestamp is
``min(ts WHERE type = step_k AND ts > t_{k-1})`` over the user's
partition, which all share the one exchange (plan-pinned: a single
``hashpartitioning(user_id)`` serves every window and the final
per-user aggregate).  No self-joins, no per-user explode: linear in
events, the same scale posture as ``sessionize``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Per-user funnel progression through ``steps`` (ordered event
    types; each step strictly after the previous one).

    Output: one row per user appearing in ``events`` —
    ``(user_col, steps_completed, ts1_us..tsK_us)`` where ``tsk_us``
    is the earliest valid timestamp of step k (NULL once the funnel
    breaks; later steps of a broken funnel are NULL by construction
    since ``ts > NULL`` is never true).
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev = None
    t_cols = []
    for k, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        name = f"__t{k}"
        df = df.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        t_cols.append(name)
        prev = name
    agg = df.groupBy(user_col).agg(
        *[F.min(c).alias(f"ts{k}_us") for k, c in enumerate(t_cols, start=1)]
    )
    completed = None
    for k in range(1, len(steps) + 1):
        inc = F.col(f"ts{k}_us").isNotNull().cast("long")
        completed = inc if completed is None else completed + inc
    return agg.select(
        user_col,
        completed.alias("steps_completed"),
        *[f"ts{k}_us" for k in range(1, len(steps) + 1)],
    )


def retention_cohorts(
    events: DataFrame,
    period_us: int = 86_400_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
) -> DataFrame:
    """Cohort retention matrix — the other classic product-analytics
    operator: users bucket into cohorts by their FIRST activity
    period, and each (cohort, offset) cell reports what fraction of
    the cohort was active ``offset`` periods later.

    Pure integer arithmetic (period = ``ts DIV period_us``; counts and
    a ratio of counts), so both engines replay it exactly.  Scale
    shape: one distinct over (user, period) — the only relation
    proportional to events — then a user-keyed first-period aggregate
    and join (co-partitioned on the user), a (cohort, offset)
    count-distinct, and a broadcast-sized cohort-size join; no
    windows, no self-join on events.

    Output: ``(cohort_day, offset_days, n_active, n_cohort,
    retention round 6)``; the offset-0 row of every cohort has
    retention 1.0 by construction.
    """
    # integer DIV, not float division + cast: a double quotient one
    # ulp under an exact integer would truncate to the wrong period
    day = F.expr(f"{ts_col} DIV {period_us}").alias("day")
    act = events.select(F.col(user_col).alias("user_id"), day).distinct()
    coh = act.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = act.join(coh, "user_id")
    r = joined.groupBy(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days")
    ).agg(F.count_distinct("user_id").alias("n_active"))
    sizes = coh.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n_cohort"))
    return r.join(sizes, "cohort_day").select(
        "cohort_day",
        "offset_days",
        "n_active",
        "n_cohort",
        F.round(F.col("n_active") / F.col("n_cohort"), 6).alias("retention"),
    )
