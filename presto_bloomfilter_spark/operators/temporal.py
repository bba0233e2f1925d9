"""Temporal operators Spark's built-ins don't express directly: as-of
join, gap sessionization, and point-in-interval range join.

These are the event-stream shapes of a training/analytics pipeline
(align each click to the latest preceding view, cut user activity into
sessions, attribute a timestamp to its campaign window) that naive SQL
renders as non-equi joins — which Catalyst executes as broadcast
nested-loop or cartesian plans, the classic 100 TB cliff.  Each
operator here is re-expressed as equi-partitioned dataflow:

- ``as_of_join``: the union-merge trick — tag both sides, union, ONE
  window over (key, ts) carrying the last right-side payload forward.
  Zero joins: one shuffle on the key, linear scan per partition.  This
  is the distributed merge-asof (pandas.merge_asof's sorted-merge, cf.
  QuestDB/kdb ASOF), not an O(L x R) predicate join.
- ``sessionize``: lag + cumulative-sum-of-gap-flags window — the
  standard gap-based session assignment, one shuffle on the user key.
- ``range_join``: interval bucketing — intervals explode to the fixed-
  width buckets they cover, points map to ONE bucket, equi-join on
  (key, bucket), then the exact containment filter.  Shuffle volume is
  O(points + intervals x avg_buckets_per_interval), never a cartesian;
  pick ``bucket`` near the median interval width (the classic
  interval-join recipe Spark only applies automatically on Databricks
  range-join hints).

Skew: all three shuffle on the caller's key column.  A single hot key
(one user with a billion events) serializes its partition under the
default plans; ``sessionize`` and ``as_of_join`` take ``salt_block``
(a time-block width) to pre-split hot keys — the per-key window runs
per (key, time-block) in parallel and a second pass over the tiny
per-block summary table stitches the boundaries exactly (the salting
escape hatch grouped sketch builds already had).  ``range_join``
needs no salt (points map to one bucket each); bound per-key
cardinality for the rest (operators/sampling.py:cap_per_key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["as_of_join", "sessionize", "range_join", "retention_cohorts",
           "funnel"]


def _interval_seconds(v: float | str) -> Column:
    """Seconds Column from a number or an ``INTERVAL ...`` SQL string
    (intervals refuse a double cast; epoch-0 + interval → epoch
    seconds of the width, microsecond-exact)."""
    if isinstance(v, str):
        return (F.lit(0).cast("timestamp_ltz") + F.expr(v)).cast("double")
    return F.lit(float(v))


def _as_seconds(df: DataFrame, col: str) -> Column:
    """Numeric (epoch-seconds) view of a timestamp or numeric column.
    TIMESTAMP_NTZ refuses a direct double cast; routing through
    timestamp_ltz keeps microsecond precision and leaves differences
    (all these operators consume) timezone-invariant."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        return F.col(col).cast("timestamp_ltz").cast("double")
    return F.col(col).cast("double")


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    tolerance: Column | None = None,
    prefix: str = "matched_",
    salt_block: float | str | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row of the same
    ``key`` with ``right.ts <= left.ts`` (backward as-of; ties at equal
    timestamps match).  Unmatched left rows keep NULL payload columns.

    Implementation: tag right rows 1 / left rows 0, union, and carry
    ``last_value(payload, ignoreNulls)`` forward over a window ordered
    by (ts, tag DESC) — right rows sort before left at the same
    instant, so equality matches; rows-between unbounded-preceding
    makes the carried value exactly the as-of match.  ONE shuffle (the
    window's hash partition on ``key``), no join operator at all.

    ``tolerance``: optional max staleness as a Column literal (e.g.
    ``F.expr("INTERVAL 1 HOUR")`` for timestamps, or a plain number for
    numeric ts columns); matches older than it are nulled out.

    If several right rows share (key, ts), the carried one is the last
    in the union's deterministic (ts, tag) order within the window —
    make right unique per (key, ts) upstream if that order matters
    (in salted mode the cross-block carry picks among such ties
    arbitrarily, so uniqueness per (key, ts) is REQUIRED there for a
    deterministic result).

    ``salt_block`` (seconds or INTERVAL string): hot-key escape hatch
    — the union-merge window runs per (key, floor(ts / salt_block)),
    spreading one hot key over many tasks; each block's match is the
    later of its local carry and the carry-in stitched from a second
    window over the tiny per-(key, block) summary (the last right
    payload per block, prefix-carried across blocks).  Identical
    results to the unsalted path for any block width.

    Returns the left rows (original columns) plus ``{prefix}ts`` and
    one ``{prefix}{col}`` per payload column.
    """
    if right_payload is None:
        right_payload = [c for c in right.columns if c not in (key, right_ts)]
    payload_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in right_payload],
    )
    # The contract ``right.ts <= left.ts`` is never satisfied by a NULL
    # right timestamp (SQL comparison with NULL is unknown), but under
    # the window's ascending order NULL __t would sort FIRST and its
    # payload would be carried into every later left row of the key —
    # drop such rows before the union so they can never match.
    r = right.filter(F.col(right_ts).isNotNull()).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(1).alias("__is_right"),
        payload_struct.alias("__p"),
        *[F.lit(None).cast(f.dataType).alias(f"__l_{f.name}")
          for f in left.schema.fields],
    )
    lft = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        *[F.col(f.name).alias(f"__l_{f.name}") for f in left.schema.fields],
    )
    union = r.unionByName(lft)
    if salt_block is None:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = (
            union
            .withColumn("__m", F.last("__p", ignorenulls=True).over(w))
            .filter(F.col("__is_right") == 0)
        )
    else:
        blk_secs = _interval_seconds(salt_block)
        union = union.withColumn(
            "__blk", F.floor(_as_seconds(union, "__t") / blk_secs))
        w_loc = (
            Window.partitionBy("__k", "__blk")
            .orderBy(F.col("__t").asc(), F.col("__is_right").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        loc = union.withColumn("__m", F.last("__p", ignorenulls=True).over(w_loc))
        # per-(key, block) last right payload (right rows always have
        # non-NULL __t here, and NULL ordering values are skipped by
        # max_by, so blocks without right rows summarize to NULL)
        summary = (union.groupBy("__k", "__blk").agg(
            F.max_by("__p", F.when(F.col("__is_right") == 1, F.col("__t")))
            .alias("__bp")))
        w_prev = (Window.partitionBy("__k")
                  .orderBy(F.col("__blk").asc_nulls_first())
                  .rowsBetween(Window.unboundedPreceding, -1))
        carry_in = (summary
                    .withColumn("__cin",
                                F.last("__bp", ignorenulls=True).over(w_prev))
                    .select(F.col("__k").alias("__ck"),
                            F.col("__blk").alias("__cb"), "__cin"))
        carried = (
            loc.filter(F.col("__is_right") == 0)
            # null-safe: NULL keys/blocks are window groups a plain
            # equi-join would drop
            .join(carry_in,
                  F.col("__k").eqNullSafe(F.col("__ck"))
                  & F.col("__blk").eqNullSafe(F.col("__cb")))
            .withColumn("__m", F.coalesce("__m", "__cin"))
            .drop("__blk", "__ck", "__cb", "__cin")
        )
    # SQL join equality never matches NULL keys; the window's
    # partitionBy groups them, so mask the carried match out
    carried = carried.withColumn(
        "__m", F.when(F.col("__k").isNotNull(), F.col("__m")))
    if tolerance is not None:
        carried = carried.withColumn(
            "__m",
            F.when(F.col("__m.__ts") >= F.col("__t") - tolerance, F.col("__m")),
        )
    return carried.select(
        *[F.col(f"__l_{f.name}").alias(f.name) for f in left.schema.fields],
        F.col("__m.__ts").alias(f"{prefix}ts"),
        *[F.col(f"__m.{c}").alias(f"{prefix}{c}") for c in right_payload],
    )


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: float | str = "INTERVAL 30 MINUTES",
    salt_block: float | str | None = None,
) -> DataFrame:
    """Gap-based session assignment: within each ``key``, a new session
    starts whenever the time since the previous event exceeds ``gap``.
    Adds ``session_seq`` (1-based per key, in time order) — the
    deterministic session identifier ``concat(key, '#', session_seq)``
    is trivially derivable.  One shuffle (the per-key window); ties at
    identical timestamps order by the remaining columns' arrival and do
    not open sessions (gap 0 is not > gap).  NULL timestamps sort
    FIRST and each opens its own session (gap vs NULL is unknowable) —
    an oracle replaying this must order NULLS FIRST explicitly.

    ``salt_block`` (seconds or INTERVAL string): hot-key escape hatch.
    A single key with 10^9 events serializes the default per-key
    window; with a block width set, events partition by
    (key, floor(ts / salt_block)) so one hot key spreads over
    time-blocks and MANY tasks.  Session flags are exact within a
    block; the only cross-block adjacency is (last event of a block,
    first event of the next non-empty block), stitched by a second
    window over the per-(key, block) summary table — one tiny row per
    non-empty block, carrying (first_ts, last_ts, local session
    count) — which yields each block's session-number offset and
    whether its first local session continues the previous block's
    last.  Identical output to the unsalted path for ANY block width
    (blocks narrower than ``gap`` just mean more merges).  Cost: the
    event-level window body runs per branch (Catalyst shares the
    shuffle, not the window), so salted mode trades ~2x window CPU
    for per-key parallelism — use it when keys are hot, not by
    default.  Tie order inside a block matches the unsalted window;
    NULL timestamps land in a NULL block that sorts first, preserving
    their one-session-each semantics."""
    gap_secs = _interval_seconds(gap)
    tnum = _as_seconds(df, ts)
    if salt_block is None:
        w_ord = Window.partitionBy(key).orderBy(F.col(ts).asc())
        is_new = (tnum - F.lag(tnum).over(w_ord) > gap_secs).cast("int")
        return (
            df.withColumn("__new", F.coalesce(is_new, F.lit(1)))
            .withColumn(
                "session_seq",
                F.sum("__new").over(
                    w_ord.rowsBetween(Window.unboundedPreceding,
                                      Window.currentRow)),
            )
            .drop("__new")
        )
    blk_secs = _interval_seconds(salt_block)
    w_loc = Window.partitionBy(key, "__blk").orderBy(F.col(ts).asc())
    loc = (
        df.withColumn("__tn", tnum)
        .withColumn("__blk", F.floor(F.col("__tn") / blk_secs))
        .withColumn(
            "__new",
            F.coalesce((F.col("__tn") - F.lag("__tn").over(w_loc)
                        > gap_secs).cast("int"), F.lit(1)))
        .withColumn(
            "__lseq",
            F.sum("__new").over(
                w_loc.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
    )
    summary = (loc.groupBy(key, "__blk")
               .agg(F.min("__tn").alias("__first"),
                    F.max("__tn").alias("__last"),
                    F.sum("__new").alias("__nloc")))
    w_blk = Window.partitionBy(key).orderBy(F.col("__blk").asc_nulls_first())
    continues = (F.col("__first") - F.lag("__last").over(w_blk)
                 <= gap_secs).cast("long")
    offsets = (
        summary.withColumn("__cont", F.coalesce(continues, F.lit(0)))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__nloc").over(
                    w_blk.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0))
            - F.sum("__cont").over(
                w_blk.rowsBetween(Window.unboundedPreceding,
                                  Window.currentRow)))
        .select(F.col(key).alias("__ok"), F.col("__blk").alias("__ob"),
                "__off")
    )
    # null-safe equality: NULL keys form a window group and NULL
    # timestamps a NULL block — a plain equi-join would drop both
    joined = loc.join(
        offsets,
        F.col(key).eqNullSafe(F.col("__ok"))
        & F.col("__blk").eqNullSafe(F.col("__ob")))
    return (joined
            .withColumn("session_seq", F.col("__lseq") + F.col("__off"))
            .drop("__tn", "__blk", "__new", "__lseq", "__off", "__ok", "__ob"))


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str | None,
    point_col: str,
    begin_col: str,
    end_col: str,
    bucket: float,
) -> DataFrame:
    """Inner join of ``points`` to every interval containing them:
    ``begin <= point < end`` (and equal ``key`` when given).

    Implementation: fixed-width bucketing.  Each interval explodes to
    the buckets it overlaps, each point maps to its single bucket, the
    two sides equi-join on (key, bucket) — Catalyst gets a plain hash
    join with shuffle O(points + sum(interval_width / bucket)) instead
    of the broadcast-nested-loop a raw inequality predicate plans.
    The exact containment predicate then drops edge-bucket misses.
    Pick ``bucket`` near the typical interval width: too small inflates
    the interval explode, too large degrades toward per-bucket
    mini-cartesians.  Timestamps are bucketed via their epoch seconds.
    """
    def to_num_p(c):
        return _as_seconds(points, c)

    def to_num(c):
        return _as_seconds(intervals, c)

    p_b = F.floor(to_num_p(point_col) / bucket).alias("__b")
    pts = points.withColumn("__b", p_b)
    # empty/inverted intervals contain nothing — and would otherwise
    # make sequence() count DOWNWARD and explode a bogus bucket range
    # floor(end/bucket) may explode one bucket past the half-open end
    # when end sits exactly on a boundary — the exact containment
    # filter below drops it, which is simpler and safer than an
    # epsilon (below one ulp at epoch-seconds magnitude, and wrong for
    # ends within the epsilon of a boundary)
    ivl = intervals.filter(to_num(end_col) > to_num(begin_col)).withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(to_num(begin_col) / bucket).cast("long"),
                F.floor(to_num(end_col) / bucket).cast("long"),
            )
        ),
    )
    joined = (
        pts.join(ivl, ["__b"] + ([key] if key else []))
        .filter((to_num_p(point_col) >= to_num(begin_col))
                & (to_num_p(point_col) < to_num(end_col)))
        .drop("__b")
    )
    return joined


def retention_cohorts(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by their first-activity
    period (the cohort), counted in every later period they were active.

    Returns (cohort, period_offset, n_users): cohort is the truncated
    first-activity timestamp, period_offset the whole number of periods
    between cohort and the activity period (0 = the cohort period
    itself), n_users the count of the cohort's users active then —
    the retention-curve input every activity dashboard draws.

    ``period``: 'week' or 'day' (both truncate identically in Spark and
    standard SQL engines — week is Monday-start).  Offsets are computed
    CALENDAR-wise (datediff of the truncated dates / period days), not
    from epoch arithmetic — a DST spring-forward week is 604800-3600
    epoch seconds, which would truncate to the previous offset and
    double-count the user there in any DST session timezone.

    Scale: distinct (key, period) first — the corpus-sized pass
    collapses to at most |users| x |periods| rows with map-side partial
    aggregation — then a per-key min and an equi-join on the key.  No
    windows, no inequality joins.
    """
    days = {"day": 1, "week": 7}
    if period not in days:
        raise ValueError(f"period must be one of {sorted(days)}")
    dt = dict(df.dtypes)[ts]
    if not (dt.startswith("timestamp") or dt == "date"):
        raise ValueError(
            f"retention_cohorts needs a timestamp/date column; {ts} is {dt}")
    act = df.select(F.col(key).alias("__k"),
                    F.date_trunc(period, F.col(ts)).alias("__p")).distinct()
    coh = act.groupBy("__k").agg(F.min("__p").alias("__c"))
    return (
        act.join(coh, "__k")
        .select(
            F.col("__c").alias("cohort"),
            # truncated periods are whole calendar days apart, so the
            # day-diff is an exact multiple of the period length
            (F.datediff(F.col("__p").cast("date"), F.col("__c").cast("date"))
             / days[period]).cast("long").alias("period_offset"),
            F.col("__k"),
        )
        .groupBy("cohort", "period_offset")
        .agg(F.count("*").alias("n_users"))
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    key: str = "user_id",
    ts: str = "ts",
    type_col: str = "event_type",
    within: float | None = None,
    anchor: str = "min",
    max_anchors: int = 64,
) -> DataFrame:
    """Ordered funnel: how many users completed steps[0..k] IN ORDER,
    for every k.  A user reaches step k if events of the step types
    exist at non-decreasing timestamps; the greedy earliest-completion
    cascade (t1 = anchor ts; tk = min ts of step k at or after
    t_{k-1}) decides existence exactly (exchange argument: taking the
    earliest valid event at each step never forecloses a later one).

    ``within``: optional max seconds from the step-1 anchor to any
    later step (conversion window).  ``anchor`` picks the windowed
    semantics:

    - ``"min"`` (default): the window anchors at the user's EARLIEST
      step-1 event only — cheap (one cascade row per user) but a user
      who converts within the window of a LATER step-1 occurrence is
      not counted.
    - ``"any"``: the analytics-industry default — the user converts
      if ANY of their step-1 events anchors a full in-window chain.
      Exact via bounded-candidate anchoring: the cascade runs per
      (user, distinct step-1 ts) and a user counts at step k when any
      candidate completes it.  Join fan-out is bounded by
      ``max_anchors`` candidates per user; a user exceeding the cap
      is a LOUD error (cap or pre-aggregate step-1 events upstream —
      silent truncation would undercount conversions).  Requires
      ``within`` (without a window the earliest anchor dominates, so
      ``"min"`` is already exact).

    Returns (step int 1-based, step_name, n_users), n_users monotone
    non-increasing.  Each cascade level is one equi-join on the key +
    a per-(key[, anchor]) min — no window over the event stream, no
    inequality join (the time predicates are post-join filters on
    co-keyed rows).  The operator is EAGER: per-level state (one row
    per surviving user/candidate) is persisted so each level's two
    consumers share it, the final counts (len(steps) numbers) are
    collected, and every intermediate is unpersisted before returning
    — nothing lingers in the cache.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    if anchor not in ("min", "any"):
        raise ValueError(f"anchor must be 'min' or 'any', got {anchor!r}")
    if anchor == "any" and within is None:
        raise ValueError(
            "anchor='any' requires a `within` window — without one the "
            "earliest anchor dominates and anchor='min' is already exact")
    spark = df.sparkSession
    first = df.filter(F.col(type_col) == steps[0]).select(
        F.col(key).alias("__k"), F.col(ts).alias("__t1"))
    if anchor == "min":
        group_keys = ["__k"]
        acc = first.groupBy("__k").agg(F.min("__t1").alias("__t1")).persist()
    else:
        group_keys = ["__k", "__t1"]
        acc = first.distinct().persist()
        over = (acc.groupBy("__k").count()
                .filter(F.col("count") > max_anchors)
                .orderBy(F.desc("count")).limit(1).collect())
        if over:
            acc.unpersist()
            raise ValueError(
                f"funnel(anchor='any'): key {over[0]['__k']!r} has "
                f"{over[0]['count']} candidate step-1 anchors > "
                f"max_anchors={max_anchors} — raise the cap or bound "
                "step-1 events per key upstream")
    cached = [acc]
    for i, s in enumerate(steps[1:], start=2):
        ev = df.filter(F.col(type_col) == s).select(
            F.col(key).alias("__k"), F.col(ts).alias("__e"))
        prev_cols = list(group_keys) + [f"__t{i-1}"]
        if within is not None and "__t1" not in prev_cols:
            prev_cols.append("__t1")
        j = ev.join(acc.select(*prev_cols).filter(
            F.col(f"__t{i-1}").isNotNull()), "__k") \
              .filter(F.col("__e") >= F.col(f"__t{i-1}"))
        if within is not None:
            j = j.filter(
                _as_seconds(j, "__e")
                <= _as_seconds(j, "__t1") + float(within))
        stepk = j.groupBy(*group_keys).agg(F.min("__e").alias(f"__t{i}"))
        acc = acc.join(stepk, group_keys, "left").persist()
        cached.append(acc)
    if anchor == "min":
        count_exprs = [F.count(f"__t{i}").alias(f"__n{i}")
                       for i in range(1, len(steps) + 1)]
    else:
        count_exprs = [
            F.count_distinct(
                F.when(F.col(f"__t{i}").isNotNull(), F.col("__k")))
            .alias(f"__n{i}")
            for i in range(1, len(steps) + 1)]
    [row] = acc.agg(*count_exprs).collect()
    for c in cached:
        c.unpersist()
    return spark.createDataFrame(
        [(i, name, int(row[f"__n{i}"]))
         for i, name in enumerate(steps, start=1)],
        "step int, step_name string, n_users long",
    )
