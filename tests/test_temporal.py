"""operators/temporal.py: as-of join, sessionization, range join.

Hand-computable cases for match/tie/tolerance/unmatched semantics, gap
boundaries, and end-exclusive bucketed containment; the cross-engine
gates (asof_join vs DuckDB's native ASOF JOIN, sessionize/range_join
vs window SQL) cover the corpus-scale parity.
"""

from pyspark.sql import functions as F

from presto_bloomfilter_spark.operators import temporal


def test_as_of_join_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 20.0), (3, "u", 5.0), (4, "v", 50.0)],
        "id long, k string, ts double")
    right = spark.createDataFrame(
        [("u", 10.0, "a"), ("u", 15.0, "b"), ("w", 1.0, "z")],
        "k string, ts double, tag string")
    got = {r.id: (r.matched_ts, r.matched_tag)
           for r in temporal.as_of_join(
               left, right, "k", "ts", "ts", ["tag"]).collect()}
    assert got[1] == (10.0, "a")      # tie at equal ts matches
    assert got[2] == (15.0, "b")      # latest preceding
    assert got[3] == (None, None)     # nothing at or before ts=5
    assert got[4] == (None, None)     # key with no right rows


def test_as_of_join_tolerance(spark):
    left = spark.createDataFrame([(1, "u", 100.0)], "id long, k string, ts double")
    right = spark.createDataFrame([("u", 10.0, 7.0)], "k string, ts double, v double")
    loose = temporal.as_of_join(left, right, "k", right_payload=["v"],
                                tolerance=F.lit(1000.0)).collect()[0]
    tight = temporal.as_of_join(left, right, "k", right_payload=["v"],
                                tolerance=F.lit(10.0)).collect()[0]
    assert loose.matched_v == 7.0
    assert tight.matched_v is None    # match is 90 units stale > 10


def test_sessionize_gap_boundary(spark):
    # gaps of exactly `gap` do NOT open a session; > gap does
    df = spark.createDataFrame(
        [(1, "u", 0.0), (2, "u", 30.0), (3, "u", 60.1), (4, "v", 0.0)],
        "id long, k string, ts double")
    got = {r.id: r.session_seq
           for r in temporal.sessionize(df, "k", "ts", gap=30.0).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_range_join_end_exclusive_and_buckets(spark):
    iv = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 15.0, 18.0), (3, 30.0, 30.0)],
        "iid long, b double, e double")
    pt = spark.createDataFrame(
        [(100, 12.0), (101, 17.0), (102, 20.0), (103, 30.0)],
        "pid long, v double")
    got = sorted((r.pid, r.iid) for r in temporal.range_join(
        pt, iv, None, "v", "b", "e", bucket=4.0).collect())
    # 102 at v=20 excluded (end-exclusive); empty interval 3 matches nothing
    assert got == [(100, 1), (101, 1), (101, 2)]


def test_range_join_keyed(spark):
    iv = spark.createDataFrame(
        [("a", 0.0, 100.0), ("b", 0.0, 100.0)], "k string, b double, e double")
    pt = spark.createDataFrame([("a", 50.0)], "k string, v double")
    got = [(r.k, r.b) for r in temporal.range_join(
        pt, iv, "k", "v", "b", "e", bucket=10.0).collect()]
    assert got == [("a", 0.0)]        # key match required


def test_as_of_join_is_join_free(spark):
    """The union-merge implementation must plan ZERO join operators —
    that's the whole point vs a naive inequality join."""
    import contextlib
    import io

    left = spark.createDataFrame([(1, "u", 1.0)], "id long, k string, ts double")
    right = spark.createDataFrame([("u", 1.0, "x")], "k string, ts double, t string")
    out = temporal.as_of_join(left, right, "k", right_payload=["t"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_as_of_join_null_keys_never_match(spark):
    """SQL join equality never matches NULL keys (review finding): a
    NULL-keyed left row keeps NULL payload even when NULL-keyed right
    rows exist."""
    left = spark.createDataFrame([(1, None, 10.0)], "id long, k string, ts double")
    right = spark.createDataFrame([(None, 5.0, "x")], "k string, ts double, t string")
    [r] = temporal.as_of_join(left, right, "k", right_payload=["t"]).collect()
    assert r.matched_ts is None and r.matched_t is None


def test_as_of_join_null_right_ts_never_match(spark):
    """A NULL-timestamp right row can never satisfy right.ts <= left.ts
    (advisor finding): without the pre-union filter NULL __t sorts
    FIRST and its payload would be carried into every later left row."""
    left = spark.createDataFrame(
        [(1, "u", 10.0), (2, "u", 20.0)], "id long, k string, ts double")
    right = spark.createDataFrame(
        [("u", None, "bad"), ("u", 15.0, "good")],
        "k string, ts double, t string")
    got = {r.id: (r.matched_ts, r.matched_t)
           for r in temporal.as_of_join(
               left, right, "k", right_payload=["t"]).collect()}
    assert got[1] == (None, None)       # only the NULL-ts row precedes
    assert got[2] == (15.0, "good")


def test_sessionize_null_ts_each_own_session(spark):
    df = spark.createDataFrame(
        [(1, "u", None), (2, "u", None), (3, "u", 0.0), (4, "u", 5.0)],
        "id long, k string, ts double")
    got = {r.id: r.session_seq
           for r in temporal.sessionize(df, "k", "ts", gap=30.0).collect()}
    # NULLs sort first, each its own session; the first real ts opens a
    # fresh one (gap vs NULL unknowable); 5.0 continues it
    assert got == {1: 1, 2: 2, 3: 3, 4: 3}


def test_range_join_end_on_bucket_boundary(spark):
    # end exactly on a boundary: extra exploded bucket is filtered, and
    # a point equal to end stays excluded (half-open)
    iv = spark.createDataFrame([(1, 0.0, 8.0)], "iid long, b double, e double")
    pt = spark.createDataFrame([(100, 7.999), (101, 8.0)], "pid long, v double")
    got = sorted((r.pid, r.iid) for r in temporal.range_join(
        pt, iv, None, "v", "b", "e", bucket=4.0).collect())
    assert got == [(100, 1)]


def _mixed_events(spark, n_keys=7, n_per_key=40):
    """Deterministic pseudo-random events incl. duplicate and NULL
    timestamps and a NULL key — every edge the salted stitch must
    preserve."""
    rows = []
    rid = 0
    for k in range(n_keys):
        key = None if k == 0 else f"u{k}"
        for i in range(n_per_key):
            h = (k * 131071 + i * 8191) % 997
            ts = None if h % 29 == 0 else float(h % 200) * 7.0
            rows.append((rid, key, ts))
            rid += 1
    return spark.createDataFrame(rows, "id long, k string, ts double")


def test_sessionize_salted_equals_unsalted(spark):
    df = _mixed_events(spark)
    base = {(r.id): r.session_seq
            for r in temporal.sessionize(df, "k", "ts", gap=25.0).collect()}
    for blk in (10.0, 50.0, 1000.0):  # narrower AND wider than gap
        got = {(r.id): r.session_seq
               for r in temporal.sessionize(
                   df, "k", "ts", gap=25.0, salt_block=blk).collect()}
        assert got == base, f"salt_block={blk}"


def test_as_of_join_salted_equals_unsalted(spark):
    ev = _mixed_events(spark)
    left = ev.filter("id % 3 != 0")
    right = (ev.filter("id % 3 = 0")
             .groupBy("k", "ts").agg(F.min("id").alias("rid")))  # unique (k, ts)
    base = {r.id: (r.matched_ts, r.matched_rid)
            for r in temporal.as_of_join(
                left, right, "k", right_payload=["rid"]).collect()}
    for blk in (13.0, 200.0):
        got = {r.id: (r.matched_ts, r.matched_rid)
               for r in temporal.as_of_join(
                   left, right, "k", right_payload=["rid"],
                   salt_block=blk).collect()}
        assert got == base, f"salt_block={blk}"


def test_salted_hot_key_runs_on_many_tasks(spark):
    """One key holding 10^6 events: the salted plans must spread it
    over >1 task (the unsalted window serializes it into one), with
    results identical to the sequential definition."""
    n = 1_000_000
    gap, blk = 3.0, 10_000.0
    ev = spark.range(n).selectExpr(
        "cast(id as long) id", "'hot' k",
        # every 1000th gap is 5.0 (> gap) => exactly n/1000 sessions
        "cast((id div 1000) * 5.0 + (id % 1000) * 0.001 as double) ts")
    old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        sess = temporal.sessionize(ev, "k", "ts", gap=gap, salt_block=blk)
        agg = sess.groupBy("session_seq").count()
        n_tasks = (sess.select(F.spark_partition_id().alias("p"))
                   .distinct().count())
        assert n_tasks > 1
        dist = {r.session_seq: r["count"] for r in agg.collect()}
        assert len(dist) == n // 1000
        assert set(dist.values()) == {1000}
        # as-of: latest session-opening event at or before each probe
        left = spark.createDataFrame(
            [(1, "hot", 2_503.2), (2, "hot", 0.0), (3, "hot", 4_999_999.0)],
            "id long, k string, ts double")
        right = ev.filter("id % 1000 = 0").selectExpr("k", "ts", "id rid")
        got = {r.id: r.matched_rid for r in temporal.as_of_join(
            left, right, "k", right_payload=["rid"],
            salt_block=blk).collect()}
        assert got == {1: 500_000, 2: 0, 3: 999_000}
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old)


def test_retention_cohorts_hand_computed(spark):
    import datetime as dt

    def t(day):
        return dt.datetime(2024, 1, day)

    rows = [
        ("a", t(1)), ("a", t(8)), ("a", t(22)),   # cohort wk0: active 0,1,3
        ("b", t(2)), ("b", t(2)),                 # cohort wk0: active 0 only
        ("c", t(9)),                              # cohort wk1: active 0
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {(str(r.cohort)[:10], r.period_offset): r.n_users
           for r in temporal.retention_cohorts(df, "user_id", "ts").collect()}
    assert got == {
        ("2024-01-01", 0): 2,   # a and b in week of Jan 1
        ("2024-01-01", 1): 1,   # only a returns
        ("2024-01-01", 3): 1,
        ("2024-01-08", 0): 1,   # c's own cohort
    }


def test_funnel_order_and_window(spark):
    import datetime as dt

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    rows = [
        # u1 completes in order
        ("u1", "view", t(0)), ("u1", "click", t(5)), ("u1", "buy", t(10)),
        # u2 clicked BEFORE viewing: click must not count
        ("u2", "click", t(0)), ("u2", "view", t(5)),
        # u3 converts but outside a 6-minute window
        ("u3", "view", t(0)), ("u3", "click", t(20)),
    ]
    df = spark.createDataFrame(rows, "user_id string, event_type string, ts timestamp")
    base = {(r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click", "buy"]).collect()}
    assert base == {(1, 3), (2, 2), (3, 1)}
    # 11-minute window: u1's whole funnel fits (click +5m, buy +10m);
    # u3's 20-minute click does not
    windowed = {(r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click", "buy"], within=660.0).collect()}
    assert windowed == {(1, 3), (2, 1), (3, 1)}


def test_funnel_any_anchor_counts_later_windows(spark):
    """The case min-anchor misses: u1's FIRST view at t=0 can't convert
    within 10 min (click at t=30), but the view at t=25 can — any-anchor
    counts it.  u2 has no in-window chain from any anchor."""
    import datetime as dt

    def t(minute):
        return dt.datetime(2024, 1, 1, 0, minute)

    rows = [
        ("u1", "view", t(0)), ("u1", "view", t(25)), ("u1", "click", t(30)),
        ("u2", "view", t(0)), ("u2", "click", t(40)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")
    mins = {(r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click"], within=600.0).collect()}
    assert mins == {(1, 2), (2, 0)}          # min-anchor misses u1
    anys = {(r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click"], within=600.0, anchor="any").collect()}
    assert anys == {(1, 2), (2, 1)}          # any-anchor counts u1

    # greedy chain per anchor: the u1 anchor at 25 reaches a 3-step
    # funnel only if a buy lands within ITS window
    rows3 = rows + [("u1", "buy", t(34)), ("u2", "buy", t(41))]
    df3 = spark.createDataFrame(
        rows3, "user_id string, event_type string, ts timestamp")
    anys3 = {(r.step, r.n_users) for r in temporal.funnel(
        df3, ["view", "click", "buy"], within=600.0, anchor="any").collect()}
    assert anys3 == {(1, 2), (2, 1), (3, 1)}


def test_funnel_any_anchor_equals_min_for_single_anchors(spark):
    """With one step-1 event per user the two semantics coincide."""
    import datetime as dt

    rows = []
    for u in range(20):
        base = dt.datetime(2024, 1, 1, u)
        rows.append((f"u{u}", "view", base))
        if u % 2 == 0:
            rows.append((f"u{u}", "click",
                         base + dt.timedelta(minutes=u)))
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")
    a = sorted((r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click"], within=900.0).collect())
    b = sorted((r.step, r.n_users) for r in temporal.funnel(
        df, ["view", "click"], within=900.0, anchor="any").collect())
    assert a == b


def test_funnel_any_anchor_cap_is_loud(spark):
    import datetime as dt

    import pytest as _pytest

    rows = [("hot", "view", dt.datetime(2024, 1, 1, 0, 0, s))
            for s in range(10)]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")
    with _pytest.raises(ValueError, match="candidate step-1 anchors"):
        temporal.funnel(df, ["view", "click"], within=60.0,
                        anchor="any", max_anchors=5)
    with _pytest.raises(ValueError, match="requires a `within`"):
        temporal.funnel(df, ["view", "click"], anchor="any")
    with _pytest.raises(ValueError, match="anchor must be"):
        temporal.funnel(df, ["view"], anchor="first")


def test_retention_cohorts_dst_safe(spark):
    """Calendar offsets, not epoch arithmetic: the 2024-03-10 US
    spring-forward week is 3600 epoch-seconds short of 7 days, which
    would truncate the following week's offset to 0 and double-count
    the user (live-reproduced review finding)."""
    import datetime as dt

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = spark.createDataFrame(
            [("u", dt.datetime(2024, 3, 4)), ("u", dt.datetime(2024, 3, 11)),
             ("u", dt.datetime(2024, 3, 18))],
            "user_id string, ts timestamp")
        got = {r.period_offset: r.n_users
               for r in temporal.retention_cohorts(df).collect()}
        assert got == {0: 1, 1: 1, 2: 1}
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_retention_cohorts_rejects_numeric_ts(spark):
    import pytest as _pytest

    df = spark.createDataFrame([("u", 5.0)], "user_id string, ts double")
    with _pytest.raises(ValueError, match="timestamp"):
        temporal.retention_cohorts(df)
