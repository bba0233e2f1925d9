"""Z-order layout clustering: exact Morton keys vs a pure-python
reference, map-only bucketing, scan-pruning payoff, approx (KLL) mode,
and the clustered-write composition."""

import pytest

from presto_bloomfilter_spark.operators import layout


def _ref_zkeys(rows, bits=8):
    """Pure-python reference: dense-rank levels + Morton interleave."""
    dims = list(zip(*[(r[1], r[2]) for r in rows]))
    lvl_maps = []
    for vals in dims:
        nn = sorted({v for v in vals if v is not None})
        n = len(nn)
        lvl_maps.append({v: (i * (1 << bits)) // n for i, v in enumerate(nn)})
    out = {}
    for rid, a, b in rows:
        la = lvl_maps[0].get(a, 0)
        lb = lvl_maps[1].get(b, 0)
        z = 0
        for j in range(bits):
            z |= ((la >> j) & 1) << (2 * j)
            z |= ((lb >> j) & 1) << (2 * j + 1)
        out[rid] = z
    return out


def test_zorder_keys_match_reference(spark):
    rows = [(i, (i * 7) % 23, float((i * 13) % 41)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    got = {r.id: r.zkey
           for r in layout.zorder_keys(df, ["x", "y"], bits=8).collect()}
    assert got == _ref_zkeys(rows, bits=8)


def test_zorder_null_values_rank_lowest(spark):
    rows = [(1, None, 5.0), (2, 3, None), (3, 3, 5.0)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    got = {r.id: r.zkey
           for r in layout.zorder_keys(df, ["x", "y"], bits=4).collect()}
    # null dims contribute level 0; row 3 has both dims at their only
    # (hence rank-0) non-null values, so all three keys are 0
    assert got == {1: 0, 2: 0, 3: 0}


def test_zorder_bucketing_is_high_bits(spark):
    rows = [(i, i, float(i)) for i in range(64)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    out = layout.zorder_layout(df, ["x", "y"], n_buckets=4, bits=4).collect()
    for r in out:
        assert r.zbucket == r.zkey >> 6  # 2*4 bits - log2(4)


def test_zorder_pruning_payoff(spark):
    # independent uniform dims: 16 buckets = a 4x4 grid, so a narrow
    # x-range predicate intersects ~4 bucket bboxes, not all 16
    rows = [(i, (i * 37) % 256, float((i * 53) % 256)) for i in range(2048)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    z = layout.zorder_layout(df, ["x", "y"], n_buckets=16, bits=8)
    boxes = (z.groupBy("zbucket")
             .agg({"x": "min"}).withColumnRenamed("min(x)", "mn")
             .join(z.groupBy("zbucket").agg({"x": "max"})
                   .withColumnRenamed("max(x)", "mx"), "zbucket")
             .collect())
    assert len(boxes) == 16
    hit = sum(1 for b in boxes if b.mn <= 40 and 10 <= b.mx)
    assert hit <= 6, f"x-range [10,40] intersects {hit}/16 bucket bboxes"


def test_zorder_approx_mode_clusters(spark):
    rows = [(i, (i * 37) % 256, float((i * 53) % 256)) for i in range(2048)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    z = layout.zorder_layout(df, ["x", "y"], n_buckets=16, bits=6,
                             mode="approx")
    boxes = (z.groupBy("zbucket")
             .agg({"x": "min"}).withColumnRenamed("min(x)", "mn")
             .join(z.groupBy("zbucket").agg({"x": "max"})
                   .withColumnRenamed("max(x)", "mx"), "zbucket")
             .collect())
    hit = sum(1 for b in boxes if b.mn <= 40 and 10 <= b.mx)
    assert hit <= max(6, len(boxes) // 2), f"{hit}/{len(boxes)}"


def test_cluster_for_write_partitions_and_order(spark):
    rows = [(i, (i * 37) % 256, float((i * 53) % 256)) for i in range(512)]
    df = spark.createDataFrame(rows, "id long, x long, y double")
    out = layout.cluster_for_write(df, ["x", "y"], n_files=8, bits=6,
                                   mode="approx")
    assert out.rdd.getNumPartitions() == 8

    def _sorted_within(it):
        keys = [r.zkey for r in it]
        yield keys == sorted(keys)

    assert all(out.rdd.mapPartitions(_sorted_within).collect())


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2, 3.0)], "id long, x long, y double")
    with pytest.raises(ValueError, match="at least 2"):
        layout.zorder_keys(df, ["x"])
    with pytest.raises(ValueError, match="overflows"):
        layout.zorder_keys(df, ["x", "y", "id"], bits=21)
    with pytest.raises(ValueError, match="power of two"):
        layout.zorder_layout(df, ["x", "y"], n_buckets=3)
    with pytest.raises(ValueError, match="unknown mode"):
        layout.zorder_keys(df, ["x", "y"], mode="bogus")
    with pytest.raises(ValueError, match="no non-null"):
        layout.zorder_keys(
            df.selectExpr("id", "CAST(NULL AS BIGINT) AS x", "y"),
            ["x", "y"])


def test_zorder_map_only_after_level_join(spark):
    # the interleave itself must be a projection: no Python anywhere,
    # and the only exchanges are the level-map builds/joins
    df = spark.createDataFrame([(1, 2, 3.0), (2, 4, 1.0)],
                               "id long, x long, y double")
    plan = (layout.zorder_keys(df, ["x", "y"], bits=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan
