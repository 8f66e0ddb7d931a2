from bqetl_spark.operators.asof import asof_join


def _frames(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t1"), (1, 20, "t2"), (1, 5, "t0"), (2, 10, "t3")],
        ["k", "t", "trade"])
    quotes = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 101.0), (2, 30, 200.0)],
        ["k", "t", "px"])
    return trades, quotes


def test_asof_latest_at_or_before(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="t", by="k").collect()
    got = {r["trade"]: r["px_asof"] for r in out}
    assert got["t1"] == 100.0      # t=10 → quote at 8
    assert got["t2"] == 101.0      # t=20 → quote at 15
    assert got["t0"] is None       # t=5 → no quote yet
    assert got["t3"] is None       # k=2 quote is later (30 > 10)


def test_asof_equal_time_matches(spark):
    trades, quotes = _frames(spark)
    eq = spark.createDataFrame([(1, 8, "teq")], ["k", "t", "trade"])
    out = asof_join(eq, quotes, on="t", by="k").collect()
    assert out[0]["px_asof"] == 100.0  # right row at equal time included


def test_asof_keeps_all_left_rows(spark):
    trades, quotes = _frames(spark)
    assert asof_join(trades, quotes, on="t", by="k").count() == trades.count()


def test_asof_forward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="t", by="k",
                    direction="forward").collect()
    got = {r["trade"]: r["px_asof"] for r in out}
    assert got["t0"] == 100.0      # t=5 → next quote at 8
    assert got["t1"] == 101.0      # t=10 → next quote at 15
    assert got["t2"] is None       # t=20 → nothing after
    assert got["t3"] == 200.0      # k=2, t=10 → quote at 30


def test_asof_nearest_ties_backward(spark):
    trades, quotes = _frames(spark)
    out = asof_join(trades, quotes, on="t", by="k",
                    direction="nearest").collect()
    got = {r["trade"]: r["px_asof"] for r in out}
    assert got["t0"] == 100.0      # only forward exists
    assert got["t2"] == 101.0      # only backward exists
    assert got["t3"] == 200.0      # only forward exists (k=2)
    # t1 at t=10: backward dist 2 (t=8), forward dist 5 (t=15) → backward
    assert got["t1"] == 100.0
    # exact equidistance resolves backward
    eq_trades = spark.createDataFrame([(1, 10, "e")], ["k", "t", "trade"])
    eq_quotes = spark.createDataFrame(
        [(1, 8, 1.0), (1, 12, 2.0)], ["k", "t", "px"])
    eq = asof_join(eq_trades, eq_quotes, on="t", by="k",
                   direction="nearest").collect()
    assert eq[0]["px_asof"] == 1.0
