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
