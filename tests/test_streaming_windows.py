

def test_sliding_window_membership(spark):
    from datetime import datetime
    from emdatapipelines_spark.streaming.windows import sliding_window_counts

    # one event at 10:20 with 1h/15m windows -> exactly 4 windows,
    # starts 09:30, 09:45, 10:00, 10:15
    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1, 10, 20))], "event_type string, ts timestamp"
    )
    out = sliding_window_counts(df, "ts", "1 hour", "15 minutes", ["event_type"], watermark=None)
    rows = sorted(r["window_start"].strftime("%H:%M") for r in out.collect())
    assert rows == ["09:30", "09:45", "10:00", "10:15"]
    assert all(r["event_count"] == 1 for r in out.collect())
