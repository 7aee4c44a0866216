"""rate_anomaly: dense-spine trailing z-test semantics on a constructed
hour series — a spike is flagged, steady state is not, silent hours count
as zero, and the zero-variance window degrades to any-deviation."""

from __future__ import annotations

import datetime as dt

from trough_spark.operators.temporal import rate_anomaly


def _events(spark, counts_by_hour, etype="click"):
    """counts_by_hour: list of event counts for consecutive hours."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h, n in enumerate(counts_by_hour):
        for i in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=i % 60), etype))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def test_spike_flagged_steady_not(spark):
    # 24 steady hours of ~10 (alternating 9/11 for nonzero variance),
    # then one 100-spike, then back to 10
    counts = [9, 11] * 12 + [100, 10]
    ev = _events(spark, counts)
    out = {r["hour_start"].hour + 24 * (r["hour_start"].day - 1): r
           for r in rate_anomaly(ev, trailing=24, k=3).collect()}
    # hour index 24 is the spike (trailing = the steady block)
    assert out[24]["is_anomaly"] is True and out[24]["n_events"] == 100
    assert out[25]["is_anomaly"] is False  # 10 is within the band


def test_silent_hour_is_anomalous_via_dense_spine(spark):
    # steady 9/11 traffic, then an hour with ZERO events (absent from the
    # raw table entirely), then traffic resumes: the spine must create the
    # zero row and flag it
    counts = [9, 11] * 12 + [0, 10]
    ev = _events(spark, counts)
    rows = rate_anomaly(ev, trailing=24, k=3).collect()
    byh = {r["hour_start"].hour + 24 * (r["hour_start"].day - 1): r for r in rows}
    assert byh[24]["n_events"] == 0 and byh[24]["is_anomaly"] is True


def test_zero_variance_window_flags_any_deviation(spark):
    counts = [10] * 24 + [10, 11]
    ev = _events(spark, counts)
    byh = {r["hour_start"].hour + 24 * (r["hour_start"].day - 1): r
           for r in rate_anomaly(ev, trailing=24, k=3).collect()}
    assert byh[24]["z2_ppm"] is None and byh[24]["is_anomaly"] is False  # 10 == mean
    assert byh[25]["is_anomaly"] is True  # 11 deviates from constant 10


def test_warmup_hours_not_emitted(spark):
    ev = _events(spark, [10] * 30)
    rows = rate_anomaly(ev, trailing=24, k=3).collect()
    # 30 hours, first 24 are warm-up -> 6 scored rows
    assert len(rows) == 6
