"""bench.py noise meter: the condensation logic and /proc/stat parsing
must be correct even though the full bench run is a driver-side tool —
a wrong cal_inflation would misattribute a future bench delta."""

import bench


def _reset():
    bench._state["calibration"] = []
    bench._state["steal_marks"] = []


def test_noise_summary_empty_is_empty():
    _reset()
    assert bench._noise_summary() == {}


def test_noise_summary_calibration_ratio():
    _reset()
    for i, sec in enumerate([0.10, 0.15, 0.12, 0.40, 0.11]):
        bench._state["calibration"].append({"pass": 0, "idx": i, "sec": sec})
    out = bench._noise_summary()
    assert out["cal_min_sec"] == 0.10
    # sorted: .10 .11 .12 .15 .40 -> median index 2 = .12
    assert out["cal_median_sec"] == 0.12
    assert out["cal_inflation"] == round(0.12 / 0.10, 3)


def test_noise_summary_steal_pct_from_marks():
    _reset()
    bench._state["steal_marks"] = [
        {"label": "sweep_start", "steal": 1000, "total": 100000, "t": 0.0},
        {"label": "pass_0_end", "steal": 1100, "total": 101000, "t": 5.0},
        {"label": "pass_1_end", "steal": 1500, "total": 110000, "t": 9.0},
    ]
    out = bench._noise_summary()
    # first-to-last deltas: steal 500 over total 10000 -> 5%
    assert out["steal_pct"] == 5.0


def test_mark_steal_reads_proc_stat():
    _reset()
    bench._mark_steal("probe")
    marks = bench._state["steal_marks"]
    # /proc/stat exists on this platform; the mark must be well-formed
    # and monotone against a second sample
    assert len(marks) == 1 and marks[0]["label"] == "probe"
    assert marks[0]["total"] > 0 and marks[0]["steal"] >= 0
    bench._mark_steal("probe2")
    assert bench._state["steal_marks"][1]["total"] >= marks[0]["total"]


def test_zero_min_calibration_guard():
    _reset()
    bench._state["calibration"] = [{"pass": 0, "idx": 0, "sec": 0.0}]
    out = bench._noise_summary()
    assert out["cal_inflation"] is None
