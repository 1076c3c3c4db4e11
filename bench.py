"""Benchmark harness: run every declared query end-to-end at the bench
scale factor and emit ONE parseable JSON line on stdout.

Execution is forced through the ``noop`` sink (full computation on the
executors, zero driver materialization cost) so the timing measures the
plan, not a collect(). Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py

Environment:
- SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
- SPARK_GRAFT_CPUS    local[] parallelism (default 32)
- BENCH_KEYS          comma-separated subset of query keys (default all)
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

from streaming_demos_spark.session import get_spark

_state = {
    "timings": {},
    "failures": {},
    "sf": -1.0,
    "t0": time.perf_counter(),
    # A sweep killed by signal or budget at 10% must be distinguishable
    # from a full min-of-2 run: partial flips False only when every
    # planned pass finishes (ADVICE r2).
    "completed_passes": 0,
    "partial": True,
    # Noise meter (VERDICT r8 #2): this box has bursty CPU-steal that
    # inflated the r8 driver bench 1.32x over the builder's pass on the
    # IDENTICAL tree, and nothing in the artifact could prove it. Two
    # instruments make every future bench delta decomposable into
    # noise x code: (a) a fixed O(1) calibration query (sf-independent
    # pure-JVM compute) sampled through every pass — its spread across
    # samples is pure environment noise, since the plan never changes;
    # (b) /proc/stat steal-time deltas per pass.
    "calibration": [],
    "steal_marks": [],
}

# Calibration sampling cadence: one sample at each pass start plus one
# every CAL_EVERY queries. ~0.1-0.3s per sample keeps total overhead
# under ~2% of a full sweep.
CAL_EVERY = 25


def _run_calibration(spark, rep: int, idx: int) -> None:
    t0 = time.perf_counter()
    # bit_xor, not sum: an ANSI-mode sum of 4M xxhash64 longs overflows
    spark.range(0, 4_000_000, 1, 8).selectExpr(
        "bit_xor(xxhash64(id)) AS s"
    ).write.format("noop").mode("overwrite").save()
    _state["calibration"].append(
        {"pass": rep, "idx": idx,
         "sec": round(time.perf_counter() - t0, 4)}
    )


def _mark_steal(label: str) -> None:
    """Snapshot aggregate CPU steal/total jiffies from /proc/stat."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        vals = [int(x) for x in parts[1:]]
    except (OSError, ValueError, IndexError):
        return
    steal = vals[7] if len(vals) > 7 else 0
    # vals[:8]: guest/guest_nice (fields 9-10) are already counted
    # inside user/nice by the kernel — summing them too would deflate
    # steal_pct on nested-guest hosts.
    _state["steal_marks"].append(
        {"label": label, "steal": steal, "total": sum(vals[:8]),
         "t": round(time.perf_counter() - _state["t0"], 3)}
    )


def _noise_summary() -> dict:
    """Condense the raw samples: calibration min vs median (ratio = the
    multiplicative noise band this run sat in) and steal%% between the
    first and last /proc/stat marks."""
    out = {}
    cal = sorted(s["sec"] for s in _state["calibration"])
    if cal:
        mid = cal[len(cal) // 2]
        out["cal_min_sec"] = round(cal[0], 4)
        out["cal_median_sec"] = round(mid, 4)
        out["cal_inflation"] = round(mid / cal[0], 3) if cal[0] > 0 else None
    marks = _state["steal_marks"]
    if len(marks) >= 2:
        d_steal = marks[-1]["steal"] - marks[0]["steal"]
        d_total = marks[-1]["total"] - marks[0]["total"]
        if d_total > 0:
            out["steal_pct"] = round(100.0 * d_steal / d_total, 2)
    return out


def _emit() -> None:
    """Emit results: full detail on an EARLIER stdout line + a sidecar
    file, then a compact (<200 byte) summary as the LAST stdout line.

    The driver keeps only the last ~2 KB of stdout and parses the final
    line; a single json.dumps of 80+ per-query timings is ~2.4 KB and
    gets truncated mid-object, so the detail must never be last.
    """
    detail = {
        "metric": "bench_total_sec",
        "value": round(time.perf_counter() - _state["t0"], 3),
        "unit": "sec",
        "queries": _state["timings"],
        "sf": _state["sf"],
        "completed_passes": _state["completed_passes"],
        "partial": _state["partial"],
    }
    if _state["failures"]:
        detail["failures"] = _state["failures"]
    noise = _noise_summary()
    if noise:
        detail["noise"] = noise
        detail["calibration_samples"] = _state["calibration"]
        detail["steal_marks"] = _state["steal_marks"]
    try:
        with open("bench_detail.json", "w") as fh:
            json.dump(detail, fh, indent=1)
    except OSError:
        pass
    print(json.dumps(detail))
    timings = _state["timings"]
    summary = {
        "metric": "bench_sum_of_mins_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": _state["sf"],
        "n_queries": len(timings),
        "n_failed": len(_state["failures"]),
        "completed_passes": _state["completed_passes"],
        "partial": _state["partial"],
        "detail": "bench_detail.json",
    }
    # Two compact noise fields so a reader of the one-line summary can
    # separate environment noise from code: cal_inflation ~1.0 means a
    # quiet box; a value like 1.3 says the whole sweep ran in a steal
    # band and absolute seconds should be discounted accordingly.
    if noise.get("cal_inflation") is not None:
        summary["cal_inflation"] = noise["cal_inflation"]
    if noise.get("steal_pct") is not None:
        summary["steal_pct"] = noise["steal_pct"]
    print(json.dumps(summary, separators=(",", ":")))
    sys.stdout.flush()


def _on_term(signum, frame):  # noqa: ARG001 - signal signature
    # An external timeout (the driver's or a wrapper's) must not erase
    # the measurements already taken: flush partial results and exit 0.
    _emit()
    os._exit(0)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        _state["sf"] = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        pass
    # Wall-clock budget: a full 2-pass sweep is ~10-12 min on this box;
    # if the harness allows less, stop timing when the budget is spent
    # and emit what's measured (min-of-fewer is still a valid estimate).
    budget = float(os.environ.get("BENCH_BUDGET_SEC", "3600"))
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    spark = get_spark(app_name="bench")
    import __spark_entry__ as entrymod

    all_queries = entrymod.queries()
    keys = os.environ.get("BENCH_KEYS")
    keys = keys.split(",") if keys else list(all_queries)

    # Warmup at the smallest sf: identical plan shapes compile codegen /
    # JIT once on tiny data, so the timed pass measures steady-state
    # execution rather than first-compile cost (dominant for the
    # from_json/to_json-heavy queries).
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for key in keys:
            if time.perf_counter() - _state["t0"] > budget * 0.25:
                break  # never let warmup eat the measurement budget
            try:
                all_queries[key](spark, warm_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception:  # noqa: BLE001 - warmup is best-effort
                pass

    # This box shows bursty multi-minute CPU-steal stalls (same plan:
    # 3.4s..132s). Min-of-N with INTERLEAVED passes (whole suite per
    # pass) is the noise-robust estimator: a stall window would have to
    # hit the same query in every pass to survive into the minimum.
    # min-of-3 (was 2): this box's multi-minute steal windows routinely
    # cover both passes of neighboring queries in a 2-pass sweep (the
    # r5 mid-round sweep measured a 1.1x median inflation vs r4); a
    # third interleaved pass costs ~6 min and stays far inside the
    # budget guard below.
    reps = int(os.environ.get("BENCH_REPS", "3"))
    timings, failures = _state["timings"], _state["failures"]
    out_of_time = False
    # Prime the calibration plan once so its first timed sample is not
    # codegen-compile-inflated, then snapshot steal before measuring.
    try:
        _run_calibration(spark, -1, -1)
    except Exception:  # noqa: BLE001 - the meter must never break the bench
        pass
    _state["calibration"].clear()
    _mark_steal("sweep_start")
    for rep in range(reps):
        for i, key in enumerate(keys):
            try:
                if i % CAL_EVERY == 0:
                    _run_calibration(spark, rep, i)
            except Exception:  # noqa: BLE001
                pass
            if key in failures:
                continue
            if time.perf_counter() - _state["t0"] > budget:
                out_of_time = True
                print(f"[bench] budget {budget}s spent at pass {rep} {key}",
                      file=sys.stderr)
                break
            try:
                t0 = time.perf_counter()
                all_queries[key](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                el = time.perf_counter() - t0
                if key not in timings or el < timings[key]:
                    timings[key] = round(el, 3)
                print(f"[bench] pass {rep} {key}: {el:.3f}s", file=sys.stderr)
            except Exception as exc:  # noqa: BLE001 - report, keep benching
                failures[key] = f"{type(exc).__name__}: {exc}"[:200]
                timings.pop(key, None)
                print(f"[bench] {key}: FAILED {failures[key]}", file=sys.stderr)
        _mark_steal(f"pass_{rep}_end")
        if out_of_time:
            break
        _state["completed_passes"] = rep + 1
    _state["partial"] = _state["completed_passes"] < reps

    # The driver parses the LAST stdout line — emit exactly one JSON line.
    _emit()
    spark.stop()


if __name__ == "__main__":
    main()
