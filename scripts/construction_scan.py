"""Jobs-aware construction scan (guide §1 measurement for the py4j
construction tax): time each queries()[key] CALL — pure driver-side
plan construction — separately from execution, and record whether the
call itself ran Spark jobs (an embedded eager action, e.g. a persist
fill or a collect-for-literals), because those keys' construction
seconds are NOT pure py4j and need a different treatment.

Usage:
    python scripts/construction_scan.py [sf_dir] [key1,key2,...]

Output: one line per key `key construct_sec jobs_during_construct`,
sorted descending by construction time, plus a >=0.25s tail summary.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)

from streaming_demos_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="construction_scan")
import __spark_entry__ as E  # noqa: E402

Q = E.queries()
keys = sys.argv[2].split(",") if len(sys.argv) > 2 else list(Q)
tracker = spark.sparkContext.statusTracker()

results = []
for key in keys:
    # Two construction passes: the first pays one-time imports/session
    # warmup; the second is the steady-state py4j cost a bench pass pays.
    for p in range(2):
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        try:
            df = Q[key](spark, SF)
        except Exception as exc:  # noqa: BLE001
            print(f"{key} FAILED {type(exc).__name__}: {exc}", file=sys.stderr)
            break
        el = time.perf_counter() - t0
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(jobs_after - jobs_before)
    else:
        results.append((key, el, n_jobs))

results.sort(key=lambda r: -r[1])
total = sum(r[1] for r in results)
tail = [(k, s, j) for k, s, j in results if s >= 0.25]
print(f"# {len(results)} keys, total construction {total:.2f}s, "
      f"{len(tail)} keys >= 0.25s summing {sum(s for _, s, _ in tail):.2f}s")
for k, s, j in results:
    print(f"{k}\t{s:.3f}\t{j}")
