"""Stage-level profile of declared queries: run each key once (noop
sink) in a bench-shaped session with the UI status API enabled, then
dump per-stage wall time, task time, shuffle bytes and row counts —
the guide §1.1 empirical loop without a browser.

Usage:
    python scripts/profile_query.py key1,key2 [sf_dir] [passes]
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = sys.argv[1].split(",")
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 2

os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)
from streaming_demos_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile", extra_conf={
    "spark.ui.enabled": "true",
    "spark.ui.port": "4049",
})
import __spark_entry__ as E  # noqa: E402

Q = E.queries()
app_id = spark.sparkContext.applicationId
base = f"http://localhost:4049/api/v1/applications/{app_id}"


def stages_snapshot():
    with urllib.request.urlopen(f"{base}/stages?status=complete") as r:
        return {s["stageId"]: s for s in json.load(r)}


for key in KEYS:
    # warm pass compiles codegen; timed passes report min
    for p in range(PASSES + 1):
        before = stages_snapshot()
        spark.sparkContext.setJobDescription(f"{key} pass {p}")
        t0 = time.perf_counter()
        Q[key](spark, SF).write.format("noop").mode("overwrite").save()
        el = time.perf_counter() - t0
        if p == 0:
            continue
        after = stages_snapshot()
        new = [s for sid, s in after.items() if sid not in before]
        new.sort(key=lambda s: -(s.get("executorRunTime") or 0))
        tot_cpu = sum(s.get("executorCpuTime", 0) for s in new) / 1e9
        tot_run = sum(s.get("executorRunTime", 0) for s in new) / 1e3
        print(
            f"\n== {key} pass {p}: {el:.3f}s wall, {len(new)} stages, "
            f"cpu_total={tot_cpu:.2f}s run_total={tot_run:.2f}s =="
        )
        for s in new[:14]:
            name = s.get("name", "?")[:70]
            print(
                f"  run={s.get('executorRunTime',0)/1e3:7.2f}s "
                f"cpu={s.get('executorCpuTime',0)/1e9:7.2f}s "
                f"tasks={s.get('numCompleteTasks',0):4d} "
                f"in={s.get('inputBytes',0)>>20}MB "
                f"sh_r={s.get('shuffleReadBytes',0)>>10}KB "
                f"sh_w={s.get('shuffleWriteBytes',0)>>10}KB "
                f"rows_out={s.get('outputRecords',0)} | {name}"
            )
spark.stop()
