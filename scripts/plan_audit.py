"""Plan audit: compile every declared query against sf0.01 and grade its
physical plan on the properties that decide 100 TB viability. Writes
PLAN_AUDIT.md (a table + red-flag list) and prints a one-line summary.

Graded per query (no execution — .explain only):
- exchanges: shuffle count (hash / range / single-partition splits)
- broadcasts: BroadcastExchange count (small-side joins — good)
- top-k: TakeOrderedAndProject instead of global Sort+Limit
- pushdown: a scan with non-empty PushedFilters
- python: Arrow-batched stages (mapInPandas / pandas UDF — acceptable)
  vs row-at-a-time BatchEvalPython (scale killer, must be zero)

Usage: python scripts/plan_audit.py [sf_dir]
"""
from __future__ import annotations

import contextlib
import io
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_demos_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="plan_audit")
    import __spark_entry__ as E

    rows, flags = [], []
    for key, fn in E.queries().items():
        try:
            df = fn(spark, SF)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 - audit keeps going
            flags.append(f"- `{key}`: EXPLAIN FAILED: {exc}")
            continue
        n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
        n_bc = len(re.findall(r"\(\d+\) BroadcastExchange\b", plan))
        n_single = plan.count("SinglePartition")
        topk = "TakeOrderedAndProject" in plan
        pushed = bool(re.search(r"PushedFilters: \[[^\]]", plan))
        arrow = len(re.findall(
            r"MapInPandas|FlatMapGroupsInPandas|ArrowEvalPython|MapInArrow", plan))
        rowpy = plan.count("BatchEvalPython")
        # un-partitioned windows: every global windowspec funnels its
        # input through ONE task — only acceptable over frames bounded
        # by construction (distinct-score grid, per-key table, candidate
        # pool, fixed dims). The allowlist documents each bound; any
        # NEW unpartitioned window is a red flag until justified here.
        unpart = 0
        for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
            if "," not in re.split(r" (?:ASC|DESC)", spec)[0]:
                unpart += 1
        bounded_window_ok = {
            # frame the global window runs over (NOT the raw rows):
            "ext_kaplan_meier": "distinct-duration grid",
            "ext_nelson_aalen": "distinct-duration grid",
            "llm_fair_allocation": "per-key caps table",
            "llm_hybrid_rerank": "query's candidate pool",
            "llm_zipf_fit": "distinct term-frequency grid",
            "ext_sequence_gaps": "incomplete-bucket boundary rows",
            "llm_quality_eval": "distinct-score grid",
            "eval_auc": "distinct-score grid",
            "j4_zip_join": "fixed 25/5-row dims",
            "ext_mann_whitney": "distinct-value grid (2dp-rounded)",
            "ext_ks_test": "distinct-value grid (2dp-rounded)",
            "ext_spearman": "distinct-value grids per column",
            "ext_log_rank": "distinct-duration grid",
            "ext_fdr_screen": "25-row tests frame",
            "ext_kruskal_wallis": "distinct-value grid (2dp-rounded)",
            "ext_roc_curve": "distinct-score grid (2dp-rounded)",
            "ext_rmst": "distinct-duration grid (KM device + lead)",
            "ext_cumulative_users": "calendar frame (first-seen days)",
            "ext_gains_table": "n_bins-row decile frame (cum capture)",
            "ext_abc_classification": "distinct per-key-total grid (cum value)",
            "ext_peak_concurrency": "calendar-bounded distinct-second grid",
            "ext_weibull_fit": "distinct-duration grid (KM device)",
        }
        rows.append((key, n_ex, n_bc, n_single, topk, pushed, arrow, rowpy, unpart))
        if rowpy:
            flags.append(f"- `{key}`: {rowpy} row-at-a-time BatchEvalPython stage(s)")
        if unpart and key not in bounded_window_ok:
            flags.append(
                f"- `{key}`: {unpart} un-partitioned window(s) not on the"
                " bounded-frame allowlist"
            )

    rows.sort(key=lambda r: (-r[1], r[0]))
    with open("PLAN_AUDIT.md", "w") as fh:
        fh.write(
            "# PLAN AUDIT — physical-plan scale posture (auto-generated)\n\n"
            f"`python scripts/plan_audit.py` over {len(rows)} queries at "
            f"`{SF}`. Sorted by shuffle count (the 100 TB cost driver).\n"
            "`shuffles` counts Exchange nodes (broadcasts listed separately);\n`1-part` counts SinglePartition\n"
            "exchanges (bounded driver-size aggregates, e.g. a 1-row stats\n"
            "frame or a vocabulary-sized matrix — cheap by construction).\n"
            "`arrow-py` = Arrow-batched Python stages (vectorized, the only\n"
            "acceptable Python in a data path); row-at-a-time Python must be\n"
            "(and is) zero everywhere — see Red flags.\n\n"
            "`glob-win` = un-partitioned windows; allowed only over\n"
            "frames bounded by construction (distinct-value grids,\n"
            "per-key tables, candidate pools, fixed dims — allowlisted\n"
            "in the script with the bound named); any other is a flag.\n\n"
            "| query | shuffles | broadcasts | 1-part | top-k | pushdown | arrow-py | glob-win |\n"
            "|---|---|---|---|---|---|---|---|\n"
        )
        for k, ex, bc, sp, tk, pd, ar, rp, up in rows:
            fh.write(
                f"| {k} | {ex} | {bc} | {sp} | {'y' if tk else ''} | "
                f"{'y' if pd else ''} | {ar or ''} | {up or ''} |\n"
            )
        fh.write("\n## Red flags\n\n")
        fh.write("\n".join(flags) if flags else "None.\n")
        total_rowpy = sum(r[7] for r in rows)
        fh.write(
            f"\n\n## Totals\n\n- queries audited: {len(rows)}\n"
            f"- row-at-a-time Python stages: {total_rowpy}\n"
            f"- queries with TakeOrdered top-k: {sum(1 for r in rows if r[4])}\n"
            f"- max shuffle count: {rows[0][1] if rows else 0} (`{rows[0][0] if rows else ''}`)\n"
        )
    print(f"audited {len(rows)} queries, {len(flags)} flags -> PLAN_AUDIT.md")
    spark.stop()


if __name__ == "__main__":
    main()
