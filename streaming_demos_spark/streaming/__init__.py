"""Structured Streaming pipelines (SURVEY.md §2.9).

- supplier_stats — the reference's centerpiece: event-time parsing (T1),
  watermark (T2), tumbling window agg (T4/A5-A8), window-bounds
  formatting (A7), explicit late-record detection with the reference's
  stream-time arithmetic (T6), dual-sink routing via foreachBatch
  (T7/T8), periodic trigger (T13).
- bootstrap — hybrid seed-then-stream (S9), periodic push refresh (S12).
- generator — deterministic order-event workload harness (S15).
"""
