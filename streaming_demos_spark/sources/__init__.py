"""Sources & sinks (SURVEY.md §2.1).

- cdc   — Debezium-envelope unwrap + change-log compaction (S10)
- kafka — Kafka source/sink wiring incl. Confluent wire format (S4-S7)
- files — declared-schema CSV readers with bad-row policies (S1, S8)
- jdbc  — JDBC scan w/ pushdown + partitioned reads, JDBC sink (S2, S3)
"""
