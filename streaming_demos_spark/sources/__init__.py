"""Sources & sinks (SURVEY.md §2.1).

- cdc    — Debezium-envelope unwrap + change-log compaction (S10)
- kafka  — Kafka source/sink wiring incl. Confluent Avro wire format (S4-S7)
- files  — schema-declared CSV/JSON/parquet readers (S1, S8)
"""
