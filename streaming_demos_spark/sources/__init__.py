"""Sources & sinks (SURVEY.md §2.1).

- cdc — Debezium-envelope unwrap + change-log compaction (S10)
"""
