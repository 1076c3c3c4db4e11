"""Operator library.

Modules map to SURVEY.md §2 inventory sections:

- relational   — scans/projections/filters/joins/aggregates/sorts (§2.1-2.6)
- dedup        — exact + near-duplicate detection (scale extension)
- similarity   — embedding similarity search (scale extension)
- text         — language-ID, quality scoring, tokens, fingerprints
- linucb       — contextual-bandit batch fit / scoring / eval (§2.10)
- multimodal   — opaque binary columns + metadata plumbing (stubbed codecs)
"""
