"""Operator library.

Modules map to SURVEY.md §2 inventory sections:

- relational   — scans/projections/filters/joins/aggregates/sorts (§2.1-2.6)
- linucb       — LinUCB fit/update/score + ranking eval and AUC (§2.10, A10-A12)
- dedup        — exact + MinHash-LSH + SimHash near-dup detection (scale extension)
- similarity   — brute-force, sign-LSH, and IVF embedding similarity search
- text         — language-ID, quality scoring, tokens, fingerprints, vocab/entropy
- curation     — decontamination, sampling (stratified + weighted), mix
                 weights, packing, chunking, repetition stats, PII redaction
- multimodal   — opaque binary columns + mapInPandas feature plumbing (stubbed codecs)
"""
