"""Corpus-curation operators for large-scale training-data pipelines.

The reference repo has no LLM-curation surface; these extend the engine
toward the 100 TB training-data goal (BASELINE.json north_star) with the
steps every corpus build runs between "raw documents" and "training
mix": benchmark decontamination, deterministic stratified sampling,
domain-mix weight computation, token-length profiling, and
repetition-based quality statistics.

All operators are deterministic (md5-keyed sampling, integer bucket
math) so a DuckDB oracle can recompute them bit-for-bit, and all hot
paths are JVM column expressions — the only shuffles are the
aggregations that the semantics genuinely require.

Scale notes per operator are in the docstrings; the common theme:
benchmark/eval sets are tiny relative to the corpus, so decontamination
broadcasts the benchmark side and never shuffles the corpus; sampling
and histograms are map-side or single-shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from streaming_demos_spark.catalog import fan_out
from streaming_demos_spark.operators.text import shingles_from_tokens, tokens


def _doc_shingles(
    docs: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, shingle) pairs, one row per DISTINCT shingle per document.

    Tokens are materialized in a prior projection (codegen: an inline
    split would re-run the regex per slice), and ``array_distinct``
    runs BEFORE the explode so the row count is bounded by distinct
    shingles, not raw positions.
    """
    return (
        fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col)
        .select(F.col(id_col), tokens(text_col).alias("_w"))
        .select(
            F.col(id_col),
            F.array_distinct(shingles_from_tokens("_w", k)).alias("_sh"),
        )
        .select(F.col(id_col), F.explode("_sh").alias("shingle"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_hits`` distinct word ``k``-grams with any benchmark/eval
    document (the standard guard against test-set leakage into
    training data).

    Returns (id, n_hits, contaminated) for every corpus document.

    Scale: eval benchmarks are tiny (thousands of docs) next to a
    100 TB corpus, so the benchmark shingle set is broadcast — the
    corpus side is scanned once with a map-side hash-join probe, and
    the only shuffle is the per-document hit count (keyed by document
    id, uniformly distributed). The corpus is never shuffled by
    shingle, which would be the skew trap (stopword n-grams are hot).
    """
    bench_sh = (
        _doc_shingles(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
    )
    hits = (
        _doc_shingles(docs, text_col, id_col, k)
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("long")).alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def _rate_threshold(rate: float) -> str:
    """Hex-string threshold for an md5-prefix keep rule at ``rate``.

    Keep iff ``substr(md5(key), 1, 4) < threshold``: the first 4 hex
    chars are uniform over 65536 values, and lowercase-hex string
    order equals numeric order, so the comparison is engine-portable.
    Rates >= 1.0 map to 'zzzz' (keeps everything).
    """
    if rate >= 1.0:
        return "zzzz"
    return format(max(int(round(rate * 65536)), 0), "04x")


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff the md5
    of its id falls under the stratum's rate threshold.

    Unlike ``df.sample`` this is reproducible across runs, engines, and
    partitionings (the keep decision is a pure function of the row id),
    which is what a training-data mix needs for auditability.

    Scale: pure map-side filter — no shuffle, no state, pushdown-safe
    above it. The md5 prefix is uniform per stratum, so realized rates
    concentrate tightly around the targets at corpus scale.
    """
    threshold = F.lit(_rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_rate_threshold(rate))
        ).otherwise(threshold)
    key = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    return docs.filter(key < threshold)


def per_group_sample(
    docs: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``min(k, |group|)`` rows per group, chosen by md5 order
    of the row id — the deterministic reservoir sample ("k eval
    examples per domain") that is reproducible across runs, engines,
    and partitionings.

    One keyed shuffle: rank by (md5(id), id) within the group, keep
    rank <= k. md5 order is uniform, so this IS a uniform
    without-replacement draw, just with a replayable seed. For a
    pathologically hot group at extreme scale, pre-filter with the
    two-pass threshold trick (count per group -> keep only
    md5-uniform < c*k/count before ranking, the
    ``exact_kth_smallest`` histogram contract) — the rank input then
    holds ~c*k rows per group instead of the full group.
    """
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def mix_weights(
    docs: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
) -> DataFrame:
    """Domain-mixing weights: per-stratum sampling weight that reshapes
    the corpus's observed distribution into ``target_shares``
    (weight = target_share / actual_share; >1 upsample, <1 downsample).

    Scale: one partial+final aggregation on the stratum key (a handful
    of groups), then the grand total joins back as a broadcast 1-row
    crossJoin — one pass over the corpus, no second scan, no driver
    collect in the plan.
    """
    from fractions import Fraction

    # per-stratum target as an exact rational (tn/td): shares and
    # weights are RATIONALS whose rounded doubles can straddle
    # midpoints across engine builds — emit half-up e6 integers.
    tn = F.lit(0)
    td = F.lit(1)
    for value, share in sorted(target_shares.items()):
        fr = Fraction(str(share))
        tn = F.when(
            F.col(strata_col) == value, F.lit(fr.numerator)
        ).otherwise(tn)
        td = F.when(
            F.col(strata_col) == value, F.lit(fr.denominator)
        ).otherwise(td)
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("_tn", tn)
        .withColumn("_td", td)
        .select(
            F.col(strata_col),
            F.col("n_docs"),
            F.expr(
                "cast((cast(n_docs as decimal(38,0)) * 1000000 * 2 + _total)"
                " div (2 * _total) as bigint)"
            ).alias("actual_share_e6"),
            F.expr("(_tn * 1000000 * 2 + _td) div (2 * _td)").alias(
                "target_share_e6"
            ),
            # weight = (tn·total)/(td·n): exact integer device
            F.expr(
                "cast((_tn * cast(_total as decimal(38,0)) * 1000000 * 2"
                " + _td * cast(n_docs as decimal(38,0)))"
                " div (2 * _td * cast(n_docs as decimal(38,0)))"
                " as bigint)"
            ).alias("weight_e6"),
        )
    )


def token_histogram(
    docs: DataFrame,
    text_col: str = "text",
    chars_col: str = "n_chars",
    bucket_width: int = 8,
) -> DataFrame:
    """Token-length histogram: documents bucketed by whitespace token
    count (bucket lower bound = floor(n/width)*width), with per-bucket
    document counts and mean char length — the length profile every
    curation run inspects before choosing truncation / packing sizes.

    Scale: map-side token count + one aggregation over a few dozen
    bucket keys; partials collapse map-side so the shuffle is tiny.
    """
    n_tok = F.size(tokens(text_col))
    bucket = (F.floor(n_tok / bucket_width) * bucket_width).alias("bucket_lo")
    return (
        docs.select(bucket, F.col(chars_col))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(chars_col), 4).alias("avg_chars"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign documents to fixed-token-budget training sequences by
    cumulative offset: within a shard, documents are laid end-to-end in
    id order and a document belongs to the sequence where it starts
    (seq_id = floor(preceding_tokens / budget)).

    Returns (id, shard, n_tokens, seq_id, offset_in_seq). Deterministic
    integer math, so the packing is reproducible and auditable.

    Scale: the running sum is windowed PER SHARD — shards (source files
    / dumps) are numerous and bounded, so every partition sorts
    independently and in parallel. A global orderBy here would be the
    single-task scale-killer; the shard key is the contract that keeps
    it distributed.
    """
    n_tok = F.size(tokens(text_col))
    w = Window.partitionBy(shard_col).orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("_start")
    return (
        docs.select(F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens"))
        .select(id_col, shard_col, "n_tokens", start)
        .select(
            F.col(id_col),
            F.col(shard_col),
            F.col("n_tokens"),
            F.floor(F.col("_start") / budget).alias("seq_id"),
            (F.col("_start") % budget).alias("offset_in_seq"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 32,
    overlap: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size token windows (the
    embedding/retrieval-indexing shape): chunk k starts at token
    1 + k*(chunk_tokens - overlap) while the start lies within the
    document net of the overlap tail.

    Returns one row per (id, chunk_idx) with the chunk text and its
    token count.

    Scale: pure per-row explode — no shuffle, output rows bounded by
    n_tokens / (chunk_tokens - overlap) per document. Tokens are
    materialized before slicing (codegen: an inline split would re-run
    the regex per chunk).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    toks = docs.select(F.col(id_col), tokens(text_col).alias("_w"))
    n = F.size("_w")
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step))
    exploded = toks.select(
        F.col(id_col), F.col("_w"), F.posexplode(starts).alias("chunk_idx", "_s")
    )
    chunk = F.slice("_w", F.col("_s"), chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_chunk_tokens"),
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition statistics (Gopher-style quality
    signals): distinct-token ratio and the mass of the single most
    frequent token. Boilerplate and degenerate generations score low
    on distinct_ratio / high on top_token_ratio.

    Returns (id, n_tokens, n_distinct, distinct_ratio, top_token_ratio).

    Scale: explode + two-level aggregation, both keyed by document id
    (uniform, skew-free) — the (id, token) partial counts combine
    map-side before the single shuffle.
    """
    tok = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    per_token = tok.groupBy(id_col, "token").agg(F.count("*").alias("c"))
    return (
        per_token.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("_top"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            F.col("n_distinct"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 4).alias(
                "distinct_ratio"
            ),
            F.round(F.col("_top") / F.col("n_tokens"), 4).alias(
                "top_token_ratio"
            ),
        )
    )


# --- PII redaction ------------------------------------------------------------

# Alternation-free, fixed-shape patterns: Java regex (Spark) matches
# leftmost-first, RE2 (DuckDB) leftmost-first in default mode — keeping
# the patterns free of ambiguous alternations makes both engines agree
# byte-for-byte, which the oracle verifies.
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub emails / phone numbers / IPv4 literals from document text,
    replacing each with a typed placeholder token, and count the hits
    per category — the pre-training privacy gate every corpus build
    runs before tokenization.

    Entirely map-side (regexp_replace / regexp_count chains, no
    shuffle, no UDF): at 100 TB this runs at scan throughput. Redaction
    order is email -> phone -> ipv4 so an IP-looking fragment inside an
    already-redacted span can't double-count."""
    # Count on the PROGRESSIVELY redacted text, mirroring the replace
    # chain: a dotted phone number must count as a phone, not also as an
    # IPv4 (each stage sees the previous stage's output).
    stage = docs.select(F.col(id_col), F.col(text_col).alias("_t"))
    count_cols = []
    for name, pat in PII_PATTERNS.items():
        stage = stage.select(
            F.col(id_col),
            *count_cols,
            F.regexp_count(F.col("_t"), F.lit(pat)).cast("long").alias(f"n_{name}"),
            F.regexp_replace(F.col("_t"), pat, f"<{name.upper()}>").alias("_t"),
        )
        count_cols.append(F.col(f"n_{name}"))
    return stage.select(
        id_col, "n_email", "n_phone", "n_ipv4", F.col("_t").alias("redacted")
    )


def weighted_priority_sample(
    docs: DataFrame,
    weight_col: str,
    n_per_stratum: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted downsampling: keep the ``n`` rows per
    stratum with the smallest priority ``u / w``, where ``u`` is an
    md5-derived uniform of the row id and ``w`` the row's weight
    (quality score, domain boost). A row's keep-probability grows with
    its weight — the PPS-flavored "keep the best-ish n" every training
    mix applies after scoring (priority-based variant of A-ES weighted
    reservoir sampling; the u/w priority keeps the math to ONE IEEE
    division, bit-identical across engines, where the textbook
    u^(1/w) transcendental could differ in the last bit and flip
    near-tie ranks).

    Deterministic and partitioning-independent like
    ``stratified_sample``; one shuffle on the stratum for the top-n
    (global top-n = TakeOrderedAndProject when no stratum given).

    Weights must be POSITIVE to mean anything in PPS terms: a weight of
    0 is "never keep" and a negative weight has no sampling semantics
    (it would also invert the priority order). Non-positive-weight rows
    are filtered out up front — which both encodes that contract and
    keeps ANSI mode from raising DIVIDE_BY_ZERO on u/0.
    """
    docs = docs.filter(F.col(weight_col) > 0)
    u = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "double"
    ) / F.lit(float(16**8))
    pr = u / F.col(weight_col)
    if strata_col is None:
        return docs.withColumn("_pr", pr).orderBy("_pr", id_col).limit(
            n_per_stratum
        ).drop("_pr")
    w = Window.partitionBy(strata_col).orderBy(F.asc(pr), F.asc(id_col))
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    min_alpha_word_ratio: float = 0.7,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Rule-based document quality gate (Gopher-style repetition-free
    rules; Rae et al. 2021 §A.1.1, public).

    Five independent rules, each emitted as its own boolean so a
    pipeline can tune thresholds from one pass of rule statistics
    rather than re-scanning the corpus per candidate threshold:

    - ``ok_tokens``      token count within [min_tokens, max_tokens]
    - ``ok_word_len``    mean word length within [min, max]
    - ``ok_alpha_words`` fraction of words containing an alphabetic
                         character >= min_alpha_word_ratio
    - ``ok_stopwords``   at least ``min_stop_hits`` stopword
                         occurrences (the "is this prose" test)
    - ``passes``         conjunction of all rules

    Entirely JVM column expressions over one projection — map-only, no
    shuffle, safe at any scale; empty documents fail ``ok_tokens``
    rather than dividing by zero (ratios guard on n_tokens > 0).
    """
    from streaming_demos_spark.operators.text import STOPWORDS_EN, tokens as _tokens

    w = _tokens(text_col)
    n_tok = F.size(w)
    n_chars = F.length(F.col(text_col))
    safe_n = F.when(n_tok > 0, n_tok).otherwise(F.lit(1))
    mean_word_len = (n_chars - (n_tok - 1)) / safe_n
    alpha_words = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    alpha_word_ratio = alpha_words / safe_n
    stop_hits = F.size(F.filter(w, lambda x: x.isin(STOPWORDS_EN)))
    # Every rule flag is coalesced to False so the output BOOLEANs are
    # schema-non-nullable (a NULL document fails the gate rather than
    # propagating NULL); the driver's pandas comparator renders nullable
    # Spark None vs DuckDB NaN differently, so the oracle mirrors the
    # COALESCE.
    ok_tokens = F.coalesce(
        (n_tok >= min_tokens) & (n_tok <= max_tokens), F.lit(False)
    )
    ok_word_len = F.coalesce(
        (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len),
        F.lit(False),
    )
    ok_alpha = F.coalesce(
        alpha_word_ratio >= min_alpha_word_ratio, F.lit(False)
    )
    ok_stop = F.coalesce(stop_hits >= min_stop_hits, F.lit(False))
    return docs.select(
        F.col(id_col),
        n_tok.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(alpha_word_ratio, 4).alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
        ok_tokens.alias("ok_tokens"),
        ok_word_len.alias("ok_word_len"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stop.alias("ok_stopwords"),
        (ok_tokens & ok_word_len & ok_alpha & ok_stop).alias("passes"),
    )


def fuzzy_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 12,
    band_rows: int = 3,
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 50,
) -> DataFrame:
    """Fuzzy benchmark decontamination: flag corpus documents whose
    exact n-gram Jaccard similarity to ANY benchmark document reaches
    ``threshold``, with MinHash-LSH candidate generation BETWEEN the
    two tables. The fuzzy complement to ``decontaminate`` (which needs
    a single shared shingle): this catches lightly-paraphrased or
    partially-overlapping benchmark leakage that exact n-gram hits
    understate.

    Plan shape (the 100 TB path): both sides are banded exactly like
    ``minhash_near_dup_pairs``; the benchmark side is tiny relative to
    the corpus (even 100k eval docs x 4 bands is trivially broadcast-
    able), so candidates come from BROADCAST equality joins on
    (band_id, band_hash). Corpus band rows first pass a broadcast
    SEMI-join against the benchmark band keys — map-side, no shuffle —
    so the hot-band cap's count window shuffles only the rows in
    benchmark-overlapping bands, a sliver of the corpus. The cap is
    unchanged by that pre-filter: the semi-join keeps or drops WHOLE
    bands, so each surviving band's count equals its full-corpus count.
    Verification joins shingles back (Catalyst broadcasts the small
    candidate set) and keeps pairs at or above the threshold, then
    aggregates per corpus doc. Output is one row per corpus document:
    (id, contaminated, best_jaccard, n_matches).
    """
    from fractions import Fraction

    _frac = Fraction(str(threshold))

    from streaming_demos_spark.operators.dedup import (
        _bands_from_sig,
        _distinct_shingled,
        _minhash_sig_from,
    )

    # shingle + distinct each side ONCE into a persisted projection
    # shared by its band builder and its verify side (the round-6
    # layout re-shingled the corpus for the verify — a second full
    # corpus pass; see dedup._distinct_shingled)
    ds_c = _distinct_shingled(corpus, text_col, id_col, shingle_k)
    ds_b = _distinct_shingled(benchmark, text_col, id_col, shingle_k)
    cb = _bands_from_sig(
        _minhash_sig_from(ds_c, id_col, "_ds", num_hashes),
        id_col, num_hashes, band_rows,
    ).select(F.col(id_col).alias("_cid"), "band_id", "band_hash")
    bb_all = _bands_from_sig(
        _minhash_sig_from(ds_b, id_col, "_ds", num_hashes),
        id_col, num_hashes, band_rows,
    )
    cb = cb.join(
        F.broadcast(bb_all.select("band_id", "band_hash").distinct()),
        ["band_id", "band_hash"],
        "leftsemi",
    )
    cb = (
        cb.withColumn(
            "_bn", F.count("*").over(Window.partitionBy("band_id", "band_hash"))
        )
        .filter(F.col("_bn") <= max_bucket)
        .drop("_bn")
    )
    bb = bb_all.select(F.col(id_col).alias("_bid"), "band_id", "band_hash")
    cand = (
        cb.join(F.broadcast(bb), ["band_id", "band_hash"])
        .select("_cid", "_bid")
        .distinct()
    )
    sh_c = ds_c.select(
        F.col(id_col).alias("_cid"),
        F.col("_ds").alias("_shc"),
        F.col("_n").alias("_nc"),
    )
    sh_b = ds_b.select(
        F.col(id_col).alias("_bid"),
        F.col("_ds").alias("_shb"),
        F.col("_n").alias("_nb"),
    )
    hits = (
        cand.join(sh_c, "_cid")
        .join(F.broadcast(sh_b), "_bid")
        # single-intersect filter first (Catalyst substitutes aliases
        # into every reference), then survivors-only e4 similarity —
        # the rounded-double form flips on midpoints across builds
        .filter(
            (F.col("_nc") + F.col("_nb") > 0)
            & (
                F.size(F.array_intersect("_shc", "_shb"))
                * F.lit(_frac.numerator + _frac.denominator)
                >= F.lit(_frac.numerator)
                * (F.col("_nc") + F.col("_nb"))
            )
        )
        .withColumn(
            "_j_e4",
            F.expr(
                "(size(array_intersect(_shc, _shb)) * 10000 * 2"
                " + (_nc + _nb - size(array_intersect(_shc, _shb))))"
                " div (2 * (_nc + _nb"
                " - size(array_intersect(_shc, _shb))))"
            ),
        )
        .groupBy("_cid")
        .agg(
            F.max("_j_e4").alias("best_jaccard_e4"),
            F.count("*").alias("n_matches"),
        )
    )
    return corpus.select(F.col(id_col)).join(
        hits, F.col(id_col) == F.col("_cid"), "left"
    ).select(
        F.col(id_col),
        F.col("_cid").isNotNull().alias("contaminated"),
        F.coalesce("best_jaccard_e4", F.lit(0)).cast("long").alias(
            "best_jaccard_e4"
        ),
        F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
    )


def mix_token_plan(
    docs: DataFrame,
    strata_col: str,
    target_shares: dict[str, float],
    token_budget: int,
    text_col: str = "text",
) -> DataFrame:
    """Turn target mix shares plus a total token budget into executable
    per-domain sampling rates — the planning step between
    ``mix_weights`` (what the distribution should look like) and
    ``stratified_sample`` (how to draw it): domain d should contribute
    ``target_share_d * budget`` tokens; its rate is that desire over
    the tokens it actually has, capped at 1 with the shortfall reported
    (a domain cannot be upsampled past its inventory without repeating
    data — surfacing the gap beats silently re-normalizing).

    One pass: map-side token counts, one aggregation over a handful of
    domain keys, scalar arithmetic on the aggregate row.
    """
    from streaming_demos_spark.operators.text import tokens as _tokens

    target = F.lit(0.0)
    for value, share in sorted(target_shares.items()):
        target = F.when(
            F.col(strata_col) == value, F.lit(float(share))
        ).otherwise(target)
    n_tok = F.size(_tokens(text_col))
    counts = docs.groupBy(strata_col).agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("avail_tokens"),
    )
    desired = target * F.lit(float(token_budget))
    rate = F.when(
        F.col("avail_tokens") > 0,
        F.least(F.lit(1.0), desired / F.col("avail_tokens")),
    ).otherwise(F.lit(0.0))
    planned = F.least(desired, F.col("avail_tokens").cast("double"))
    return counts.select(
        F.col(strata_col),
        F.col("n_docs"),
        F.col("avail_tokens"),
        F.round(target, 6).alias("target_share"),
        F.round(desired, 2).alias("desired_tokens"),
        F.round(rate, 6).alias("sample_rate"),
        F.round(planned, 2).alias("planned_tokens"),
        F.round(F.greatest(F.lit(0.0), desired - F.col("avail_tokens")), 2).alias(
            "shortfall_tokens"
        ),
    )


# --- training-shard export ----------------------------------------------------


def shard_key(id_col: str | Column, salt: str = "", num_shards: int = 256) -> Column:
    """Deterministic pseudo-random shard assignment: first 8 hex digits
    of md5(salt || id) mod ``num_shards``. Content-keyed (not
    partition-keyed), so the same row lands in the same shard under any
    input partitioning or cluster size — and md5 uniformity means the
    shards are balanced regardless of id distribution (sequential ids,
    gaps, hot ranges). Salt rotates the permutation per epoch/export
    without touching the data."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, 8), 16, 10)
        .cast("long"),
        F.lit(num_shards),
    ).cast("int")


def shard_profile(
    docs: DataFrame,
    id_col: str = "doc_id",
    salt: str = "",
    num_shards: int = 16,
    token_col: str | None = None,
) -> DataFrame:
    """Per-shard balance report for a planned export: row count (and
    token count when ``token_col`` is given) per shard. One map-side
    hash + one tiny combinable aggregate — the cheap pre-flight that
    catches a skewed export before writing 100 TB of shards."""
    aggs = [F.count("*").alias("n_rows")]
    if token_col:
        aggs.append(F.sum(token_col).alias("n_tokens"))
    return (
        docs.select(shard_key(id_col, salt, num_shards).alias("shard"))
        if not token_col
        else docs.select(
            shard_key(id_col, salt, num_shards).alias("shard"), F.col(token_col)
        )
    ).groupBy("shard").agg(*aggs).orderBy("shard")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    salt: str = "",
    num_shards: int = 16,
) -> None:
    """Materialize a training export: rows hash-routed to
    ``num_shards`` shard directories, each file internally ordered by
    the content hash — a deterministic global shuffle. Readers stream
    shards in any order and get i.i.d.-like data; re-running the export
    with the same salt reproduces every file byte-for-byte, so an
    export can be resumed or diffed.

    Scale: one hash repartition (uniform by construction) + per-file
    sort; no global sort, no window. The within-shard order key is the
    SAME md5 used for routing, so a shard's sequence is a deterministic
    function of its content only."""
    keyed = df.withColumn("_shard", shard_key(id_col, salt, num_shards)).withColumn(
        "_ord", F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    )
    (
        keyed.repartition(num_shards, "_shard")
        .sortWithinPartitions("_shard", "_ord")
        .drop("_ord")
        .write.partitionBy("_shard")
        .mode("overwrite")
        .parquet(path)
    )


# --- curriculum binning ------------------------------------------------------


def curriculum_bins(
    df: DataFrame,
    score_col: str,
    n_bins: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """Curriculum/difficulty binning: assign every row to one of
    ``n_bins`` quantile bins of ``score_col`` (length, surprisal, any
    difficulty proxy) — the staging step of curriculum training
    schedules ("easy decile first") and of balanced eval sampling.

    Scale shape: the n_bins-1 EXACT thresholds come from
    ``grouped_quantiles_selection`` (distributed histogram selection —
    no value buffering, no global sort/window, unlike the naive
    ``ntile`` which funnels every row through one task); they broadcast
    back as a 1-row frame and the bin assignment is a map-side count of
    thresholds exceeded. Value-based bins (not rank-based) so ties get
    one deterministic bin in any engine.
    """
    from streaming_demos_spark.operators.relational import (
        grouped_quantiles_selection,
    )

    probs = [i / n_bins for i in range(1, n_bins)]
    th = grouped_quantiles_selection(
        df.select(F.lit("all").alias("_g"), F.col(score_col)),
        "_g",
        score_col,
        probs,
    ).drop("_g", "n_rows")
    bin_expr = sum(
        (F.col(score_col) > F.col(f"p{int(round(p * 100))}")).cast("int")
        for p in probs
    )
    return (
        df.crossJoin(F.broadcast(th))
        .select(F.col(id_col), F.col(score_col), bin_expr.alias("bin"))
        .orderBy(id_col)
    )


def quality_drift_psi(
    snap_a: DataFrame,
    snap_b: DataFrame,
    score_col: str,
    n_bins: int = 10,
    smooth: float = 1.0,
) -> DataFrame:
    """Population-stability-index drift report between two corpus
    snapshots — the monitor that catches a crawler/filter regression
    shifting the quality distribution before it poisons a training mix.

    Bin thresholds come from snapshot A (the baseline) via exact
    distributed quantile selection; BOTH snapshots are binned against
    those same thresholds (drift must be measured on a fixed grid), and
    each bin contributes ``(p_b - p_a) * ln(p_b / p_a)`` with add-
    ``smooth`` count smoothing so an empty bin yields a finite term
    instead of a log-of-zero. Returns one row per bin plus the PSI term;
    ``sum(psi_term)`` > 0.2 is the conventional "investigate" line.

    Scale: thresholds are a 1-row broadcast; each snapshot contributes
    one map-side bin count; the final frame is ``n_bins`` rows.
    """
    from streaming_demos_spark.operators.relational import (
        grouped_quantiles_selection,
    )

    probs = [i / n_bins for i in range(1, n_bins)]
    th = grouped_quantiles_selection(
        snap_a.select(F.lit("all").alias("_g"), F.col(score_col)),
        "_g",
        score_col,
        probs,
    ).drop("_g", "n_rows")
    bin_expr = sum(
        (F.col(score_col) > F.col(f"p{int(round(p * 100))}")).cast("int")
        for p in probs
    ).alias("bin")

    def binned(df: DataFrame, out: str) -> DataFrame:
        return (
            df.crossJoin(F.broadcast(th))
            .select(bin_expr)
            .groupBy("bin")
            .agg(F.count("*").alias(out))
        )

    a, b = binned(snap_a, "n_a"), binned(snap_b, "n_b")
    bins = snap_a.sparkSession.range(n_bins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(a, "bin", "left")
        .join(b, "bin", "left")
        .select(
            "bin",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
        )
    )
    tot = joined.agg(
        (F.sum("n_a") + n_bins * smooth).alias("_ta"),
        (F.sum("n_b") + n_bins * smooth).alias("_tb"),
    )
    pa = (F.col("n_a") + F.lit(smooth)) / F.col("_ta")
    pb = (F.col("n_b") + F.lit(smooth)) / F.col("_tb")
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_a",
            "n_b",
            # (n+smooth)/t is a RATIONAL (smooth = 1): half-up e6 ints
            F.expr(
                "cast((cast(n_a + 1 as decimal(38,0)) * 1000000 * 2"
                " + cast(_ta as bigint)) div (2 * cast(_ta as bigint))"
                " as bigint)"
            ).alias("share_a_e6"),
            F.expr(
                "cast((cast(n_b + 1 as decimal(38,0)) * 1000000 * 2"
                " + cast(_tb as bigint)) div (2 * cast(_tb as bigint))"
                " as bigint)"
            ).alias("share_b_e6"),
            F.round((pb - pa) * F.log(pb / pa), 6).alias("psi_term"),
        )
        .orderBy("bin")
    )


def exact_stratified_split(
    docs: DataFrame,
    strata_col: str,
    frac: float,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACT-count stratified selection: from every stratum take exactly
    ``floor(frac · n_g)`` rows (the largest-remainder correction is the
    caller's policy; floor keeps the quota a pure per-stratum function),
    choosing rows by md5-rank so the selection is a deterministic pure
    function of (id, stratum sizes) — reproducible across engines and
    partitionings.

    ``stratified_sample`` keeps each row independently (realized counts
    are binomial around the target); this variant GUARANTEES the quota —
    what eval-set construction and per-domain token budgeting need.

    Plan: one count aggregate (|strata| rows, broadcast back), one
    shuffle on the stratum key for the md5-rank window. The window is
    per-stratum, never global.
    """
    if not 0.0 <= frac <= 1.0:
        raise ValueError("frac must be in [0, 1]")
    quotas = F.broadcast(
        docs.groupBy(strata_col).agg(
            F.floor(F.count("*") * F.lit(frac)).cast("long").alias("_quota")
        )
    )
    rank_key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(rank_key.asc(), F.col(id_col).asc())
    return (
        docs.join(quotas, strata_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def decayed_engagement(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    reference_ts: str,
    half_life_sec: float = 86400.0,
    round_dp: int = 6,
) -> DataFrame:
    """Per-key exponentially time-decayed totals as of ``reference_ts``
    (an ISO timestamp literal): each event contributes
    ``0.5 ^ (age_sec / half_life)`` to the decayed count and
    ``value · 0.5^(...)`` to the decayed value — the frecency score
    behind recommendation/ranking freshness and feature stores.

    Map-side weight computation + ONE combinable aggregation; the
    reference time is a literal so the whole expression constant-folds.
    Events after the reference time are excluded (they do not exist yet
    at scoring time).
    """
    from streaming_demos_spark.functions.scalars import epoch_us

    # microsecond epoch math: events carry sub-second timestamps, and a
    # truncating seconds cast would drift the weights vs any engine
    # computing fractional ages
    age_sec = (
        epoch_us(F.lit(reference_ts).cast("timestamp"))
        - epoch_us(F.col(ts_col))
    ) / F.lit(1e6)
    wgt = F.pow(F.lit(0.5), age_sec / F.lit(half_life_sec))
    return (
        events.filter(F.col(ts_col) <= F.lit(reference_ts).cast("timestamp"))
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(wgt), round_dp).alias("decayed_count"),
            F.round(
                F.sum(wgt * F.coalesce(F.col(value_col), F.lit(0.0))),
                round_dp,
            ).alias("decayed_value"),
        )
    )


def dataset_card(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    len_col: str = "n_chars",
) -> DataFrame:
    """One-row corpus "dataset card": the composition summary a corpus
    release ships with — size, exact-duplicate rate, token volume, mean
    quality, language-mix entropy, and the median document length.

    Four independent column-pruned scans (per-doc stats, distinct-text
    count, language histogram, exact median via distributed selection),
    each a 1-row/edge-bounded aggregate cross-joined at the end — no
    scan reads a column it doesn't use, and the exact median never
    buffers the corpus in one task (``grouped_quantiles_selection``).
    """
    from streaming_demos_spark.operators import text as TXO
    from streaming_demos_spark.operators.relational import (
        grouped_quantiles_selection,
    )

    stats = TXO.text_stats(docs, text_col, id_col).agg(
        F.sum("n_tokens").alias("total_tokens"),
        # quality_score is 4-dp-rounded upstream: recover exact e4
        # ints per row so the mean is a half-up e6 integer
        F.sum(
            F.expr("cast(round(quality_score * 10000) as bigint)")
        ).alias("_sq4"),
        F.count("*").alias("_nq"),
    )
    uniq = docs.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(F.md5(F.col(text_col))).alias("n_unique_texts"),
    )
    # |langs|-row histogram read by the total AND the entropy fold —
    # persist so the language scan runs once, keeping the docstring's
    # four-scan contract honest
    lc = docs.groupBy(lang_col).agg(F.count("*").alias("_c")).persist()
    tot = lc.agg(F.sum("_c").cast("double").alias("_t"))
    ent = (
        lc.crossJoin(F.broadcast(tot))
        .select(
            (
                -(F.col("_c") / F.col("_t"))
                * F.log2(F.col("_c") / F.col("_t"))
            ).alias("_e")
        )
        .agg(F.round(F.sum("_e"), 6).alias("lang_entropy"))
    )
    med = grouped_quantiles_selection(
        docs.select(F.lit(1).alias("_g"), F.col(len_col)), "_g", len_col, [0.5]
    ).select(F.col("p50").alias("p50_len"))
    return (
        uniq.crossJoin(stats)
        .crossJoin(ent)
        .crossJoin(med)
        .select(
            "n_docs",
            "n_unique_texts",
            (
                F.lit(1000000)
                - F.expr(
                    "cast((cast(n_unique_texts as decimal(38,0)) * 1000000 * 2"
                    " + n_docs) div (2 * n_docs) as bigint)"
                )
            ).cast("long").alias("dup_rate_e6"),
            "total_tokens",
            F.expr(
                "cast((cast(total_tokens as decimal(38,0)) * 1000000 * 2"
                " + n_docs) div (2 * n_docs) as bigint)"
            ).alias("avg_tokens_e6"),
            F.expr(
                "(_sq4 * 100 * 2 + _nq) div (2 * _nq)"
            ).alias("mean_quality_e6"),
            "lang_entropy",
            "p50_len",
        )
    )


def fair_allocation(
    df: DataFrame,
    key_col: str,
    cap_col: str,
    budget: float,
    round_dp: int = 6,
) -> DataFrame:
    """Max-min fair (water-filling) allocation of a global ``budget``
    across keys, each capped at its ``cap_col``: every key gets the
    common water level ``t`` except keys whose cap is below ``t``,
    which get their cap — the allocator a token-budget mix uses when
    small domains must not be starved and large ones must not drink
    the pool (``Σ alloc = min(budget, Σ cap)``).

    The textbook iterative water-filling is replaced by the sorted
    closed form: with caps ascending, the level is
    ``t_i = (B - cum_{<i}) / (n - i + 1)`` at the first i where
    ``t_i <= cap_i``. One window pass over the KEY table (bounded by
    distinct keys, not rows); every row then gets
    ``min(cap, t)`` map-side. Deterministic for any cap distribution;
    a budget >= Σ cap simply fills every cap.
    """
    w = Window.orderBy(F.col("_cap").asc(), F.col(key_col).asc())
    ranked = df.select(
        F.col(key_col),
        F.col(cap_col).cast("double").alias("_cap"),
    ).select(
        "*",
        F.row_number().over(w).alias("_i"),
        F.sum("_cap").over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ).alias("_cum_before"),
        F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    level_i = (F.lit(budget) - F.coalesce("_cum_before", F.lit(0.0))) / (
        F.col("_n") - F.col("_i") + 1
    )
    # the FIRST ascending index with level_i <= cap_i freezes the level
    # for every remaining key. A struct-min aggregation (ordered by _i)
    # finds it in one row ALWAYS — when no index satisfies (budget >=
    # Σcap) the min is NULL and the level coalesces to +inf, i.e.
    # every cap fills.
    with_level = ranked.withColumn("_li", level_i)
    t_row = with_level.agg(
        F.min(
            F.when(
                F.col("_li") <= F.col("_cap"),
                F.struct(F.col("_i"), F.col("_li")),
            )
        ).alias("_m")
    ).select(
        F.coalesce(F.col("_m._li"), F.lit(float("inf"))).alias("_t")
    )
    return (
        with_level.crossJoin(F.broadcast(t_row))
        .select(
            key_col,
            F.round("_cap", round_dp).alias("cap"),
            F.round(
                F.least(F.col("_cap"), F.greatest(F.col("_t"), F.lit(0.0))),
                round_dp,
            ).alias("allocation"),
        )
    )


def cohens_kappa(
    df: DataFrame,
    flag_a,
    flag_b,
    round_dp: int = 6,
) -> DataFrame:
    """Agreement between two binary judges/filters beyond chance:
    Cohen's kappa ``(p_o - p_e) / (1 - p_e)`` from one contingency
    aggregation — the standard check before swapping one quality gate
    for another. ``flag_a``/``flag_b`` are boolean Column expressions.
    Returns one row: n, p_observed, p_expected, kappa (NULL when
    either judge is constant — chance agreement is 1).
    """
    a = flag_a.cast("int").alias("_a")
    b = flag_b.cast("int").alias("_b")
    # p_o, p_e and kappa are RATIONALS of integer counts: a 6-dp
    # rounding can land on a midpoint and diverge across engine builds.
    # Everything is emitted as half-up e6 integers computed in
    # DECIMAL(38,0) (Σ n_a·n_b and t² wrap BIGINT at ~3e9 rows); kappa
    # derives from the two e6 integers identically in both engines,
    # with a sign device so the division stays non-negative.
    cells = df.select(a, b).groupBy("_a", "_b").agg(
        F.count("*").alias("_n")
    )
    tot = cells.agg(F.sum("_n").alias("_t"))
    po = cells.filter(F.col("_a") == F.col("_b")).agg(
        F.sum("_n").alias("_agree")
    )
    ma = cells.groupBy("_a").agg(F.sum("_n").alias("_na"))
    mb = cells.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    pe = ma.join(mb, ma["_a"] == mb["_b"]).agg(
        F.sum(F.expr("_na * cast(_nb as decimal(38,0))")).alias("_sab")
    )
    base = (
        tot.crossJoin(F.broadcast(po))
        .crossJoin(F.broadcast(pe))
        .select(
            F.col("_t").cast("long").alias("n"),
            F.expr(
                "cast((coalesce(_agree, 0) * 1000000 * 2 + _t)"
                " div (2 * _t) as bigint)"
            ).alias("po_e6"),
            F.expr(
                "cast((_sab * 1000000 * 2 + _t * cast(_t as decimal(38,0)))"
                " div (2 * _t * cast(_t as decimal(38,0))) as bigint)"
            ).alias("pe_e6"),
        )
    )
    num = F.col("po_e6") - F.col("pe_e6")
    return base.select(
        "n",
        "po_e6",
        "pe_e6",
        F.when(
            F.col("pe_e6") < 1000000,
            F.when(num < 0, F.lit(-1)).otherwise(F.lit(1))
            * F.expr(
                "(abs(po_e6 - pe_e6) * 1000000 * 2 + (1000000 - pe_e6))"
                " div (2 * (1000000 - pe_e6))"
            ),
        ).cast("long").alias("kappa_e6"),
    )


def interleave_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 16,
    seed: str = "ep0",
) -> DataFrame:
    """Deterministic training-order assignment: every document gets a
    (shard, position) under a seeded content-keyed permutation — the
    export step that turns a curated corpus into reproducible training
    shards whose read order is a uniform global shuffle (domains and
    time-adjacent crawls interleave instead of clumping).

    Mechanics: shard = md5(seed || id) mod ``n_shards`` (the
    ``shard_key`` contract — layout-independent, balanced regardless of
    id distribution); position = rank of the SAME md5 hex within the
    shard (lexicographic, id tie-break). Rotating ``seed`` re-shuffles
    every epoch without touching the data.

    Scale: one hash-partitioned shuffle on the shard key; each shard's
    ordering is a per-partition sort of ~N/n_shards rows — exactly the
    sequential write a shard export performs anyway. ``n_shards``
    scales with the corpus (100 TB -> O(10^4..10^5) shards), keeping
    the per-task sort bounded; the rank window is partitioned, never
    global.
    """
    h = F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return (
        docs.select(
            F.col(id_col),
            h.alias("_h"),
            shard_key(id_col, seed, n_shards).alias("shard"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def contamination_matrix(
    docs: DataFrame,
    benchmark: DataFrame,
    bench_name_col: str,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
    round_dp: int = 6,
) -> DataFrame:
    """Contamination REPORT: for every (corpus group x benchmark) cell,
    how many documents leak >= ``min_hits`` distinct word k-grams into
    that benchmark, and the group's leak rate — the triage view that
    tells a curation run WHICH source to drop or re-filter, where
    ``decontaminate`` only flags individual documents.

    Scale shape: identical to ``decontaminate`` — the benchmark
    (name, shingle) set broadcasts, the corpus is scanned once with a
    map-side probe and shuffles only by (doc, benchmark) for the hit
    count, never by shingle (stopword n-grams are the skew trap);
    per-group totals come from a second tiny aggregate on the group
    column, joined back for the rate.
    """
    # the benchmark name rides INSIDE the shingle pipeline (no join
    # back to the benchmark table — that join re-shuffled the exploded
    # shingle frame and dominated the runtime)
    bench_sh = (
        fan_out(
            benchmark.select(
                F.col(bench_name_col).alias("benchmark"), F.col(text_col)
            ),
            "benchmark",
        )
        .select("benchmark", tokens(text_col).alias("_w"))
        .select(
            "benchmark",
            F.array_distinct(
                shingles_from_tokens("_w", k)
            ).alias("_sh"),
        )
        .select("benchmark", F.explode("_sh").alias("shingle"))
        .distinct()
    )
    contaminated = (
        _doc_shingles(docs, text_col, id_col, k)
        .join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col, "benchmark")
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") >= min_hits)
    )
    cells = (
        contaminated.join(docs.select(id_col, group_col), id_col)
        .groupBy(group_col, "benchmark")
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = docs.groupBy(group_col).agg(F.count("*").alias("n_docs"))
    return (
        cells.join(totals, group_col)
        .select(
            group_col,
            "benchmark",
            "n_contaminated",
            "n_docs",
            F.expr(
                "cast((cast(n_contaminated as decimal(38,0)) * 1000000 * 2"
                " + n_docs) div (2 * n_docs) as bigint)"
            ).alias("rate_e6"),
        )
        .orderBy(group_col, "benchmark")
    )


def preference_pairs(
    docs: DataFrame,
    group_col: str,
    score_col: str,
    id_col: str = "doc_id",
    min_margin: float = 0.0,
    round_dp: int = 6,
) -> DataFrame:
    """Preference-pair construction for reward-model / DPO training:
    per group (prompt bucket, topic, source), emit the highest-scoring
    document as ``chosen`` and the lowest as ``rejected``, with the
    score margin — the standard top-vs-bottom pairing when only
    pointwise quality scores exist.

    One aggregation, no window, no join: chosen/rejected are
    struct-max/min over (score, id), so ties break deterministically on
    the id (max takes the LARGEST id among score-ties, min the
    smallest — an engine-portable convention). Groups with fewer than
    two documents, or a margin below ``min_margin``, produce no pair
    (a chosen==rejected row trains nothing).
    """
    s = F.round(F.col(score_col).cast("double"), round_dp)
    pair = F.struct(s.alias("s"), F.col(id_col).alias("i"))
    agg = docs.groupBy(group_col).agg(
        F.max(pair).alias("_mx"),
        F.min(pair).alias("_mn"),
        F.count("*").alias("n_docs"),
    )
    return (
        agg.filter(F.col("n_docs") >= 2)
        .select(
            group_col,
            F.col("_mx.i").alias("chosen_id"),
            F.col("_mn.i").alias("rejected_id"),
            F.col("_mx.s").alias("chosen_score"),
            F.col("_mn.s").alias("rejected_score"),
            F.round(F.col("_mx.s") - F.col("_mn.s"), round_dp).alias(
                "margin"
            ),
            "n_docs",
        )
        .filter(F.col("margin") >= min_margin)
        .filter(F.col("chosen_id") != F.col("rejected_id"))
        .orderBy(group_col)
    )


def k_anonymity_profile(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str | None = None,
    k: int = 5,
) -> DataFrame:
    """Re-identification risk audit before releasing (or training on) a
    table: group records into equivalence classes over the
    quasi-identifier columns and return the classes that violate
    k-anonymity (fewer than ``k`` indistinguishable records — each of
    those records is re-identifiable by linking the quasi-identifiers
    to an outside source). When ``sensitive_col`` is given, each class
    also reports its l-diversity (distinct sensitive values): a class
    can be k-anonymous yet still leak the attribute if every member
    shares one sensitive value (homogeneity attack, l = 1).

    The output is the suppression/generalization worklist: rows a
    release pipeline must coarsen or drop. One hash aggregation on the
    quasi-identifier key — map-side combinable, no skew beyond the
    class-size distribution itself, scales like any groupBy-count.
    """
    aggs = [F.count("*").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("l_diversity")
        )
    out = (
        df.groupBy(*[F.col(c) for c in quasi_cols])
        .agg(*aggs)
        .filter(F.col("class_size") < F.lit(k))
        .withColumn(
            # 1/class_size is a small-denominator RATIONAL — emit the
            # half-up e6 integer (rounded doubles straddle midpoints
            # across engine builds, e.g. class_size = 2^a·5^b · 2)
            "max_reident_risk_e6",
            F.expr("(1000000 * 2 + class_size) div (2 * class_size)"),
        )
    )
    return out


def quantile_normalize(
    docs: DataFrame,
    group_col: str,
    score_col: str,
    round_dp: int = 6,
) -> DataFrame:
    """Within-group midrank percentile of a score — the calibration
    step that makes quality scores COMPARABLE ACROSS SOURCES before
    mixing (each source's classifier has its own scale; its quantiles
    don't).

    Midranks come from the per-group distinct-value grid (per-(group,
    value) counts, running sum over the grid partitioned by group),
    joined back to the rows by (group, value) — the rank shuffle is
    bounded by value cardinality per group, never a global row sort.
    Appends ``pct_rank`` in (0, 1]: midrank / n_group.
    """
    v = F.col(score_col).cast("double")
    grid = docs.groupBy(
        F.col(group_col).alias("_g"), v.alias("_v")
    ).agg(F.count("*").alias("_t"))
    w_prev = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy("_g")
    ranks = grid.select(
        "_g",
        "_v",
        (
            (
                F.coalesce(F.sum("_t").over(w_prev), F.lit(0))
                + (F.col("_t") + F.lit(1)) / F.lit(2.0)
            )
            / F.sum("_t").over(w_all)
        ).alias("_pct"),
    )
    return docs.join(
        ranks,
        (F.col(group_col) == F.col("_g")) & (v == F.col("_v")),
    ).select(
        *docs.columns,
        F.round("_pct", round_dp).alias("pct_rank"),
    )


def span_corruption_plan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    start_rate_denom: int = 20,
    max_extra: int = 3,
) -> DataFrame:
    """T5-style span-corruption PLAN (Raffel et al. 2020 §3.1.4): pick
    deterministic token spans to mask for a denoising objective and
    report the per-document corruption profile — the dry-run a
    training-data pipeline executes before burning tokens, and the
    statistics (mask rate, span count) the mixture designer monitors.

    Span selection is a pure hash function of (doc, position): token i
    STARTS a span iff ``md5(doc_id:i) % start_rate_denom == 0``; the
    span covers ``2 + md5(...) % max_extra`` tokens; overlapping spans
    merge (maximal masked runs are counted as one sentinel each, the
    T5 sentinel-token count). No RNG state anywhere, so any engine —
    and any partitioning — reproduces the identical mask.

    Plan shape: whitespace split + posexplode (one pass), the start
    set is a filter, coverage is a bounded range join (span length <=
    2+max_extra-1), run-counting is one lag window PARTITIONED BY doc
    (frame bounded by document length). Output: (doc_id, n_tokens,
    n_masked, n_spans) — exact integers.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("pos", "_w"),
    ).select("doc_id", "pos")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":", F.col("doc_id").cast("string"),
                    F.col("pos").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    starts = toks.select(
        "doc_id",
        F.col("pos").alias("_sp"),
        (F.lit(2) + h % F.lit(max_extra)).alias("_len"),
    ).filter(h % F.lit(start_rate_denom) == 0)
    max_len = 2 + max_extra - 1
    covered = (
        toks.join(starts, "doc_id")
        .filter(
            (F.col("pos") >= F.col("_sp"))
            & (F.col("pos") < F.col("_sp") + F.col("_len"))
            & (F.col("pos") < F.col("_sp") + F.lit(max_len))
        )
        .select("doc_id", "pos")
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = covered.select(
        "doc_id",
        (
            F.coalesce(F.lag("pos").over(w), F.lit(-2)) != F.col("pos") - 1
        ).cast("long").alias("_new_run"),
    )
    masked = runs.groupBy("doc_id").agg(
        F.count("*").alias("n_masked"),
        F.sum("_new_run").alias("n_spans"),
    )
    totals = toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens"))
    return (
        totals.join(masked, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
        )
        .orderBy("doc_id")
    )


def decompress_text(
    docs: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    codec: str = "gzip",
    out_col: str = "text",
) -> DataFrame:
    """Inflate compressed text payloads (the WARC/web-archive shape:
    one gzip member per document) into a text column — map-only Arrow
    batches, the first step of any pipeline whose raw corpus arrives
    compressed. REAL stdlib inflate, no dependencies.

    ``codec``:
      * ``gzip`` — RFC 1952 member walk: magic/method/flags validated,
        the optional EXTRA/NAME/COMMENT fields skipped by structure,
        then a raw-DEFLATE inflate. The CRC32/ISIZE trailer is checked
        when the 8 trailer bytes are present (strict on real archives)
        and skipped when the member was truncated exactly at the
        trailer. Concatenated multi-member files decode to the full
        concatenated text (each member's trailer verified); any
        non-member bytes after a trailer make the payload NULL — never
        a silently truncated prefix.
      * ``zlib`` — RFC 1950 stream (zlib.decompress, adler verified).
      * ``deflate`` — a bare raw-DEFLATE stream.
      * ``bz2`` / ``xz`` — stdlib incremental decompressors (the
        Wikipedia-dump / data-release shapes), decompressed through
        the same ratio cap.

    A payload that fails to inflate or is not valid UTF-8 yields a
    NULL ``out_col`` (observable, never dropped — the caller decides
    whether corrupt members are an error rate or a filter). Output is
    (id, out_col, n_raw_bytes, n_text_bytes): the byte columns make
    the corpus-level compression ratio one aggregation away.

    Scale: one pass, no shuffle; inflate cost is linear in bytes and
    stays inside the Arrow worker. Decode bombs are bounded by
    ``max_ratio`` * n_raw_bytes (a 1 GB member claiming 100 GB of text
    stops at the cap and yields NULL)."""
    import bz2 as _bz2
    import lzma as _lzma
    import zlib as _zlib

    import pandas as pd

    from pyspark.sql import types as T

    if codec not in ("gzip", "zlib", "deflate", "bz2", "xz"):
        raise ValueError(f"unknown codec {codec!r}")
    max_ratio = 1000

    def gunzip_member(b: bytes, cap: int) -> bytes | None:
        # manual RFC 1952 MEMBER LOOP so (a) the DEFLATE body inflates
        # through the same bounded decompressobj as every other codec
        # (gzip.decompress would allocate the full bomb before any
        # ratio check could run) and (b) concatenated multi-member
        # files — the real WARC/archive shape — decode to the FULL
        # concatenated text: bytes after a verified 8-byte trailer must
        # be the next member, else the whole payload is corrupt (NULL),
        # never a silently truncated first member.
        parts: list[bytes] = []
        total = 0
        while True:
            if len(b) < 10 or b[:2] != b"\x1f\x8b" or b[2] != 8:
                return None
            flg = b[3]
            i = 10
            if flg & 0x04:  # FEXTRA
                if i + 2 > len(b):
                    return None
                i += 2 + int.from_bytes(b[i : i + 2], "little")
            for bit in (0x08, 0x10):  # FNAME, FCOMMENT: zero-terminated
                if flg & bit:
                    end = b.find(b"\x00", i)
                    if end < 0:
                        return None
                    i = end + 1
            if flg & 0x02:  # FHCRC
                i += 2
            if i > len(b):
                return None
            d = _zlib.decompressobj(wbits=-15)
            out = d.decompress(b[i:], cap - total + 1)
            total += len(out)
            if total > cap or not d.eof:  # bomb, or truncated mid-stream
                return None
            parts.append(out)
            trailer = d.unused_data
            if 0 < len(trailer) < 8:
                # truncated INSIDE the trailer: the CRC bytes may be
                # there but ISIZE is cut — corrupt, not the tolerated
                # "truncated exactly at the trailer" case (len == 0)
                return None
            if len(trailer) >= 8:  # CRC32 + ISIZE present: verify strictly
                crc, isize = (
                    int.from_bytes(trailer[:4], "little"),
                    int.from_bytes(trailer[4:8], "little"),
                )
                if crc != _zlib.crc32(out) or isize != len(out) % 2**32:
                    return None
            if len(trailer) <= 8:  # end of payload (or tolerated cut)
                return b"".join(parts)
            b = trailer[8:]  # next member starts here — loop

    def inflate(b: bytes) -> bytes | None:
        # Every codec goes through a BOUNDED incremental decompressor
        # (max_length = cap + 1) and must reach end-of-stream: a
        # truncated member otherwise returns a silent partial prefix
        # (deflate) or b"" (bz2/xz) with no exception, which would
        # enter the corpus as a valid short text instead of a NULL.
        cap = max(len(b), 64) * max_ratio
        try:
            if codec == "gzip":
                return gunzip_member(b, cap)
            if codec == "zlib":
                d = _zlib.decompressobj()  # zlib wrapper, adler verified
            elif codec == "deflate":
                d = _zlib.decompressobj(wbits=-15)
            elif codec == "bz2":
                d = _bz2.BZ2Decompressor()
            else:
                d = _lzma.LZMADecompressor()
            out = d.decompress(b, cap + 1)
            if len(out) > cap or not d.eof:
                return None
            return out
        except (OSError, EOFError, _zlib.error, _lzma.LZMAError):
            return None

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField(out_col, T.StringType(), True),
            T.StructField("n_raw_bytes", T.LongType(), True),
            T.StructField("n_text_bytes", T.LongType(), True),
        ]
    )

    def run(batches):
        for pdf in batches:
            ids, texts, raws, outs = [], [], [], []
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                ids.append(i)
                if b is None:
                    texts.append(None)
                    raws.append(None)
                    outs.append(None)
                    continue
                raws.append(len(b))
                data = inflate(bytes(b))
                if data is None:
                    texts.append(None)
                    outs.append(None)
                    continue
                try:
                    texts.append(data.decode("utf-8"))
                    outs.append(len(data))
                except UnicodeDecodeError:
                    texts.append(None)
                    outs.append(None)
            yield pd.DataFrame(
                {id_col: ids, out_col: texts,
                 "n_raw_bytes": raws, "n_text_bytes": outs}
            )

    return docs.select(id_col, payload_col).mapInPandas(run, schema)
