"""Data-selection operators: importance-weighted corpus selection and
domain-mixture scheduling for large-scale training-data pipelines.

The reference repo has no selection surface; these extend the engine
toward the 100 TB training-data goal (BASELINE.json north_star) with the
two standard published selection mechanisms a corpus build runs after
filtering/dedup:

- **DSIR-style importance weighting** (Xie et al. 2023, "Data Selection
  for Language Models via Importance Resampling", public): score every
  raw document by how target-like its hashed n-gram profile is, then
  resample with Gumbel-perturbed weights. The feature space is a fixed
  ``num_buckets``-dimensional bag of hashed unigrams+bigrams, so the
  model side of the computation is BOUNDED regardless of corpus size.
- **Temperature-scaled mixture weights** (the multilingual-sampling
  ``p_i^alpha`` rule used by public multilingual/multi-domain training
  recipes): turn per-domain token counts into sampling weights and
  effective epoch counts for a token budget.

Everything is deterministic (md5 bucket hashing, md5-derived uniforms)
so a DuckDB oracle recomputes it bit-for-bit.

Scale posture:
- The corpus-sized stages are one doc-keyed combinable aggregation
  (gram counts) and one doc-keyed weighted sum — both linear, both
  map-side combinable.
- The distribution tables are capped at ``num_buckets`` rows and join
  back by broadcast; nothing corpus-sized ever shuffles by gram.
- Temperature mixing aggregates to one row per domain (tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_demos_spark.catalog import fan_out
from streaming_demos_spark.operators.text import tokens


def hash_bucket(gram: Column, num_buckets: int) -> Column:
    """Deterministic hash bucket in [0, num_buckets): integer value of
    the first 6 md5 hex digits mod ``num_buckets``.

    md5-over-string is the one hash both Spark and DuckDB can compute
    identically (DuckDB: ``('0x' || substr(md5(g), 1, 6))::BIGINT``),
    and 24 bits >> any practical ``num_buckets``, so the mod is
    uniform.
    """
    return (
        F.conv(F.substring(F.md5(gram), 1, 6), 16, 10).cast("long")
        % F.lit(num_buckets)
    )


def doc_bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_buckets: int = 256,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hashed n-gram feature counts per document:
    ``(id, bucket, cnt [, carry_cols])`` with one row per distinct
    bucket a document touches.

    Grams are whitespace unigrams plus word bigrams (the DSIR paper's
    feature space). Tokens are materialized in a prior projection so
    codegen doesn't re-run the split per slice, and the aggregation is
    keyed by (doc, bucket) — map-side combinable, no gram-keyed shuffle
    ever happens (a hot gram like "the" never becomes a hot shuffle
    key; it folds into per-doc bucket counts immediately).
    """
    base = fan_out(
        docs.select(F.col(id_col), F.col(text_col), *carry_cols), id_col
    ).select(F.col(id_col), tokens(text_col).alias("_w"), *carry_cols)
    w = F.col("_w")
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(
            F.slice(w, 1, F.size(w) - 1),
            lambda x, i: F.concat_ws(" ", x, F.element_at(w, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(w, bigrams)
    return (
        base.select(F.col(id_col), F.explode(grams).alias("_g"), *carry_cols)
        .select(
            F.col(id_col),
            hash_bucket(F.col("_g"), num_buckets).alias("bucket"),
            *carry_cols,
        )
        .groupBy(id_col, "bucket", *carry_cols)
        .agg(F.count("*").alias("cnt"))
    )


def dsir_log_weights(
    docs: DataFrame,
    target_pred: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_buckets: int = 256,
    round_dp: int = 4,
) -> DataFrame:
    """Per-document DSIR log importance weight
    ``log p_target(doc) - log p_raw(doc)`` under hashed-n-gram
    multinomials with add-one smoothing:

        log_w(d) = sum_b n_d[b] * ( ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B)) )

    where ``t_b``/``r_b`` are bucket counts over the target slice /
    whole corpus, ``T``/``R`` their totals, ``B = num_buckets``.
    ``target_pred`` is a boolean Column over ``docs`` selecting the
    target-domain slice (e.g. ``F.col("lang") == "en"``).

    Plan shape (the part that must survive 100 TB):
    1. one (doc, bucket)-keyed combinable aggregation over the corpus,
       computed ONCE and persisted — it feeds the raw totals, the
       target totals, and the final weighted sum;
    2. two bucket aggregations over that frame — output bounded at
       ``num_buckets`` rows each, merged into a single log-ratio table;
    3. a broadcast join of the ratio table back onto the per-doc
       counts, then a doc-keyed sum.
    The corpus is never shuffled by gram or bucket alone; every
    corpus-sized exchange is keyed by doc id.
    """
    from pyspark import StorageLevel

    feat = doc_bucket_counts(
        docs.withColumn("_is_target", target_pred.cast("int")),
        text_col,
        id_col,
        num_buckets=num_buckets,
        carry_cols=("_is_target",),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    per_bucket = feat.groupBy("bucket").agg(
        F.sum("cnt").alias("r_b"),
        F.sum(F.col("cnt") * F.col("_is_target")).alias("t_b"),
    )
    totals = per_bucket.agg(
        F.sum("r_b").alias("r_tot"), F.sum("t_b").alias("t_tot")
    )
    b = float(num_buckets)
    ratio = per_bucket.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("t_b") + 1.0) / (F.col("t_tot") + b))
            - F.log((F.col("r_b") + 1.0) / (F.col("r_tot") + b))
        ).alias("log_ratio"),
    )
    return (
        feat.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), round_dp).alias(
                "log_weight"
            )
        )
    )


def gumbel_key(log_weight: Column, id_col: Column) -> Column:
    """Deterministic Gumbel-perturbed sampling key
    ``log_weight - ln(-ln(u))`` with ``u`` an md5-derived uniform of
    the row id — the Gumbel-top-k trick turns weighted sampling WITHOUT
    replacement into a plain distributed top-k (public folklore;
    deterministic here so the oracle can replay it).

    ``u = (h32 + 0.5) / 2^32`` with ``h32`` the first 8 md5 hex digits
    — the +0.5 keeps u strictly inside (0, 1) so neither log can hit a
    pole under ANSI mode.
    """
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "double"
    )
    u = (h + 0.5) / F.lit(4294967296.0)
    return log_weight - F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    *,
    round_dp: int = 4,
) -> DataFrame:
    """Gumbel-top-k resample of a DSIR weight table: the ``k`` rows
    with the largest perturbed keys, i.e. a deterministic draw from the
    importance distribution without replacement.

    One TakeOrderedAndProject over the weight table — no shuffle, no
    full sort; the driver sees exactly ``k`` rows.
    """
    key = F.round(
        gumbel_key(F.col(weight_col), F.col(id_col)), round_dp
    ).alias("sample_key")
    return (
        weights.select(F.col(id_col), F.col(weight_col), key)
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def temperature_mix(
    docs: DataFrame,
    group_col: str = "source",
    size_col: str = "n_chars",
    *,
    alpha: float = 0.3,
    token_budget: int = 1_000_000,
    round_dp: int = 6,
) -> DataFrame:
    """Temperature-scaled domain-mixture weights: for per-domain token
    masses ``n_i``, sampling weight ``w_i = n_i^alpha / sum_j n_j^alpha``
    (the multilingual up-sampling rule, alpha<1 flattens the head), plus
    the effective epoch count ``epochs_i = w_i * budget / n_i`` that a
    ``token_budget``-token training run implies — the number every mix
    review asks for, because epochs >> 1 on a small domain means
    memorization risk.

    One tiny aggregation (|domains| rows) + a 1-row broadcast; the
    corpus-sized stage is a single map-side-combinable sum.

    Zero-mass domains (every doc empty) are dropped rather than
    emitted: they have no mixture role, and keeping them would make
    ``epochs`` a 0/0 (ANSI mode would throw).
    """
    per = docs.groupBy(group_col).agg(F.sum(size_col).alias("n_tokens")).filter(
        F.col("n_tokens") > 0
    )
    tot = per.agg(
        F.sum("n_tokens").alias("_tot"),
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))).alias(
            "_z"
        ),
    )
    w = F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)) / F.col("_z")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_tokens",
            F.expr(
                "cast((cast(n_tokens as decimal(38,0)) * 1000000 * 2 + _tot)"
                " div (2 * _tot) as bigint)"
            ).alias("nat_frac_e6"),
            F.round(w, round_dp).alias("mix_weight"),
            F.round(
                w * F.lit(float(token_budget)) / F.col("n_tokens"), round_dp
            ).alias("epochs"),
        )
        .orderBy(group_col)
    )


def feature_hash_signed(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    dim: int = 64,
) -> DataFrame:
    """Signed hashing-trick vectorizer (Weinberger et al., ICML 2009):
    ``(id, idx, val)`` sparse rows where each whitespace token lands in
    bucket ``h(w) mod dim`` with sign ``±1`` from an independent hash
    bit, and ``val`` sums the signs.

    The sign makes hash collisions cancel in expectation (the inner
    product between hashed vectors is an unbiased estimate of the
    original), which the unsigned ``doc_bucket_counts`` cannot claim.
    Both hashes read disjoint md5 hex slices — index from digits 1-6,
    sign from the parity of digit 7 — so DuckDB reproduces them
    verbatim. The aggregation is keyed by (doc, idx): hot tokens fold
    into per-doc partial sums map-side and never become hot shuffle
    keys. Zero-sum buckets are dropped (they carry no vector mass),
    keeping the output a true sparse representation.
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("_w"))
    exploded = base.select(F.col(id_col), F.explode("_w").alias("_t"))
    h = F.md5(F.col("_t"))
    idx = F.conv(F.substring(h, 1, 6), 16, 10).cast("long") % F.lit(dim)
    sign = F.when(
        F.conv(F.substring(h, 7, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        exploded.select(F.col(id_col), idx.alias("idx"), sign.alias("_s"))
        .groupBy(id_col, "idx")
        .agg(F.sum("_s").alias("val"))
        .filter(F.col("val") != 0)
    )
