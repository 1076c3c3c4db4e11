"""Bounded-memory frequency sketches with exact verification passes.

The reference repo has no sketch surface; this extends the engine
toward the 100 TB goal with the standard heavy-hitters shape: a
map-side Misra-Gries summary proposes a SMALL candidate set, an exact
second pass counts only those candidates, and the emitted answer is
EXACT — so a plain SQL oracle can verify it even though the first pass
is approximate.

Why this is the right 100 TB plan: a naive ``groupBy(term).count()``
over a web corpus shuffles by term — billions of distinct keys, brutal
skew on stopwords. Misra-Gries (Misra & Gries 1982; mergeable-summary
form per Agarwal et al. 2012, both public) keeps ``k`` counters per
partition with the guarantee that any term with global frequency
``> N/k`` survives in at least one partition's summary (pigeonhole over
the per-partition deficits). The exact pass then shuffles only rows
whose term is in the ≤ k·P candidate union — after a broadcast filter,
a shuffle bounded by the candidate count, not the vocabulary.

The Python stage is Arrow-batched and operates on pandas
``value_counts`` results (distinct-terms-per-batch granularity), never
token-at-a-time.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_demos_spark.catalog import fan_out
from streaming_demos_spark.operators.selection import hash_bucket
from streaming_demos_spark.operators.text import tokens


def _mg_merge(summary: dict[str, int], counts: pd.Series, k: int) -> dict[str, int]:
    """Merge a batch's exact value counts into a Misra-Gries summary of
    at most ``k`` counters (mergeable-summaries rule: add, then if over
    k counters subtract the (k+1)-th largest count from all and drop
    the non-positive ones)."""
    for term, c in counts.items():
        summary[term] = summary.get(term, 0) + int(c)
    if len(summary) > k:
        kth = sorted(summary.values(), reverse=True)[k]
        summary = {t: c - kth for t, c in summary.items() if c - kth > 0}
    return summary


def mg_candidates(
    exploded: DataFrame, term_col: str = "term", *, k: int
) -> DataFrame:
    """Per-partition Misra-Gries summaries (map-only): each partition
    emits the ≤ k terms that could have partition-local frequency
    > n_p/k, PLUS one ``(term=NULL, n=partition_row_count)`` row so the
    global total rides along in the same scan. The union of non-null
    terms over partitions is a superset of every term with GLOBAL
    frequency > N/k."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict[str, int] = {}
        n = 0
        for pdf in batches:
            if len(pdf):
                n += len(pdf)
                summary = _mg_merge(summary, pdf[term_col].value_counts(), k)
        yield pd.DataFrame(
            {term_col: list(summary.keys()) + [None], "n": [0] * len(summary) + [n]}
        )

    return exploded.mapInPandas(run, schema=f"{term_col} string, n long")


def heavy_hitters(
    df: DataFrame,
    term_col: str,
    *,
    k: int = 100,
    round_dp: int = 6,
) -> DataFrame:
    """Exact frequency-threshold heavy hitters over an already-exploded
    term column: every value with frequency > N/k, with its EXACT count
    and frequency share, found without ever shuffling by raw term.

    Two scans of the input, no persist: scan 1 is the map-only sketch
    (which also yields the global row count), scan 2 counts ONLY the
    broadcast candidate set. ``cnt * k > N`` is evaluated in integers,
    so the emitted set is bit-reproducible and oracle-checkable (no
    epsilon).
    """
    from pyspark import StorageLevel

    exploded = fan_out(df.select(term_col))
    # The sketch output is tiny (≤ k+1 rows/partition) but feeds two
    # consumers (candidates + total); persist it so the corpus scan
    # behind it runs once, not twice.
    sketch = mg_candidates(exploded, term_col, k=k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = sketch.filter(F.col(term_col).isNotNull()).select(term_col).distinct()
    total = sketch.agg(F.sum("n").alias("_n"))
    counted = (
        exploded.join(F.broadcast(cands), term_col, "inner")
        .groupBy(term_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * F.lit(k) > F.col("_n"))
        .select(
            term_col,
            "cnt",
            # cnt/N is a RATIONAL — a 6-dp rounding can land on a
            # midpoint across engine builds; half-up e6 integer instead
            F.expr("cast((cast(cnt as decimal(38,0)) * 1000000 * 2 + _n)"
                   " div (2 * _n) as bigint)").alias(
                "freq_e6"
            ),
        )
        .orderBy(F.desc("cnt"), F.asc(term_col))
    )


def streaming_heavy_hitters(
    stream: DataFrame,
    term_col: str = "term",
    *,
    k: int = 100,
    num_groups: int = 16,
) -> DataFrame:
    """Streaming Misra-Gries: maintain a bounded per-shard summary in
    keyed state and re-emit it every micro-batch.

    Terms are sharded into ``num_groups`` state keys by the same md5
    bucket hash the batch ops use, so state is bounded at
    ``num_groups * k`` counters TOTAL regardless of vocabulary size —
    the property an exact streaming ``groupBy(term).count()`` cannot
    give. Emitted counts are the MG lower bounds (true count minus at
    most ``n_shard/k``); a downstream exact recount of the emitted
    candidates (as in :func:`heavy_hitters`) restores exactness when a
    batch pass over the retained log is affordable.

    Works unchanged on batch frames via the shared merge kernel —
    ``heavy_hitters``'s candidate set is exactly this operator's final
    emission, which is what ``tests/test_selection.py`` asserts.
    """
    from pyspark.sql import types as T

    shard = hash_bucket(F.col(term_col), num_groups).alias("shard")
    keyed = stream.select(shard, F.col(term_col))
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType(), False),
            T.StructField(term_col, T.StringType(), True),
            T.StructField("cnt_lb", T.LongType(), False),
        ]
    )

    def run(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, cnts = state.get
            summary = dict(zip(list(terms), [int(c) for c in cnts]))
        else:
            summary = {}
        for pdf in pdfs:
            if len(pdf):
                summary = _mg_merge(summary, pdf[term_col].value_counts(), k)
        state.update((list(summary.keys()), list(summary.values())))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(summary),
                term_col: list(summary.keys()),
                "cnt_lb": list(summary.values()),
            }
        )

    return keyed.groupBy("shard").applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType="terms array<string>, cnts array<long>",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def heavy_hitter_terms(
    docs: DataFrame,
    text_col: str = "text",
    *,
    k: int = 100,
) -> DataFrame:
    """Heavy-hitter TOKENS of a document corpus: tokenize, explode,
    run the two-pass sketch. The explode is map-side; nothing shuffles
    until the candidate-filtered count."""
    exploded = (
        fan_out(docs.select(text_col))
        .select(tokens(text_col).alias("_w"))
        .select(F.explode("_w").alias("term"))
    )
    return heavy_hitters(exploded, "term", k=k)


# --- count-min sketch --------------------------------------------------------


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` CMS bucket of a string value: hex digits
    ``[6r, 6r+6)`` of ONE md5 over the value, mod ``width``.

    One digest feeds every sketch row (segment scheme, depth <= 5 from
    a 32-hex digest) instead of one salted digest per row — the md5
    work per item drops by ``depth``x, and disjoint segments of a
    cryptographic hash are independent for CMS purposes (the classic
    practical stand-in for d independent hash functions).
    """
    if row >= 5:
        raise ValueError("segment scheme supports depth <= 5")
    return (
        F.conv(
            F.substring(F.md5(col), 1 + 6 * row, 6), 16, 10
        ).cast("long")
        % F.lit(width)
    )


def count_min_sketch(
    items: DataFrame,
    value_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Build a count-min sketch of a value stream as a DataFrame of
    ``(row, bucket, cnt)`` cells — ``depth * width`` rows total, the
    mergeable fixed-memory frequency summary (Cormode & Muthukrishnan
    2005). Each cell count is a map-side-combinable aggregation; two
    sketches (two days, two shards) merge by summing cells — which is
    exactly a ``union + groupBy``, so the structure is
    partition-friendly by construction.
    """
    # All depth rows in ONE pass over the items (a union of per-row
    # selects re-scans — and re-tokenizes — the stream `depth` times):
    # the md5 is materialized ONCE per item in a prior projection
    # (segment scheme, see cms_bucket), then each item explodes into
    # its d (row, bucket) cells inline.
    seg = lambda r: (  # noqa: E731 - row-r segment of the one digest
        F.conv(F.substring("_h", 1 + 6 * r, 6), 16, 10).cast("long")
        % F.lit(width)
    )
    entries = F.explode(
        F.array(
            *[
                F.struct(F.lit(r).alias("row"), seg(r).alias("bucket"))
                for r in range(depth)
            ]
        )
    )
    if depth > 5:
        raise ValueError("segment scheme supports depth <= 5")
    return (
        items.select(F.md5(F.col(value_col)).alias("_h"))
        .select(entries.alias("e"))
        .select("e.row", "e.bucket")
        .groupBy("row", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimates(
    sketch: DataFrame,
    probes: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for literal ``probes`` from a CMS
    frame: est(x) = min over rows of cell(row, h_row(x)) — the one-sided
    CMS guarantee (est >= true, over-count bounded by N·e/width per
    row). Probe buckets are driver-computed literals; the lookup is a
    broadcast join against the d×w cell frame."""
    import hashlib

    probe_rows = [
        (
            p,
            r,
            int(
                hashlib.md5(p.encode()).hexdigest()[6 * r : 6 * r + 6], 16
            )
            % width,
        )
        for p in probes
        for r in range(depth)
    ]
    probe_df = F.broadcast(
        sketch.sparkSession.createDataFrame(
            probe_rows, "term string, row int, bucket long"
        )
    )
    return (
        probe_df.join(
            sketch.withColumn("row", F.col("row").cast("int")), ["row", "bucket"], "left"
        )
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
        .orderBy("term")
    )


def bloom_bits(items: DataFrame, value_col: str, num_hashes: int = 4,
               num_bits: int = 4096) -> DataFrame:
    """Build a Bloom filter as a DataFrame of distinct set-bit
    positions — the distributed-native representation: two filters
    (two shards, two days) merge by ``union + distinct``, and the
    build is one projection + one distinct, both map-side combinable.

    Bit positions reuse the CMS segment scheme (``cms_bucket``): hex
    digits ``[6h, 6h+6)`` of ONE md5 per item, mod ``num_bits`` — one
    digest serves all ``num_hashes`` positions (depth <= 5).

    At 100 TB the bit-position frame for a well-sized filter is at
    most ``num_bits`` rows regardless of item count — a broadcastable
    summary of an arbitrarily large key set, which is the whole point:
    probe-side membership tests become a broadcast join, never a
    shuffle of the big build side.
    """
    if num_hashes > 5:
        raise ValueError("segment scheme supports num_hashes <= 5")
    seg = lambda h: (  # noqa: E731
        F.conv(F.substring("_h", 1 + 6 * h, 6), 16, 10).cast("long")
        % F.lit(num_bits)
    )
    return (
        items.select(F.md5(F.col(value_col).cast("string")).alias("_h"))
        .select(
            F.explode(
                F.array(*[seg(h) for h in range(num_hashes)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(bits: DataFrame, probes: DataFrame, value_col: str,
                num_hashes: int = 4, num_bits: int = 4096) -> DataFrame:
    """Membership test of ``probes[value_col]`` against a Bloom
    bit-position frame: a probe is a HIT iff all ``num_hashes`` of its
    positions are set (no false negatives; false-positive rate
    ``(1 - e^{-kn/m})^k``). Adds a boolean ``bloom_hit`` per probe row.

    The bit frame is broadcast (<= ``num_bits`` rows by construction),
    so the probe side — the potentially huge one — is never shuffled:
    explode to (probe, bit), broadcast-left-join, count matched bits
    per probe. This is the semi-join-reduction shape Bloom filters
    exist for.
    """
    if num_hashes > 5:
        raise ValueError("segment scheme supports num_hashes <= 5")
    seg = lambda h: (  # noqa: E731
        F.conv(F.substring("_h", 1 + 6 * h, 6), 16, 10).cast("long")
        % F.lit(num_bits)
    )
    exploded = (
        probes.withColumn(
            "_h", F.md5(F.col(value_col).cast("string"))
        )
        .withColumn(
            "bit",
            F.explode(F.array(*[seg(h) for h in range(num_hashes)])),
        )
    )
    marked = exploded.join(
        F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left"
    )
    probe_cols = [c for c in probes.columns]
    # "hit iff EVERY position is set" as a min over per-bit indicators —
    # robust to duplicate probe rows collapsing in the groupBy (a count
    # of matched rows would double for them) and to two hash segments
    # landing on the same bit.
    return (
        marked.groupBy(*probe_cols)
        .agg(
            (
                F.min(
                    F.when(F.col("_set").isNotNull(), 1).otherwise(0)
                )
                == F.lit(1)
            ).alias("bloom_hit")
        )
    )
