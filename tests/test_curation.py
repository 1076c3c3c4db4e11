"""Unit tests for corpus-curation operators (decontamination, stratified
sampling, mix weights, token histogram, repetition stats) on crafted
micro-data — semantics the synthetic corpus can't pin down, while the
oracle sweep covers engine-vs-DuckDB equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_demos_spark.operators import curation as CU


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
        (2, "a completely different sentence about spark engines", "en", "web"),
        (3, "el gato duerme en la casa grande hoy", "es", "web"),
        (4, "short doc", "en", "web"),
        (5, "aaa aaa aaa aaa aaa aaa aaa bbb", "en", "web"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


@pytest.fixture(scope="module")
def eval_set(spark):
    # Shares the "quick brown fox" 3-grams with doc 1 only.
    rows = [(100, "the quick brown fox runs fast", "en", "eval")]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


def test_decontaminate_flags_overlapping_doc(corpus, eval_set):
    out = {r.doc_id: r for r in CU.decontaminate(corpus, eval_set).collect()}
    assert len(out) == 5
    assert out[1].contaminated and out[1].n_hits >= 1  # shares "the quick brown"
    for i in (2, 3, 4, 5):
        assert not out[i].contaminated and out[i].n_hits == 0


def test_decontaminate_min_hits_threshold(corpus, eval_set):
    # Doc 1 shares exactly two 3-grams ("the quick brown", "quick brown fox");
    # a min_hits above that clears it.
    out = {r.doc_id: r.contaminated
           for r in CU.decontaminate(corpus, eval_set, min_hits=3).collect()}
    assert not any(out.values())


def test_stratified_sample_is_deterministic_subset(corpus):
    a = sorted(r.doc_id for r in
               CU.stratified_sample(corpus, "lang", {"en": 0.5}).collect())
    b = sorted(r.doc_id for r in
               CU.stratified_sample(corpus, "lang", {"en": 0.5}).collect())
    assert a == b  # pure function of doc_id, not partitioning/run
    all_ids = {r.doc_id for r in corpus.collect()}
    assert set(a) <= all_ids
    # default_rate=1.0 keeps every non-en row
    assert {r.doc_id for r in corpus.filter(F.col("lang") != "en").collect()} <= set(a)


def test_stratified_sample_rate_zero_and_one(corpus):
    none_en = CU.stratified_sample(corpus, "lang", {"en": 0.0}).collect()
    assert all(r.lang != "en" for r in none_en)
    everything = CU.stratified_sample(corpus, "lang", {}, default_rate=1.0)
    assert everything.count() == corpus.count()


def test_mix_weights_reshape(corpus):
    out = {r.lang: r for r in
           CU.mix_weights(corpus, "lang", {"en": 0.5, "es": 0.5}).collect()}
    assert out["en"].n_docs == 4 and out["es"].n_docs == 1
    assert out["en"].actual_share_e6 == 800000
    # weight = target / actual
    assert out["en"].weight_e6 == 625000   # 0.5/0.8
    assert out["es"].weight_e6 == 2500000  # 0.5/0.2
    # applying the weights hits the target shares exactly
    reweighted_en = out["en"].n_docs * out["en"].weight_e6 / 1e6
    reweighted_es = out["es"].n_docs * out["es"].weight_e6 / 1e6
    total = reweighted_en + reweighted_es
    assert reweighted_en / total == pytest.approx(0.5)


def test_token_histogram_buckets(corpus):
    docs = corpus.withColumn("n_chars", F.length("text"))
    out = {r.bucket_lo: r.n_docs for r in CU.token_histogram(docs).collect()}
    # docs 2,4 have 7,2 tokens -> bucket 0; docs 1,3,5 have 8-9 -> bucket 8
    assert out[0] == 2 and out[8] == 3


def test_pack_sequences_offsets_and_bins(corpus):
    out = {r.doc_id: r for r in
           CU.pack_sequences(corpus, budget=10, shard_col="source").collect()}
    # single shard "web", id order: doc1 starts at 0, later docs at the
    # running sum of earlier token counts
    assert out[1].seq_id == 0 and out[1].offset_in_seq == 0
    running = 0
    for i in (1, 2, 3, 4, 5):
        assert out[i].seq_id == running // 10
        assert out[i].offset_in_seq == running % 10
        running += out[i].n_tokens
    # every document is assigned exactly one sequence slot
    assert len(out) == 5


def test_pack_sequences_shards_are_independent(spark):
    rows = [(1, "a b c", "s1"), (2, "d e", "s2")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r.doc_id: r for r in CU.pack_sequences(df, budget=4).collect()}
    # both shard-leading docs start at offset 0 of sequence 0
    assert out[1].offset_in_seq == 0 and out[2].offset_in_seq == 0


def test_chunk_documents_overlap_and_coverage(spark):
    text = " ".join(f"w{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    chunks = sorted(
        CU.chunk_documents(df, chunk_tokens=16, overlap=4).collect(),
        key=lambda r: r.chunk_idx,
    )
    # starts at 1, 13, 25, 37 (step 12) while start <= 50 - 4
    assert [c.chunk_idx for c in chunks] == [0, 1, 2, 3]
    assert chunks[0].chunk_text.startswith("w0 ") and chunks[0].n_chunk_tokens == 16
    # consecutive chunks share exactly `overlap` tokens
    a, b = chunks[0].chunk_text.split(), chunks[1].chunk_text.split()
    assert a[-4:] == b[:4]
    # final chunk is clamped to the document end
    assert chunks[-1].chunk_text.split()[-1] == "w49"
    # every token appears in at least one chunk
    covered = {t for c in chunks for t in c.chunk_text.split()}
    assert covered == set(text.split())


def test_chunk_documents_short_doc_single_chunk(corpus):
    out = CU.chunk_documents(corpus.filter(F.col("doc_id") == 4),
                             chunk_tokens=32, overlap=8).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 2


def test_chunk_documents_rejects_bad_overlap(corpus):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        CU.chunk_documents(corpus, chunk_tokens=8, overlap=8)


def test_repetition_stats_degenerate_doc(corpus):
    out = {r.doc_id: r for r in CU.repetition_stats(corpus).collect()}
    # doc 5: "aaa" x7 + "bbb" -> top token mass 7/8, distinct 2/8
    assert out[5].n_tokens == 8 and out[5].n_distinct == 2
    assert out[5].top_token_ratio == pytest.approx(7 / 8)
    assert out[5].distinct_ratio == pytest.approx(2 / 8)
    # doc 2: all-distinct sentence
    assert out[2].distinct_ratio == 1.0
    for r in out.values():
        assert 0 < r.distinct_ratio <= 1.0 and 0 < r.top_token_ratio <= 1.0


def test_redact_pii_staged_counting(spark):
    from streaming_demos_spark.operators.curation import redact_pii

    rows = [
        (1, "mail a.b+c@x-mail.co.uk now"),
        (2, "call 555-123-4567 or 555.123.4567"),   # dashed AND dotted phone
        (3, "host 192.168.0.1 and 10.0.0.255"),
        (4, "clean text, nothing to scrub"),
        (5, "e@a.io from 1.2.3.4 call 555 123 4567"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (1, 0, 0)
    assert "<EMAIL>" in out[1].redacted and "@" not in out[1].redacted
    # the dotted phone must count as a PHONE (staged), never as an IPv4
    assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 2, 0)
    assert out[2].redacted.count("<PHONE>") == 2
    assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 2)
    assert (out[4].n_email, out[4].n_phone, out[4].n_ipv4) == (0, 0, 0)
    assert out[4].redacted == rows[3][1]
    assert (out[5].n_email, out[5].n_phone, out[5].n_ipv4) == (1, 1, 1)


def test_weighted_priority_sample_bias_and_determinism(spark):
    from streaming_demos_spark.operators.curation import weighted_priority_sample

    # one stratum, 200 rows: ids 0-99 weight 10, ids 100-199 weight 1 —
    # the heavy-weight half must dominate the kept set
    rows = [(i, "s", 10.0 if i < 100 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["doc_id", "src", "w"])
    kept = weighted_priority_sample(
        df, weight_col="w", n_per_stratum=50, strata_col="src"
    ).collect()
    assert len(kept) == 50
    n_heavy = sum(1 for r in kept if r.doc_id < 100)
    assert n_heavy > 35  # w=10 vs w=1 -> heavy side should win ~90%+

    # deterministic across partitionings
    kept2 = weighted_priority_sample(
        df.repartition(7), weight_col="w", n_per_stratum=50, strata_col="src"
    ).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in kept2)

    # global (no stratum) top-n path
    top = weighted_priority_sample(df, weight_col="w", n_per_stratum=5).collect()
    assert len(top) == 5


# --- training-shard export ----------------------------------------------------


def test_shard_key_is_partitioning_invariant(spark):
    from streaming_demos_spark.operators.curation import shard_key

    df = spark.range(0, 500).selectExpr("id AS doc_id")
    a = {r.doc_id: r.s for r in df.select("doc_id", shard_key("doc_id", num_shards=16).alias("s")).collect()}
    b = {r.doc_id: r.s for r in df.repartition(7).select("doc_id", shard_key("doc_id", num_shards=16).alias("s")).collect()}
    assert a == b
    assert set(a.values()) <= set(range(16))
    # md5 uniformity: no shard holds more than 3x its fair share
    from collections import Counter

    counts = Counter(a.values())
    assert max(counts.values()) <= 3 * (500 // 16)


def test_shard_salt_rotates_assignment(spark):
    from streaming_demos_spark.operators.curation import shard_key

    df = spark.range(0, 300).selectExpr("id AS doc_id")
    a = [r.s for r in df.select(shard_key("doc_id", salt="e1", num_shards=16).alias("s")).collect()]
    b = [r.s for r in df.select(shard_key("doc_id", salt="e2", num_shards=16).alias("s")).collect()]
    assert a != b  # different epoch permutation


def test_write_training_shards_is_deterministic(spark, tmp_path):
    import hashlib
    import os

    from streaming_demos_spark.operators.curation import write_training_shards

    df = spark.range(0, 2000).selectExpr("id AS doc_id", "md5(cast(id AS string)) AS text")

    def digest(path):
        out = {}
        for root, _, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    shard = os.path.basename(root)
                    data = open(os.path.join(root, f), "rb").read()
                    out.setdefault(shard, hashlib.md5(data).hexdigest())
        return out

    p1, p2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_training_shards(df, p1, num_shards=8)
    write_training_shards(df.repartition(13), p2, num_shards=8)
    d1, d2 = digest(p1), digest(p2)
    assert len(d1) == 8
    assert d1 == d2  # same content + salt -> byte-identical shards

    back = spark.read.parquet(p1)
    assert back.count() == 2000


def test_per_group_sample_exact_k_and_deterministic(spark):
    rows = [(i, f"g{i % 3}") for i in range(40)] + [(100, "tiny")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    a = CU.per_group_sample(df, "source", k=4, id_col="doc_id")
    got = a.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    assert counts == {"g0": 4, "g1": 4, "g2": 4, "tiny": 1}
    # deterministic across repartitionings
    b = CU.per_group_sample(df.repartition(7), "source", k=4, id_col="doc_id")
    assert sorted(r.doc_id for r in a.collect()) == sorted(
        r.doc_id for r in b.collect()
    )


def test_curriculum_bins_balanced_and_ordered(spark):
    from streaming_demos_spark.catalog import load_table
    from streaming_demos_spark.operators import curation as C

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = C.curriculum_bins(docs, "n_chars", n_bins=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_bin = {}
    for r in rows:
        by_bin.setdefault(r["bin"], []).append(r["n_chars"])
    assert set(by_bin) <= {0, 1, 2, 3}
    # bins are ordered by value: max of bin i <= min of bin i+1
    for b in sorted(by_bin)[:-1]:
        if b + 1 in by_bin:
            assert max(by_bin[b]) <= min(by_bin[b + 1])
    # quantile bins are roughly balanced (ties can skew, not collapse)
    sizes = [len(v) for v in by_bin.values()]
    assert min(sizes) > 0.1 * max(sizes)


def test_curriculum_bins_no_global_sort_or_window(spark):
    from streaming_demos_spark.catalog import load_table
    from streaming_demos_spark.operators import curation as C

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        C.curriculum_bins(docs, "n_chars", n_bins=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # No rank-based global binning: every Window belongs to the
    # quantile selection and is partitioned — by the ([group,] prob,
    # which) probe key (bucket selection, one histogram bucket per
    # partition) or by the group key (cumulative histogram,
    # <= n_buckets rows per partition) — never an un-partitioned ntile
    # or a global row_number.
    assert "ntile" not in plan
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)", plan):
        head = re.split(r" (?:ASC|DESC)", spec)[0]
        assert "," in head, f"un-partitioned window: {spec}"


def test_quality_drift_psi_zero_for_identical_snapshots(spark):
    from streaming_demos_spark.catalog import load_table
    from streaming_demos_spark.operators import curation as C

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = C.quality_drift_psi(docs, docs, "n_chars", n_bins=5).collect()
    assert len(out) == 5
    assert all(abs(r.psi_term) < 1e-9 for r in out)
    assert all(r.share_a_e6 == r.share_b_e6 for r in out)


def test_quality_drift_psi_flags_shifted_distribution(spark):
    from streaming_demos_spark.catalog import load_table
    from streaming_demos_spark.operators import curation as C

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    # snapshot B: only the short half -> strong shift, PSI must be big
    short = docs.filter(F.col("n_chars") < 120)
    out = C.quality_drift_psi(docs, short, "n_chars", n_bins=5).collect()
    psi = sum(r.psi_term for r in out)
    assert psi > 0.2  # conventional "investigate" line
    # empty upper bins still yield finite terms (smoothing)
    assert all(r.psi_term is not None for r in out)


def test_dataset_card_known_corpus(spark):
    from streaming_demos_spark.operators import curation as C

    docs = spark.createDataFrame(
        [
            (1, "the cat sat", "en", 11),
            (2, "the cat sat", "en", 11),  # exact dup
            (3, "el gato", "es", 7),
            (4, "the dog ran far", "en", 15),
        ],
        "doc_id int, text string, lang string, n_chars int",
    )
    row = C.dataset_card(docs).collect()[0]
    assert row.n_docs == 4 and row.n_unique_texts == 3
    assert row.dup_rate_e6 == 250000
    assert row.total_tokens == 3 + 3 + 2 + 4
    # lang mix 3:1 -> H = -(0.75 log2 0.75 + 0.25 log2 0.25)
    import math

    h = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert abs(row.lang_entropy - round(h, 6)) < 1e-9
    # median of (11, 11, 7, 15) = 11
    assert row.p50_len == 11.0


def test_span_corruption_plan_hand_replay(spark):
    """Replicate the md5 span scheme in plain Python on a tiny doc and
    demand identical (n_tokens, n_masked, n_spans)."""
    import hashlib

    from streaming_demos_spark.operators.curation import (
        span_corruption_plan,
    )

    text = " ".join(f"w{i}" for i in range(200))
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    got = span_corruption_plan(df).collect()[0]

    starts = {}
    for pos in range(200):
        hv = int(
            hashlib.md5(f"7:{pos}".encode()).hexdigest()[:8], 16
        )
        if hv % 20 == 0:
            starts[pos] = 2 + hv % 3
    covered = sorted(
        {p for sp, ln in starts.items() for p in range(sp, sp + ln)
         if p < 200}
    )
    n_spans = sum(
        1 for i, p in enumerate(covered) if i == 0 or covered[i - 1] != p - 1
    )
    assert got.n_tokens == 200
    assert got.n_masked == len(covered)
    assert got.n_spans == n_spans
    assert got.n_masked > 0  # scheme actually fires at this length


def test_decompress_text_gzip_zlib_deflate(spark):
    import gzip
    import zlib

    text = "compressed corpora arrive as WARC members é中"
    raw = text.encode("utf-8")
    rows = [
        (0, gzip.compress(raw)),
        (1, b"not gzip at all"),
        (2, None),
        (3, gzip.compress(b"\xff\xfe invalid utf8 \x80")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in CU.decompress_text(df).collect()}
    assert out[0]["text"] == text
    assert out[0]["n_raw_bytes"] == len(gzip.compress(raw))
    assert out[0]["n_text_bytes"] == len(raw)
    assert out[1]["text"] is None and out[1]["n_text_bytes"] is None
    assert out[2]["text"] is None and out[2]["n_raw_bytes"] is None
    assert out[3]["text"] is None  # inflates fine, not utf-8 -> NULL

    zdf = spark.createDataFrame(
        [(0, zlib.compress(raw))], "doc_id long, payload binary")
    assert CU.decompress_text(zdf, codec="zlib").collect()[0]["text"] == text
    comp = zlib.compressobj(wbits=-15)
    stream = comp.compress(raw) + comp.flush()
    ddf = spark.createDataFrame(
        [(0, stream)], "doc_id long, payload binary")
    assert CU.decompress_text(
        ddf, codec="deflate").collect()[0]["text"] == text

    import bz2
    import lzma
    bdf = spark.createDataFrame(
        [(0, bz2.compress(raw))], "doc_id long, payload binary")
    assert CU.decompress_text(bdf, codec="bz2").collect()[0]["text"] == text
    xdf = spark.createDataFrame(
        [(0, lzma.compress(raw))], "doc_id long, payload binary")
    assert CU.decompress_text(xdf, codec="xz").collect()[0]["text"] == text

    with pytest.raises(ValueError):
        CU.decompress_text(df, codec="lz4")


def test_decompress_text_gzip_member_structure(spark):
    import gzip
    import zlib

    text = "member with structured header fields"
    raw = text.encode()
    full = gzip.compress(raw)
    # FNAME-flagged member built by hand: flag 0x08 + name + NUL
    comp = zlib.compressobj(wbits=-15)
    body = comp.compress(raw) + comp.flush()
    named = (b"\x1f\x8b\x08\x08" + b"\x00" * 6 + b"doc.txt\x00" + body
             + zlib.crc32(raw).to_bytes(4, "little")
             + (len(raw) % 2**32).to_bytes(4, "little"))
    rows = [
        (0, named),
        (1, full[:-8]),              # truncated exactly at the trailer
        (2, full[: len(full) // 2]),  # truncated mid-DEFLATE
        (3, full[:-8] + b"\x00\x00\x00\x00" + full[-4:]),  # bad CRC
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r["text"]
           for r in CU.decompress_text(df).collect()}
    assert out[0] == text
    assert out[1] == text   # tolerant: trailer absent entirely
    assert out[2] is None   # mid-stream truncation is corrupt
    assert out[3] is None   # trailer present and wrong -> strict


def test_decompress_text_truncated_streams_are_null(spark):
    # review finding (r10): deflate/bz2/xz truncation returns a silent
    # partial prefix (or b'') with no exception — the eof gate must
    # turn those into NULL rows, never truncated-but-valid text
    import bz2
    import lzma
    import zlib

    raw = ("sentence " * 60).encode()
    comp = zlib.compressobj(wbits=-15)
    deflate = comp.compress(raw) + comp.flush()
    cases = [
        ("deflate", deflate[: len(deflate) // 2]),
        ("bz2", bz2.compress(raw)[: len(bz2.compress(raw)) // 2]),
        ("xz", lzma.compress(raw)[: len(lzma.compress(raw)) // 2]),
        ("zlib", zlib.compress(raw)[: len(zlib.compress(raw)) // 2]),
    ]
    for codec, payload in cases:
        df = spark.createDataFrame(
            [(0, payload)], "doc_id long, payload binary")
        got = CU.decompress_text(df, codec=codec).collect()[0]
        assert got["text"] is None, codec
        # intact streams still pass through the same eof gate
        full = {"deflate": deflate, "bz2": bz2.compress(raw),
                "xz": lzma.compress(raw),
                "zlib": zlib.compress(raw)}[codec]
        df2 = spark.createDataFrame(
            [(0, full)], "doc_id long, payload binary")
        assert CU.decompress_text(
            df2, codec=codec).collect()[0]["text"] == raw.decode(), codec


def test_decompress_text_zlib_bomb_capped(spark):
    import zlib

    bomb = zlib.compress(b"\x00" * (64 * 1024 * 200))
    assert len(bomb) * 1000 < 64 * 1024 * 200
    df = spark.createDataFrame([(0, bomb)], "doc_id long, payload binary")
    got = CU.decompress_text(df, codec="zlib").collect()[0]
    assert got["text"] is None


def test_decompress_text_gzip_partial_trailer_is_null(spark):
    # trailer cut INSIDE the 8 trailer bytes (CRC maybe intact, ISIZE
    # gone) is corrupt — only a trailer absent ENTIRELY is tolerated
    import gzip

    full = gzip.compress(b"some member text")
    for cut in (1, 4, 7):
        df = spark.createDataFrame(
            [(0, full[: len(full) - 8 + cut])],
            "doc_id long, payload binary")
        assert CU.decompress_text(df).collect()[0]["text"] is None, cut


def test_decompress_text_gzip_multi_member_and_trailing_garbage(spark):
    # ADVICE r10: bytes after a valid 8-byte trailer used to be
    # silently ignored — a concatenated multi-member file decoded to
    # only the first member's text, and appended garbage still passed.
    # Now: members concatenate; non-member tail bytes -> NULL.
    import gzip

    a, b_, c = b"first member. ", b"second member. ", b"third."
    two = gzip.compress(a) + gzip.compress(b_)
    three = two + gzip.compress(c)
    garbage = gzip.compress(a) + b"NOT A GZIP MEMBER"
    one_byte_tail = gzip.compress(a) + b"\x1f"  # next-magic cut short
    bad_second = gzip.compress(a) + gzip.compress(b_)[: len(
        gzip.compress(b_)) // 2]  # second member truncated mid-stream
    rows = [(0, two), (1, three), (2, garbage), (3, one_byte_tail),
            (4, bad_second)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in CU.decompress_text(df).collect()}
    assert out[0]["text"] == (a + b_).decode()
    assert out[0]["n_text_bytes"] == len(a + b_)
    assert out[1]["text"] == (a + b_ + c).decode()
    assert out[2]["text"] is None
    assert out[3]["text"] is None
    assert out[4]["text"] is None
    # the ratio cap bounds the RUNNING TOTAL across members (the
    # `cap - total + 1` budget shrinks as members decode): a bomb
    # member followed by more members still trips the cap mid-walk
    bomb = gzip.compress(b"\x00" * (64 * 1024 * 200))
    assert len(bomb) * 1000 < 64 * 1024 * 200
    df2 = spark.createDataFrame(
        [(0, bomb + gzip.compress(a))], "doc_id long, payload binary")
    assert CU.decompress_text(df2).collect()[0]["text"] is None


def test_decompress_text_bomb_capped(spark):
    import gzip

    # 64 KiB of zeros compresses to ~100 bytes -> ratio >> 1000 -> NULL
    bomb = gzip.compress(b"\x00" * (64 * 1024 * 200))
    assert len(bomb) * 1000 < 64 * 1024 * 200
    df = spark.createDataFrame([(0, bomb)], "doc_id long, payload binary")
    got = CU.decompress_text(df).collect()[0]
    assert got["text"] is None and got["n_raw_bytes"] == len(bomb)
