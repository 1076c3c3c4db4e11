"""Unit tests for the LLM-pipeline operators (dedup / similarity /
text / multimodal) on crafted micro-data — covers the semantics the
synthetic corpus can't (true duplicates, near-identical docs), while
test_oracle_parity.py covers engine-vs-DuckDB equivalence."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from streaming_demos_spark.operators import dedup as D
from streaming_demos_spark.operators import multimodal as MM
from streaming_demos_spark.operators import similarity as SIM
from streaming_demos_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),   # near dup of 1
        (4, "completely different words about spark engines"),
        (5, "tiny doc"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(docs):
    out = D.exact_dedup(docs).select("doc_id").orderBy("doc_id").collect()
    assert [r.doc_id for r in out] == [1, 3, 4, 5]


def test_exact_dedup_groups_counts(docs):
    groups = {r.keep_doc_id: r.n_copies for r in D.exact_dedup_groups(docs).collect()}
    assert groups[1] == 2 and groups[3] == 1


def test_minhash_finds_exact_and_near_dups(docs):
    # band_rows=1 (12 bands of 1 hash) => candidate if ANY minhash
    # agrees: recall ~1-(1-j)^12, effectively 1.0 at j>=0.5. The default
    # 4x3 banding trades that recall for fewer candidates at scale.
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in D.minhash_near_dup_pairs(docs, threshold=0.5, band_rows=1).collect()
    }
    assert pairs[(1, 2)] == 10000        # identical docs: jaccard exactly 1
    assert (1, 3) in pairs and pairs[(1, 3)] >= 5000  # one-word change
    assert all(4 not in p and 5 not in p for p in pairs)


def test_ngram_jaccard_exact_join(docs):
    pairs = {
        (r.doc_a, r.doc_b): r.jaccard_e4
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 10000
    assert (1, 3) in pairs and pairs[(1, 3)] >= 5000
    assert all(4 not in p and 5 not in p for p in pairs)


def test_ngram_jaccard_no_false_negatives(spark):
    # Prefix filtering is EXACT: against a brute-force all-pairs oracle
    # on a small corpus, the operator must return every pair with
    # J >= t (modulo the hot-shingle cap, disabled here via a huge cap).
    import itertools

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    words = base.split()
    rows = []
    for i in range(20):
        # rotate + drop words to create a graded similarity spectrum
        w = words[i % 4 :] + words[: i % 4]
        if i % 3 == 0:
            w = w[:-2]
        rows.append((i, " ".join(w)))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 0.6
    got = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(df, threshold=t, max_bucket=10**6).collect()
    }

    def shingles(text, k=3):
        ws = text.lower().split()
        if len(ws) < k:
            return {" ".join(ws)}
        return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}

    expect = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        sa, sb = shingles(ta), shingles(tb)
        j = len(sa & sb) / len(sa | sb)
        if round(j, 4) >= t:
            expect.add((min(ia, ib), max(ia, ib)))
    assert got == expect and expect  # exact recall, non-vacuous


def test_simhash_identical_docs_equal(docs):
    fp = {r.doc_id: r.simhash for r in D.simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2]
    assert len(fp[1]) == 32 and set(fp[1]) <= {"0", "1"}
    # near-dup: small Hamming distance; unrelated: large
    ham13 = sum(a != b for a, b in zip(fp[1], fp[3]))
    ham14 = sum(a != b for a, b in zip(fp[1], fp[4]))
    assert ham13 < ham14


def test_jaccard_shingles_bounds(spark):
    df = spark.createDataFrame(
        [(["a b c", "b c d"], ["a b c", "b c d"]), (["a b c"], ["x y z"])],
        ["sa", "sb"],
    )
    vals = [r[0] for r in df.select(D.jaccard_shingles(F.col("sa"), F.col("sb"))).collect()]
    assert vals == [1.0, 0.0]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),   # near-identical to 0
        (2, [0.0, 1.0, 0.0, 0.0]),     # orthogonal
        (3, [-1.0, 0.0, 0.0, 0.0]),    # opposite
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_force_topk_ordering(emb):
    out = SIM.brute_force_topk(emb, query_vec_id=0, k=4).collect()
    assert [r.vec_id for r in out] == [1, 4, 2, 3]
    assert out[0].cos_sim > 0.999
    assert out[-1].cos_sim == -1.0


def test_lsh_same_bucket_for_near_identical(emb):
    b = {r.vec_id: r.bucket for r in SIM.with_lsh_bucket(emb, num_planes=4).collect()}
    assert b[0] == b[1]            # near-identical vectors share the bucket
    assert b[0] != b[3]            # opposite vector flips every plane


def test_lsh_topk_finds_near_identical(emb):
    out = SIM.lsh_topk(emb, query_vec_id=0, k=3).collect()
    assert out and out[0].vec_id == 1


def test_lsh_multi_table_superset_and_lift(emb):
    # The OR construction's candidate set contains every single-table
    # candidate, so multi top-k recall dominates pointwise; and a row
    # matching in BOTH tables must appear once (dedup before ranking).
    single = {r.vec_id for r in SIM.lsh_topk(emb, query_vec_id=0, k=5).collect()}
    multi_rows = SIM.lsh_topk_multi(
        emb, query_vec_id=0, k=5, num_planes=4, num_tables=2
    ).collect()
    multi = [r.vec_id for r in multi_rows]
    assert len(multi) == len(set(multi))      # deduped
    assert single <= set(multi) or len(multi) == 5  # superset unless truncated
    lift = SIM.ann_recall_lift(
        emb, query_ids=[0, 2], k=3, num_planes=4, num_tables=2
    ).collect()
    assert all(r.lift >= 0 for r in lift)
    assert all(r.recall_multi >= r.recall_single for r in lift)


def test_ivf_assign_and_topk(emb):
    # centroids = ids < 2 (i.e. vectors 0 and 1, nearly identical):
    # everything with positive x lands in one of their cells
    cents = emb.filter(F.col("vec_id") < 2)
    assigned = {r.vec_id: r.centroid_id for r in SIM.ivf_assign(emb, cents).collect()}
    assert assigned[0] == 0 and assigned[3] in (0, 1)
    out = SIM.ivf_topk(emb, query_vec_id=0, k=3, n_centroids=2, nprobe=2).collect()
    assert out[0].vec_id == 1  # nearest neighbor found through its cell
    # nprobe = all cells -> IVF degrades to exact brute force
    brute = [r.vec_id for r in SIM.brute_force_topk(emb, 0, k=4).collect()]
    ivf_all = [
        r.vec_id
        for r in SIM.ivf_topk(emb, 0, k=4, n_centroids=2, nprobe=2).collect()
    ]
    assert ivf_all == brute


def test_embedding_near_dup_pairs(emb):
    pairs = {(r.id_a, r.id_b) for r in SIM.embedding_near_dup_pairs(emb, 0.95).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_text_stats_values(spark):
    df = spark.createDataFrame([(1, "the cat sat")], ["doc_id", "text"])
    r = TX.text_stats(df).collect()[0]
    assert r.n_tokens == 3
    assert r.n_chars_computed == 11
    assert r.mean_word_len == 3.0
    assert r.stopword_ratio == round(1 / 3, 4)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog"), (2, "el gato y la casa de que"), (3, "zzz qqq")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r.pred_lang for r in TX.lang_id(df).collect()}
    assert out == {1: "en", 2: "es", 3: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  World!"), (2, "hello world"), (3, "other")], ["doc_id", "text"]
    )
    fp = {r.doc_id: r.fp for r in df.select("doc_id", TX.fingerprint("text").alias("fp")).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_fake_decoder(spark):
    df = spark.createDataFrame([(1, "abc"), (2, "Z")], ["doc_id", "text"])
    media = MM.as_media(df, "doc_id", "text")
    out = {r.media_id: r for r in MM.extract_features(media).collect()}
    assert out[1].n_bytes == 3
    assert out[1].digest == hashlib.md5(b"abc").hexdigest()
    assert out[1].head_byte == ord("a") and out[1].tail_byte == ord("c")
    assert out[2].head_byte == out[2].tail_byte == ord("Z")


def _png_bytes(w, h, depth=8):
    import struct as _s
    return (b"\x89PNG\r\n\x1a\n" + _s.pack(">I", 13) + b"IHDR"
            + _s.pack(">II", w, h) + bytes([depth, 6, 0, 0, 0])
            + b"\x00" * 4)


def _jpeg_bytes(w, h):
    import struct as _s
    app0 = (b"\xff\xe0" + _s.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + _s.pack(">HH", 1, 1) + bytes([0, 0]))
    # a DQT segment BEFORE the frame header: the scanner must skip
    # non-SOF segments by their declared length
    dqt = b"\xff\xdb" + _s.pack(">H", 67) + bytes(65)
    sof0 = (b"\xff\xc0" + _s.pack(">H", 17) + bytes([8])
            + _s.pack(">HH", h, w) + bytes([3])
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    return b"\xff\xd8" + app0 + dqt + sof0


def _gif_bytes(w, h):
    import struct as _s
    return b"GIF89a" + _s.pack("<HH", w, h) + bytes(3)


def _wav_bytes(sr, ch, bits=16, junk_first=True):
    import struct as _s
    fmt = b"fmt " + _s.pack("<I", 16) + _s.pack(
        "<HHIIHH", 1, ch, sr, sr * ch * (bits // 8), ch * (bits // 8), bits
    )
    # an odd-length unknown chunk first: the walk must skip it
    # word-aligned to land on "fmt "
    junk = (b"JUNK" + _s.pack("<I", 3) + b"xyz" + b"\x00") if junk_first else b""
    body = junk + fmt
    return b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_media_header_parser_crafted_vectors():
    # real container headers, parsed by the pure-stdlib kernel
    p = MM.parse_media_header(_png_bytes(640, 480))
    assert (p["format"], p["width"], p["height"], p["bit_depth"]) == (
        "png", 640, 480, 8)
    j = MM.parse_media_header(_jpeg_bytes(300, 200))
    assert (j["format"], j["width"], j["height"], j["channels"]) == (
        "jpeg", 300, 200, 3)
    g = MM.parse_media_header(_gif_bytes(12, 34))
    assert (g["format"], g["width"], g["height"]) == ("gif", 12, 34)
    w = MM.parse_media_header(_wav_bytes(44100, 2))
    assert (w["format"], w["sample_rate_hz"], w["channels"],
            w["bit_depth"]) == ("wav", 44100, 2, 16)
    # the wav walk also works with fmt first (no junk chunk)
    w2 = MM.parse_media_header(_wav_bytes(8000, 1, junk_first=False))
    assert (w2["format"], w2["sample_rate_hz"], w2["channels"]) == (
        "wav", 8000, 1)


def test_media_header_parser_jpeg_fill_bytes_and_eoi():
    import struct as _s

    # spec-legal 0xFF fill padding before the SOF marker must be skipped
    sof0 = (b"\xff\xc0" + _s.pack(">H", 17) + bytes([8])
            + _s.pack(">HH", 20, 10) + bytes([3])
            + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    padded = b"\xff\xd8" + b"\xff\xff" + sof0  # two fill bytes
    out = MM.parse_media_header(padded)
    assert (out["format"], out["width"], out["height"]) == ("jpeg", 10, 20)
    # EOI before any SOF ends the scan cleanly (no length read past it)
    eoi_first = b"\xff\xd8\xff\xd9" + sof0
    assert MM.parse_media_header(eoi_first)["format"] == "unknown"


def test_media_header_parser_wav_short_fmt_chunk():
    import struct as _s

    # old-style WAVEFORMAT: fmt chunk_len 14, no wBitsPerSample —
    # bit depth must NOT be read from the following chunk's id bytes
    fmt14 = b"fmt " + _s.pack("<I", 14) + _s.pack("<HHIIH", 1, 2, 44100,
                                                  44100 * 2 * 2, 4)
    body = fmt14 + b"data" + _s.pack("<I", 0)
    wav = b"RIFF" + _s.pack("<I", 4 + len(body)) + b"WAVE" + body
    out = MM.parse_media_header(wav)
    assert out["format"] == "unknown" and out["bit_depth"] == 0


def test_media_header_parser_fallbacks():
    # truncated / alien payloads degrade to 'unknown', never raise
    assert MM.parse_media_header(None)["format"] == "unknown"
    assert MM.parse_media_header(b"")["format"] == "unknown"
    assert MM.parse_media_header(b"plain text")["format"] == "unknown"
    assert MM.parse_media_header(_png_bytes(9, 9)[:20])["format"] == "unknown"
    assert MM.parse_media_header(_jpeg_bytes(9, 9)[:10])["format"] == "unknown"
    # a JPEG whose scan never reaches a SOF marker
    assert MM.parse_media_header(b"\xff\xd8\xff\xe0\x00\x04ab")["format"] == "unknown"
    # RIFF/WAVE with no fmt chunk at all
    import struct as _s
    nofmt = b"RIFF" + _s.pack("<I", 12) + b"WAVE" + b"data" + _s.pack("<I", 0)
    out = MM.parse_media_header(nofmt)
    assert out["sample_rate_hz"] == 0 and out["format"] == "unknown"
    # n_bytes is always the real payload length
    assert MM.parse_media_header(b"plain text")["n_bytes"] == 10


def test_multimodal_headers_decoder_spark(spark):
    rows = [
        (1, bytearray(_png_bytes(640, 480))),
        (2, bytearray(_jpeg_bytes(300, 200))),
        (3, bytearray(_gif_bytes(12, 34))),
        (4, bytearray(_wav_bytes(44100, 2))),
        (5, bytearray(b"not media")),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    media = MM.as_media(df, "doc_id", "blob", kind="mixed")
    out = {r.media_id: r for r in
           MM.extract_features(media, decoder="headers").collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 640, 480)
    assert (out[2].format, out[2].width, out[2].height) == ("jpeg", 300, 200)
    assert (out[3].format, out[3].width, out[3].height) == ("gif", 12, 34)
    assert (out[4].format, out[4].sample_rate_hz, out[4].channels,
            out[4].bit_depth) == ("wav", 44100, 2, 16)
    assert out[5].format == "unknown" and out[5].n_bytes == 9
    assert out[6].format == "unknown" and out[6].n_bytes == 0


def test_multimodal_real_decoders_stubbed(spark):
    df = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = MM.as_media(df, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        MM.extract_features(media, decoder="pil")
    with pytest.raises(NotImplementedError):
        MM.resize_images(media, 224, 224, decoder="pil")
    with pytest.raises(NotImplementedError):
        MM.sample_frames(media, 10, decoder="ffmpeg")


def test_multimodal_resize_fake_kernel(spark):
    df = spark.createDataFrame([(1, "abcdefgh"), (2, ""), (3, None)], ["doc_id", "text"])
    media = MM.as_media(df, "doc_id", "text", kind="image")
    out = {r.media_id: r for r in MM.resize_images(media, 2, 2).collect()}
    # 8 bytes -> 4 via nearest-neighbor stride: indices 0,2,4,6
    assert bytes(out[1].payload) == b"aceg"
    assert out[1].meta.n_bytes == 4 and out[1].kind == "image"
    assert bytes(out[2].payload) == b"\x00" * 4  # empty input zero-fills
    assert out[3].payload is None and out[3].meta.n_bytes is None
    # output is MEDIA-shaped: resizes compose with feature extraction
    feats = {r.media_id: r for r in MM.extract_features(MM.resize_images(media, 2, 2)).collect()}
    assert feats[1].n_bytes == 4 and feats[1].head_byte == ord("a")


def test_multimodal_frame_sampling(spark):
    payload = bytes(range(64))  # 16 frames of 4 bytes
    df = spark.createDataFrame([(7, bytearray(payload)), (8, None)], ["doc_id", "blob"])
    media = MM.as_media(df, "doc_id", "blob", kind="video")
    rows = MM.sample_frames(media, every_n=5, frame_bytes=4).collect()
    got = {r.frame_idx: bytes(r.frame) for r in rows}
    assert all(r.media_id == 7 for r in rows)  # null payload emits nothing
    assert sorted(got) == [0, 5, 10, 15]
    assert got[5] == bytes(range(20, 24))
    assert got[15] == bytes(range(60, 64))


def test_winnow_guarantee_and_compression(spark):
    # Winnowing guarantee: two docs sharing a run of >= window + k - 1
    # consecutive words (here 4 + 3 - 1 = 6) must share a fingerprint,
    # regardless of surrounding text.
    shared = "lorem ipsum dolor sit amet consectetur"
    rows = [
        (1, f"prefix one two {shared} suffix alpha beta"),
        (2, f"{shared} entirely different ending material here"),
        (3, "no overlap with anything else at all whatsoever today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = TX.winnow_fingerprints(df)
    by_doc = {
        i: {r.fp for r in fps.filter(F.col("doc_id") == i).collect()}
        for i in (1, 2, 3)
    }
    assert by_doc[1] & by_doc[2]          # guaranteed shared fingerprint
    assert not (by_doc[1] & by_doc[3])    # disjoint text, disjoint prints
    # compression: fewer fingerprints than shingles
    n_shingles = len(rows[0][1].split()) - 2
    assert 0 < len(by_doc[1]) < n_shingles


def test_connected_components_chain_triangle_singleton(spark):
    # chain 1-2-3 (non-transitive similarity must still collapse),
    # triangle 10-11-12, pair 20-21; 99 appears in no edge.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (10, 12), (20, 21)],
        ["doc_a", "doc_b"],
    )
    comp = {
        r.node: r.component
        for r in D.connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_near_dup_clusters_keeps_one_per_cluster(spark, docs):
    # band_rows=1 -> 12 one-row bands: candidate recall for the 0.75-
    # jaccard 1~3 pair is 1-(1-0.75)^12 (≈certain), keeping the test
    # deterministic-by-construction rather than by band luck.
    out = D.near_dup_clusters(docs, threshold=0.5, band_rows=1).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 5
    # 1,2 exact dups and 3 near-dup of 1 -> one cluster rooted at 1
    assert by_id[1].component == 1 and by_id[1].is_kept
    assert by_id[2].component == 1 and not by_id[2].is_kept
    assert by_id[3].component == 1 and not by_id[3].is_kept
    assert by_id[1].n_members == 3
    # 4 and 5 are singletons and kept
    assert by_id[4].is_kept and by_id[4].n_members == 1
    assert by_id[5].is_kept and by_id[5].n_members == 1


def test_char_ngram_entropy_known_values(spark):
    import math

    rows = [(1, "aaaaa"), (2, "ababab"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in TX.char_ngram_entropy(df, n=2).collect()}
    # "aaaaa" -> 4x "aa": entropy 0
    assert out[1].n_grams == 4 and out[1].entropy == 0.0
    # "ababab" -> ab,ba,ab,ba,ab: H = log2(5) - (3*log2 3 + 2*log2 2)/5
    expected = round(math.log2(5) - (3 * math.log2(3) + 2 * math.log2(2)) / 5, 4)
    assert out[2].n_grams == 5 and out[2].entropy == expected
    # empty text -> single empty gram, entropy 0 (degenerate, not null)
    assert out[3].n_grams == 1 and out[3].entropy == 0.0


# --- product quantization / ADC ---------------------------------------------


def _np_pq(X, codebooks):
    import numpy as np

    m, dsub = len(codebooks), len(codebooks[0][0])
    codes = np.zeros((len(X), m), dtype=int)
    for j, cb in enumerate(codebooks):
        sub = X[:, j * dsub : (j + 1) * dsub]
        d = ((sub[:, None, :] - np.asarray(cb)[None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d.argmin(axis=1)
    return codes


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    X = rng.uniform(-0.4, 0.4, (60, 16))
    cbs = SIM.pq_codebooks(16, m=4, k=8, seed=5)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(60)], "vec_id long, embedding array<double>"
    )
    got = {r.vec_id: [r.code_0, r.code_1, r.code_2, r.code_3]
           for r in SIM.pq_encode(df, cbs).collect()}
    want = _np_pq(X, cbs)
    for i in range(60):
        assert got[i] == want[i].tolist()


def test_pq_adc_topk_matches_numpy_and_orders(spark):
    import numpy as np

    rng = np.random.RandomState(9)
    X = rng.uniform(-0.4, 0.4, (80, 16))
    cbs = SIM.pq_codebooks(16, m=4, k=8, seed=5)
    q = [round(float(v), 6) for v in rng.uniform(-0.4, 0.4, 16)]
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(80)], "vec_id long, embedding array<double>"
    )
    rows = SIM.pq_adc_topk(df, q, cbs, k=80).collect()
    codes = _np_pq(X, cbs)
    luts = np.asarray(SIM.pq_adc_lut(q, cbs))
    want = {i: round(float(sum(luts[j][codes[i, j]] for j in range(4))), 6)
            for i in range(80)}
    got = {r.vec_id: r.adc_dist for r in rows}
    assert got == pytest.approx(want)
    dists = [r.adc_dist for r in rows]
    assert dists == sorted(dists)


def test_pq_adc_plan_is_scan_plus_topk(spark):
    import contextlib
    import io

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = SIM.pq_adc_topk(emb, [0.01] * 64, SIM.pq_codebooks(64), k=5)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # encode+score are map-side only


# --- block-level (paragraph-analog) dedup -----------------------------------


def test_block_dedup_removes_repeated_blocks(spark):
    boiler = " ".join(f"b{i}" for i in range(4))
    uniq1 = " ".join(f"u{i}" for i in range(4))
    uniq2 = " ".join(f"v{i}" for i in range(4))
    rows = [
        (1, f"{boiler} {uniq1}"),     # first occurrence of boiler: kept
        (2, f"{boiler} {uniq2}"),     # boiler block dropped, uniq kept
        (3, boiler),                  # entirely boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in D.block_dedup(df, block_words=4).collect()}
    assert out[1].text == f"{boiler} {uniq1}" and out[1].keep_ratio_e4 == 10000
    assert out[2].text == uniq2 and out[2].n_blocks == 2 and out[2].n_kept == 1
    assert out[3].text == "" and out[3].keep_ratio_e4 == 0


def test_block_dedup_min_keep_ratio_drops_shells(spark):
    boiler = "a b c d"
    rows = [(1, boiler), (2, boiler), (3, "x y z w")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r.doc_id for r in D.block_dedup(df, block_words=4, min_keep_ratio=0.5).collect()}
    assert kept == {1, 3}  # doc 2 is a fully-deduped shell


def test_block_dedup_partial_and_short_docs(spark):
    # 5 words at block=4 -> blocks of 4 and 1; 0-word doc -> one empty block
    rows = [(1, "p q r s t"), (2, "   ")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in D.block_dedup(df, block_words=4).collect()}
    assert out[1].n_blocks == 2 and out[1].text == "p q r s t"
    assert out[2].n_blocks == 1


def test_pq_adc_separates_distant_clusters(spark):
    """Two tight clusters far apart: every ADC top-k candidate for a
    query must come from the query's own cluster — the coarse guarantee
    quantization must keep even when within-cluster ranking collapses
    to code ties (random codebooks can't order vectors sharing a code,
    which is why recall@k against the exact ranking is the metric
    pq_recall reports rather than something a test should pin)."""
    import numpy as np

    rng = np.random.RandomState(4)
    a = rng.uniform(0.2, 0.3, (20, 16))
    b = rng.uniform(-0.3, -0.2, (20, 16))
    X = np.vstack([a, b])
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(40)], "vec_id long, embedding array<double>"
    )
    cbs = SIM.pq_codebooks(16, m=4, k=8, seed=5)
    top_a = SIM.pq_adc_topk(df.filter("vec_id <> 0"), X[0].tolist(), cbs, k=5)
    assert {r.vec_id for r in top_a.collect()} <= set(range(1, 20))
    top_b = SIM.pq_adc_topk(df.filter("vec_id <> 20"), X[20].tolist(), cbs, k=5)
    assert {r.vec_id for r in top_b.collect()} <= set(range(21, 40))
    # and the recall surface runs end-to-end on the same frame
    out = {r.qid: r.recall_at_k for r in SIM.pq_recall(df, [0, 20], cbs, k=5).collect()}
    assert set(out) == {0, 20}
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_pq_recall_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    X = rng.uniform(-0.4, 0.4, (50, 16))
    cbs = SIM.pq_codebooks(16, m=4, k=8, seed=5)
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(50)], "vec_id long, embedding array<double>"
    )
    k = 7
    got = {r.qid: r.n_hit for r in SIM.pq_recall(df, [3], cbs, k=k).collect()}

    codes = _np_pq(X, cbs)
    centers = np.asarray([[np.asarray(cbs[j][codes[i, j]]) for j in range(4)]
                          for i in range(50)]).reshape(50, 16)
    q = X[3]
    others = [i for i in range(50) if i != 3]
    true_rank = sorted(others, key=lambda i: (round(((X[i] - q) ** 2).sum(), 6), i))[:k]
    adc_rank = sorted(others, key=lambda i: (round(((centers[i] - q) ** 2).sum(), 6), i))[:k]
    assert got[3] == len(set(true_rank) & set(adc_rank))


def test_incremental_near_dup_finds_base_near_dups_only(spark):
    base_txt = "alpha beta gamma delta epsilon zeta eta theta"
    rows_base = [(1, base_txt), (2, "one two three four five six seven")]
    rows_new = [
        (10, base_txt + " iota"),                # near-dup of base doc 1
        (11, "totally different words here now"),  # clean
    ]
    base = spark.createDataFrame(rows_base, ["doc_id", "text"])
    new = spark.createDataFrame(rows_new, ["doc_id", "text"])
    out = [(r.new_id, r.base_id) for r in
           D.incremental_near_dup(new, base, threshold=0.5).collect()]
    assert out == [(10, 1)]


def test_incremental_near_dup_base_bucket_cap(spark):
    # a boilerplate block flooding base buckets is skipped, not paired
    boiler = "same words repeated in every base document here"
    base = spark.createDataFrame(
        [(i, boiler) for i in range(12)], ["doc_id", "text"]
    )
    new = spark.createDataFrame([(100, boiler)], ["doc_id", "text"])
    out = D.incremental_near_dup(new, base, threshold=0.1, max_bucket=5).collect()
    assert out == []  # every base bucket exceeds the cap


def test_mmr_diversifies_against_near_duplicate_results(spark):
    rows = [
        (1, [1.0, 0.0]),     # most relevant
        (2, [1.0, 0.01]),    # near-duplicate of 1
        (3, [0.0, 1.0]),     # orthogonal (diverse)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # diversity-heavy lambda: the near-dup is pushed below the diverse doc
    out = SIM.mmr_topk(df, [1.0, 0.0], k=3, lam=0.3, pool=10).collect()
    assert [r.vec_id for r in out] == [1, 3, 2]
    assert [r.step for r in out] == [1, 2, 3]
    # relevance-heavy lambda keeps pure relevance order
    out2 = SIM.mmr_topk(df, [1.0, 0.0], k=3, lam=1.0, pool=10).collect()
    assert [r.vec_id for r in out2] == [1, 2, 3]


def test_contrastive_triplets_semantics(spark):
    """Positive = most-similar same-bucket neighbor >= threshold,
    negative = most-similar below; anchors lacking either are absent."""
    # 2-d vectors: a,b nearly parallel (cos~1), c orthogonal-ish to
    # both but in the same LSH bucket region, d opposite.
    rows = [
        (0, [1.0, 0.05]),
        (1, [1.0, 0.0]),
        (2, [1.0, 4.0]),
        (3, [-1.0, -0.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.anchor_id: r
        for r in SIM.contrastive_triplets(
            emb, pos_threshold=0.9, num_planes=2
        ).collect()
    }
    for r in out.values():
        assert r.pos_cos >= 0.9 > r.neg_cos
        assert r.pos_id != r.neg_id
    if 0 in out:  # 0's positive must be 1 (cos≈0.999), not 2 or 3
        assert out[0].pos_id == 1


def test_cross_source_overlap_counts(spark):
    rows = [
        (1, "shared text here", "a"),
        (2, "shared text here", "b"),
        (3, "shared text here", "c"),
        (4, "only in a", "a"),
        (5, "another b doc", "b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    from streaming_demos_spark.operators import dedup as D

    out = {
        (r.source_a, r.source_b): (r.n_shared, r.overlap_rate_e6)
        for r in D.cross_source_overlap(docs, "source").collect()
    }
    # one shared content across each pair; rates vs the smaller side
    assert out[("a", "b")] == (1, 500000)
    assert out[("a", "c")] == (1, 1000000)
    assert out[("b", "c")] == (1, 1000000)
    # block mode on disjoint texts finds nothing
    blk = D.cross_source_overlap(
        spark.createDataFrame(
            [(1, "aa bb", "x"), (2, "cc dd", "y")], ["doc_id", "text", "source"]
        ),
        "source",
        block_words=2,
    )
    assert blk.count() == 0


def test_neardup_embedding_cap_keeps_stride_members(spark):
    """With a binding cap, surviving pairs are a subset of the uncapped
    pairs and every bucket still contributes ~max_bucket candidates."""
    import random

    rng = random.Random(7)
    rows = [
        (i, [1.0 + rng.uniform(-0.01, 0.01), 2.0 + rng.uniform(-0.01, 0.01)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_near_dup_pairs(
            emb, threshold=0.99, num_planes=2
        ).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in SIM.embedding_near_dup_pairs(
            emb, threshold=0.99, num_planes=2, max_bucket=10
        ).collect()
    }
    assert capped <= full
    assert 0 < len(capped) < len(full)


def test_duplicate_spans_arbitrary_offset(spark):
    from streaming_demos_spark.operators import dedup as D

    # doc 2 repeats doc 1's words 10..24 at OFFSET 3 (block_dedup's
    # aligned 15-blocks would miss this); doc 3 is clean.
    base = [f"w{i}" for i in range(40)]
    shifted = ["x0", "x1", "x2"] + base[10:25] + ["y0", "y1", "y2"]
    rows = [
        (1, " ".join(base)),
        (2, " ".join(shifted)),
        (3, " ".join(f"z{i}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.duplicate_spans(df, k=15).collect()
    assert len(out) == 1
    r = out[0]
    # the repeated window starts at token 3 of doc 2 and spans 15 tokens
    assert (r.doc_id, r.span_start, r.span_end, r.n_windows) == (2, 3, 17, 1)


def test_duplicate_spans_merges_overlapping_windows(spark):
    from streaming_demos_spark.operators import dedup as D

    base = [f"w{i}" for i in range(40)]
    # doc 2 repeats a 20-token run -> 6 overlapping dup windows (k=15)
    rows = [
        (1, " ".join(base)),
        (2, " ".join(["a"] + base[5:25] + ["b"])),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = D.duplicate_spans(df, k=15).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.span_start, r.span_end, r.n_windows) == (2, 1, 20, 6)


def test_duplicate_spans_short_docs_skipped(spark):
    from streaming_demos_spark.operators import dedup as D

    df = spark.createDataFrame(
        [(1, "too short to window"), (2, "too short to window")],
        ["doc_id", "text"],
    )
    assert D.duplicate_spans(df, k=15).count() == 0


def test_hybrid_rerank_fuses_both_rankings(spark):
    from streaming_demos_spark.functions import tfidf as TI

    # doc 1 is lexically near-identical to the query (high jaccard +
    # high cosine); doc 2 shares rare terms (cosine only, no common
    # 3-shingle); doc 3 is unrelated.
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta zeta"),
            (2, "epsilon delta unrelatedword1 unrelatedword2 alpha"),
            (3, "totally different words here now"),
        ],
        "doc_id int, text string",
    )
    out = TI.hybrid_rerank(docs, query_id=0, k_candidates=5, k=3).collect()
    ids = [r.doc_id for r in out]
    assert ids[0] == 1  # top of both lists -> highest RRF
    assert 3 not in ids or out[-1].doc_id == 3
    top = out[0]
    assert top.jaccard_e4 > 0 and top.cosine > 0
    # every emitted rrf score positive and non-increasing
    scores = [r.rrf_e6 for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_minhash_lsh_eval_perfect_recall_on_identical_docs(spark):
    from streaming_demos_spark.operators import dedup as D

    # identical docs minhash-collide in every band -> recall 1.0
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five six"),
            (3, "seven eight nine ten eleven twelve"),
        ],
        "doc_id int, text string",
    )
    row = D.minhash_lsh_eval(docs, threshold=0.9).collect()[0]
    assert row.n_truth == 1 and row.n_hits == 1
    assert row.recall_e6 == 1000000


def test_minhash_lsh_eval_no_truth_yields_null_recall(spark):
    from streaming_demos_spark.operators import dedup as D

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd"), (2, "ee ff gg hh")],
        "doc_id int, text string",
    )
    row = D.minhash_lsh_eval(docs, threshold=0.9).collect()[0]
    assert row.n_truth == 0 and row.recall_e6 is None


def test_lsh_tuning_s_curve_properties(spark):
    from streaming_demos_spark.operators import dedup as D

    # two exact-dup pairs (J=1) and structure with moderate overlap
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),
            (2, "one two three four five six"),
            (3, "one two three four seven eight"),
            (4, "nine ten eleven twelve thirteen fourteen"),
        ],
        "doc_id int, text string",
    )
    out = {(r.bands, r.rows): r for r in
           D.lsh_tuning(docs, configs=((12, 1), (1, 12)),
                        pair_threshold=0.05, target=0.9).collect()}
    # b=12,r=1 is the most permissive config; b=1,r=12 the strictest:
    # recall and candidate rate must both order accordingly
    assert (out[(12, 1)].expected_recall
            >= out[(1, 12)].expected_recall)
    assert (out[(12, 1)].expected_candidate_rate
            >= out[(1, 12)].expected_candidate_rate)
    # a J=1 pair is always captured -> recall at target<=1 is 1.0
    assert out[(12, 1)].expected_recall == 1.0
    assert out[(1, 12)].expected_recall == 1.0


def test_distinctive_terms_finds_group_marker(spark):
    from streaming_demos_spark.operators import text as TX

    # "zebra" appears only in group A; "common" is everywhere
    rows = []
    for i in range(10):
        rows.append(("A", f"common words zebra here {i % 3}"))
        rows.append(("B", f"common words other here {i % 3}"))
    docs = spark.createDataFrame(rows, "source string, text string")
    out = TX.distinctive_terms(docs, "source", min_count=5, top_n=3)
    by = {}
    for r in out.collect():
        by.setdefault(r.source, []).append(r.term)
    assert by["A"][0] == "zebra"
    assert by["B"][0] == "other"
    # the shared vocabulary never tops either list
    assert "common" not in (by["A"][0], by["B"][0])


def test_kneser_ney_bigram_hand_case(spark):
    from streaming_demos_spark.operators.text import kneser_ney_bigram

    # corpus: "a b a b a c" -> bigrams: ab, ba, ab, ba, ac
    # c(ab)=2, c(ba)=2, c(ac)=1; c(a.)=3, c(b.)=2
    # distinct bigrams D=3; N1+(a.)=2, N1+(b.)=1
    # N1+(.b)=1 (only 'a b'), N1+(.a)=1, N1+(.c)=1
    docs = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    out = {r.bigram: r for r in kneser_ney_bigram(docs).collect()}
    ab = out["a b"]
    assert (ab.c_ab, ab.c_a) == (2, 3)
    # disc: (4*2-3)*1e9 // (4*3) = 5e9//12 = 416666666
    # backoff: 3*2*1 *1e9 // (4*3*3) = 6e9//36 = 166666666
    assert ab.p_kn_e9 == 416666666 + 166666666
    ac = out["a c"]
    # disc: (4-3)*1e9 // 12 = 83333333; backoff same as ab (N1+(.c)=1)
    assert ac.p_kn_e9 == 83333333 + 166666666


def test_heavy_changes_hand_case(spark):
    from streaming_demos_spark.operators.text import heavy_changes

    # even docs (first): "x" * 6; odd docs (second): "y" * 6
    docs = spark.createDataFrame(
        [(0, "x x x x x x"), (1, "y y y y y y")],
        "doc_id long, text string",
    )
    out = {r.term: r for r in heavy_changes(docs, min_count=5).collect()}
    assert set(out) == {"x", "y"}
    x = out["x"]
    # c1=6, c2=0, T1=T2=6 -> |delta| = 1.0 -> 1e9, direction +1
    assert (x.c_first, x.c_second, x.direction, x.abs_delta_e9) == (
        6, 0, 1, 1000000000,
    )
    y = out["y"]
    assert (y.c_first, y.c_second, y.direction, y.abs_delta_e9) == (
        0, 6, -1, 1000000000,
    )


def test_cluster_size_distribution_counts(spark):
    from streaming_demos_spark.operators.dedup import (
        cluster_size_distribution,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),  # dup of 1
            (3, "one two three four five six seven"),
        ],
        "doc_id long, text string",
    )
    out = {r.cluster_size: r for r in
           cluster_size_distribution(docs, threshold=0.5).collect()}
    assert out[1].n_clusters == 1 and out[1].n_removed_by_keep_one == 0
    assert out[2].n_clusters == 1 and out[2].n_docs == 2
    assert out[2].n_removed_by_keep_one == 1


def test_exact_media_dedup_summary(spark):
    from pyspark.sql import functions as F

    from streaming_demos_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(1, "same bytes"), (2, "same bytes"), (3, "unique payload")],
        "doc_id long, text string",
    )
    media = MM.as_media(docs, "doc_id", "text")
    r = MM.exact_media_dedup_summary(media).collect()[0]
    assert (r.n_media, r.n_distinct_payloads, r.n_exact_dupes) == (3, 2, 1)
    assert r.bytes_total == 2 * len("same bytes") + len("unique payload")
    assert r.bytes_dedupable == len("same bytes")
