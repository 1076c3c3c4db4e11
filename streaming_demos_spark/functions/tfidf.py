"""TF-IDF + truncated SVD text features (SURVEY.md §2.10).

Reference parity: product-recommender/recsys-engine/src/preprocessor.py:94-97
embeds product names with TF-IDF followed by a 10-component SVD
(textwiser TfIdf -> NMF/SVD pipeline). Restated Spark-first:

- TF-IDF is pure DataFrame algebra: explode tokens, count term
  frequencies, count document frequencies, join. Both aggregations are
  map-side-combinable shuffles on (doc, term) / term — linear scale-out,
  no UDFs, oracle-checkable in SQL.
- The smooth-idf convention matches sklearn's TfidfVectorizer
  (idf = ln((1+N)/(1+df)) + 1), so numbers line up with the
  reference's sklearn-backed pipeline.
- Truncated SVD at 100 TB cannot shuffle the document matrix into one
  place. The scalable restatement: hash terms onto a fixed
  D-dimensional space (hashing trick), accumulate the D×D gram matrix
  G = XᵀX with per-partition numpy outer products (mapInPandas ->
  partial sums -> one driver-side reduce of D×D blocks — the only
  driver materialization, independent of row count), eigendecompose G
  on the driver (D ~ 2^8..2^12, trivially small), then project
  row-wise map-only. Sign convention: each component's
  largest-magnitude coordinate is made positive, so results are
  deterministic across partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_PATTERN = "[^a-z0-9]+"


def tokenize(df: DataFrame, text_col: str, out_col: str = "tokens") -> DataFrame:
    """Lowercase + split on non-alphanumerics, drop empty tokens — the
    TfidfVectorizer default analyzer restated as JVM expressions."""
    toks = F.split(F.lower(F.col(text_col)), TOKEN_PATTERN)
    return df.withColumn(out_col, F.filter(toks, lambda t: t != ""))


def tfidf(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF: one row per (doc, term) with tf, df and
    tf * smooth-idf. ``min_df`` prunes rare terms (vocabulary control —
    at corpus scale the long tail of hapaxes dominates the term count).

    Plan: explode -> groupBy(doc, term).count [shuffle 1, partial aggs]
    -> groupBy(term) doc-freq [shuffle 2, much smaller] -> broadcast-ish
    join back. N (total docs) rides in as a broadcast scalar aggregate,
    never a driver collect. ``fan_out`` un-serializes the
    tokenize+explode map work when the scan is row-group-bound to one
    task (no-op at real scale, where the scan has thousands of splits).
    """
    from streaming_demos_spark.catalog import fan_out

    toks = tokenize(
        fan_out(df.select(id_col, text_col), id_col), text_col
    ).select(id_col, F.explode("tokens").alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = df.agg(F.countDistinct(id_col).alias("_n"))
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (F.log((F.lit(1.0) + F.col("_n")) / (F.lit(1.0) + F.col("df"))) + 1.0),
        )
        .drop("_n")
        .select(id_col, "term", "tf", "df", F.round("tfidf", 9).alias("tfidf"))
    )


def hashed_tfidf_vectors(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 256,
    min_df: int = 1,
) -> DataFrame:
    """Dense fixed-width TF-IDF vectors via the hashing trick:
    term -> pmod(xxhash64(term), dim). Collisions add — the standard
    trade for a bounded, vocabulary-free feature space (what makes SVD
    tractable at any corpus size). Returns (id, vec array<double>).

    idf is computed at the SLOT level (document frequency of the hashed
    feature, sklearn HashingVectorizer->TfidfTransformer semantics),
    which is what makes the plan scale-proof: the df table is exactly
    ``dim`` rows — a broadcast — so no term-keyed shuffle join of the
    full sparse matrix ever happens, and the only corpus-sized shuffle
    is the (doc, slot) tf aggregation (map-side combinable, key fan-out
    bounded by ``dim`` per doc). With no collisions (dim >> vocabulary)
    slot-df equals term-df and the result is identical to the sparse
    ``tfidf`` weights."""
    from streaming_demos_spark.catalog import fan_out

    toks = (
        tokenize(fan_out(df.select(id_col, text_col), id_col), text_col)
        .select(id_col, F.explode("tokens").alias("term"))
        .select(
            id_col,
            F.pmod(F.xxhash64("term"), F.lit(dim)).cast("int").alias("slot"),
        )
    )
    tf = toks.groupBy(id_col, "slot").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("slot").agg(F.count("*").alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = df.agg(F.countDistinct(id_col).alias("_n"))
    slot_sum = (
        tf.join(F.broadcast(dfreq), "slot")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "slot",
            (
                F.col("tf")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("_n")) / (F.lit(1.0) + F.col("df"))
                    )
                    + 1.0
                )
            ).alias("w"),
        )
    )
    # densify: slot->weight map per doc, then ONE dim-width array build
    # (O(terms + dim) per doc; a per-slot scatter would be O(terms*dim))
    as_map = slot_sum.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "w"))).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    return as_map.select(
        id_col,
        F.transform(
            idx, lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0))
        ).alias("vec"),
    )


def gram_matrix(vectors: DataFrame, vec_col: str = "vec") -> np.ndarray:
    """G = XᵀX computed as per-partition numpy partial sums; only D×D
    blocks travel to the driver (via collect of one row per partition),
    never rows. This is the distributed half of truncated SVD."""
    from pyspark.sql import types as T

    def partial(it):
        acc = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            g = X.T @ X
            acc = g if acc is None else acc + g
        if acc is not None:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    schema = T.StructType([T.StructField("g", T.ArrayType(T.DoubleType()))])
    parts = vectors.select(vec_col).mapInPandas(partial, schema).collect()
    if not parts:
        raise ValueError("no vectors")
    flat = np.sum([np.asarray(r.g) for r in parts], axis=0)
    d = int(np.sqrt(flat.size))
    return flat.reshape(d, d)


def svd_components(gram: np.ndarray, k: int) -> np.ndarray:
    """Top-k right singular vectors of X from its gram matrix
    (eigh of XᵀX — D×D, driver-side, trivial).

    Two determinism conventions make the result engine-portable:
    - component grid: V is snapped to a 1e-5 grid. The distributed gram
      differs across task layouts (and from a single-node reference) by
      summation-order ulps (~1e-11 measured); with healthy eigen-gaps
      that perturbs V by ~1e-12 — far inside the grid — so every layout
      and every independent implementation lands on the *identical*
      matrix, and downstream projections agree bit-for-bit.
    - sign: each component's largest-|coordinate| entry is positive
      (argmax tie-break = lowest index), applied after the snap.
    """
    vals, vecs = np.linalg.eigh(gram)
    order = np.argsort(vals)[::-1][:k]
    V = np.round(vecs[:, order], 5)
    for j in range(V.shape[1]):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    return V  # (D, k)


def svd_embed(
    vectors: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Truncated-SVD embedding: project each vector onto the top-k
    components (preprocessor.py:94-97's 10-component SVD). The
    projection is a map-only pandas_udf against a broadcast (D, k)
    matrix — scales with rows, no shuffle.

    The input is consumed twice (gram pass + projection pass), so it is
    persisted MEMORY_AND_DISK — the standard two-pass trade; callers
    owning a longer lifecycle can persist upstream themselves."""
    from pyspark import StorageLevel

    vectors = vectors.persist(StorageLevel.MEMORY_AND_DISK)
    V = svd_components(gram_matrix(vectors, vec_col), k)

    @F.pandas_udf("array<double>")
    def project(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        return pd.Series(list((X @ V).round(9)))

    return vectors.select(id_col, project(vec_col).alias("embedding"))


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword retrieval: the k highest-scoring documents for a
    literal bag of query terms (Robertson/Lucene idf convention,
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))``).

    Spark-first shape — because the query is a SMALL LITERAL term list,
    nothing ever shuffles by term: per-document term frequencies are
    map-side array expressions (``size(filter(tokens, = t))`` per query
    term), document length likewise, so the whole plan is

      pass 1: one corpus scan -> a 1-row global aggregate
              (N, avgdl, df per query term), broadcast back;
      pass 2: one corpus scan -> map-side score -> TakeOrderedAndProject.

    No explode, no (doc, term) shuffle, no inverted index to maintain —
    at 100 TB this is two column-pruned scans and a top-k, the cheapest
    possible retrieval shape when queries arrive one at a time. (For
    high-QPS serving you'd materialize the inverted index once instead;
    that path is ``tfidf_cosine_topk``'s postings join.)

    Scores are rounded to 6 dp and ranked on the ROUNDED value with an
    id tie-break so rankings reproduce across engines/partitionings.
    Documents matching no query term (score 0) are excluded.
    """
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    if not terms:
        raise ValueError("query_terms must be non-empty")

    def _count_of(t: str) -> Column:
        # NB: the lambda must be unary — pyspark treats a second
        # parameter (even a defaulted one) as the element-index arg.
        return F.size(F.filter("tokens", lambda x: x == F.lit(t)))

    base = tokenize(docs.select(id_col, text_col), text_col).select(
        id_col,
        F.size("tokens").alias("_dl"),
        *[_count_of(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    )
    stats = base.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).alias(f"_df_{i}")
            for i in range(len(terms))
        ],
    )
    scored = base.crossJoin(F.broadcast(stats))
    norm = F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("_dl") / F.col("_avgdl")
    )
    score = None
    for i in range(len(terms)):
        tf, df = F.col(f"_tf_{i}"), F.col(f"_df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("_n") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        part = idf * tf * F.lit(k1 + 1.0) / (tf + norm)
        score = part if score is None else score + part
    return (
        scored.select(id_col, F.round(score, 6).alias("bm25"))
        .filter(F.col("bm25") > 0)
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(k)
    )


def tfidf_cosine_topk(
    docs: DataFrame,
    query_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Sparse TF-IDF cosine top-k: for each query document, the k most
    similar other documents, computed entirely through the inverted
    index — dot(a, b) = Σ_term w_a·w_b as a postings join on ``term``,
    never a dense pairwise scan.

    Scale shape: the query side's postings are a tiny slice of the
    sparse matrix and ride a broadcast, so the corpus postings never
    shuffle for the join; the per-(query, doc) partial products then
    aggregate with map-side combine. On a realistic Zipfian vocabulary
    set ``max_df_ratio`` (e.g. 0.5): terms present in more than that
    fraction of documents carry near-zero idf but dominate posting-list
    length — dropping them before the join removes the skew hot spot
    for a negligible score change. Norms are computed AFTER pruning so
    cosine stays internally consistent in the pruned space.

    Similarities are rounded to 6 dp and ranked on the ROUNDED value
    with a doc-id tie-break, so rankings are reproducible across
    engines and partitionings.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # The sparse matrix feeds THREE consumers (norms, the query slice,
    # the corpus join side) and Catalyst's ReuseExchange does not fire
    # across their differing projections (verified: 0 ReusedExchange,
    # the tokenize+tf+df subtree planned 3x). Persisting it is the
    # production shape anyway — an inverted index is materialized once
    # at build time, not re-derived per lookup.
    sparse = tfidf(docs, id_col, text_col, min_df=min_df).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if max_df_ratio is not None:
        n_docs = docs.agg(F.count_distinct(F.col(id_col)).alias("_n"))
        sparse = (
            sparse.crossJoin(F.broadcast(n_docs))
            .filter(F.col("df") <= F.col("_n") * F.lit(max_df_ratio))
            .drop("_n")
        )
    norms = sparse.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("tfidf") * F.col("tfidf"))).alias("_norm")
    )
    qside = (
        sparse.filter(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("query_id"),
            F.col("term"),
            F.col("tfidf").alias("_qw"),
        )
    )
    dots = (
        sparse.join(F.broadcast(qside), "term")
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", id_col)
        .agg(F.sum(F.col("tfidf") * F.col("_qw")).alias("_dot"))
    )
    qnorms = norms.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("_norm").alias("_qnorm")
    )
    scored = (
        dots.join(norms, id_col)
        .join(F.broadcast(qnorms), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            F.round(F.col("_dot") / (F.col("_norm") * F.col("_qnorm")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", id_col, "cosine")
    )


def hybrid_rerank(
    docs: DataFrame,
    query_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    k_candidates: int = 20,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid retrieval for a query document: reciprocal-rank fusion of
    two independent rankings — sparse TF-IDF cosine (the inverted-index
    path) and word-3-shingle Jaccard overlap (the lexical/fuzzy-dup
    path). ``rrf = Σ 1/(rrf_k + rank_i)`` over the lists the candidate
    appears in; the standard zero-tuning fusion that beats either
    ranking alone when their error modes differ.

    Plan shape: each side produces at most ``k_candidates`` rows via
    TakeOrderedAndProject (rank windows run on those tiny frames, never
    the corpus); the Jaccard side is fully map-side — the query's
    shingle set rides a 1-row broadcast crossJoin and overlap is
    ``array_intersect`` per document, so no shingle-keyed shuffle
    exists anywhere.

    Determinism: Jaccard (i/u) and the RRF terms (1/(rrf_k+rank)) are
    RATIONAL quotients — a 6-dp rounding of a rational can land ON a
    decimal midpoint where engine builds disagree by the final digit —
    so both are emitted as exact half-up integers (``jaccard_e4``,
    ``rrf_e6``); cosine keeps the rounded-double form (its sqrt-normed
    rounding digit is noise, never a midpoint).
    """
    from pyspark.sql import Window

    from streaming_demos_spark.operators.text import (
        shingles_from_tokens,
        tokens,
    )

    cos = tfidf_cosine_topk(
        docs, [query_id], id_col, text_col, k=k_candidates
    ).select(id_col, "cosine")
    w_cos = Window.orderBy(F.desc("cosine"), F.asc(id_col))
    r1 = cos.withColumn("_r1", F.row_number().over(w_cos))

    # the shingle projection feeds the 1-row query side AND the
    # candidate side — persist so tokenize + shingle run one corpus
    # pass, not two (the _distinct_shingled convention)
    from streaming_demos_spark.catalog import bounded_persist

    sh = bounded_persist(
        docs.select(
            F.col(id_col), tokens(text_col).alias("_w")
        ).select(
            F.col(id_col),
            F.array_distinct(
                shingles_from_tokens("_w", 3)
            ).alias("_sh"),
        )
    )
    qsh = F.broadcast(
        sh.filter(F.col(id_col) == query_id).select(
            F.col("_sh").alias("_qsh")
        )
    )
    lex = (
        sh.filter(F.col(id_col) != query_id)
        .crossJoin(qsh)
        .select(
            F.col(id_col),
            F.size(F.array_intersect("_sh", "_qsh")).alias("_i"),
            (F.size("_sh") + F.size("_qsh")).alias("_ab"),
        )
        .filter(F.col("_i") > 0)
        .select(
            F.col(id_col),
            # BIGINT intermediates: F.size is int32, so a combined
            # distinct-shingle union past ~107k would overflow the
            # e4-scaled numerator in INT (same headroom policy as every
            # other e-scaled quotient in the repo).
            F.expr(
                "(cast(_i as bigint) * 10000 * 2 + (_ab - _i))"
                " div (2 * (cast(_ab as bigint) - _i))"
            ).alias("jaccard_e4"),
        )
        .orderBy(F.desc("jaccard_e4"), F.asc(id_col))
        .limit(k_candidates)
    )
    w_lex = Window.orderBy(F.desc("jaccard_e4"), F.asc(id_col))
    r2 = lex.withColumn("_r2", F.row_number().over(w_lex))

    # component scores coalesce to 0 when the candidate missed that
    # list's top-k — a measured-score floor that keeps the output frame
    # NULL-free (both metrics are nonnegative)
    kk = int(rrf_k)
    fused = r1.join(r2, id_col, "full").select(
        F.col(id_col),
        F.coalesce("cosine", F.lit(0.0)).alias("cosine"),
        F.coalesce("jaccard_e4", F.lit(0)).cast("long").alias("jaccard_e4"),
        (
            F.coalesce(
                F.expr(
                    f"(1000000 * 2 + ({kk} + _r1)) div (2 * ({kk} + _r1))"
                ),
                F.lit(0),
            )
            + F.coalesce(
                F.expr(
                    f"(1000000 * 2 + ({kk} + _r2)) div (2 * ({kk} + _r2))"
                ),
                F.lit(0),
            )
        ).cast("long").alias("rrf_e6"),
    )
    return fused.orderBy(F.desc("rrf_e6"), F.asc(id_col)).limit(k)


def ppmi_word_vectors(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    min_count: int = 5,
    dim: int = 64,
    k: int = 8,
) -> DataFrame:
    """Count-based word embeddings: PPMI-weighted co-occurrence vectors
    (hashing trick over context words, ``dim`` slots) factorized by the
    same distributed-gram truncated SVD as the document embeddings —
    the classic PPMI-SVD construction (Levy & Goldberg 2014) that
    word2vec implicitly approximates.

    Pipeline, all previously-proven pieces: directional co-occurrence
    counts within ``window`` (map-side nested transform), slot-hashed
    PPMI row vectors (one combinable (word, slot) shuffle, the context
    vocabulary never joins densely), then ``svd_embed`` — distributed
    D×D gram, driver ``eigh``, map-only projection. Only words with
    marginal count >= ``min_count`` get vectors (vocabulary control).
    Returns (term, embedding array<double>); callers unnest for
    engine-portable comparison. Non-SQL-expressible (eigh) — verified
    by numpy parity tests, not a DuckDB oracle.
    """
    from streaming_demos_spark.catalog import fan_out
    from streaming_demos_spark.operators.text import tokens

    tk = fan_out(docs.select(F.col(id_col), F.col(text_col)), id_col).select(
        tokens(text_col).alias("tk")
    )
    n = F.size("tk")
    # directional pairs: for position i, contexts at i+1..i+window, BOTH
    # orientations (a word's context vector sees left and right).
    pair = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.flatten(
            F.transform(
                F.slice("tk", i + 1, F.least(F.lit(window), n - i)),
                lambda y: F.array(
                    F.struct(
                        F.element_at("tk", i).alias("w"), y.alias("c")
                    ),
                    F.struct(
                        y.alias("w"), F.element_at("tk", i).alias("c")
                    ),
                ),
            )
        ),
    )
    pairs = tk.select(F.explode(F.flatten(pair)).alias("p")).select(
        "p.w", "p.c"
    )
    # the co-occurrence aggregate feeds THREE consumers (the marginals,
    # the grand total, and the weighted join) and Catalyst shares no
    # subtrees — without a persist the token explode + (w, c) shuffle
    # run once per consumer. |vocab|^2-bounded, the natural cache
    # point of any PPMI build.
    from streaming_demos_spark.catalog import bounded_persist

    bc = bounded_persist(
        pairs.groupBy("w", "c").agg(F.count("*").alias("_n"))
    )
    marg = bc.groupBy("w").agg(F.sum("_n").alias("_m"))
    total = bc.agg(F.sum("_n").cast("double").alias("_t"))
    ppmi = F.greatest(
        F.lit(0.0),
        F.log2(
            (F.col("_n") * F.col("_t"))
            / (F.col("_mw").cast("double") * F.col("_mc"))
        ),
    )
    weighted = (
        bc.join(marg.select(F.col("w"), F.col("_m").alias("_mw")), "w")
        .join(
            marg.select(F.col("w").alias("c"), F.col("_m").alias("_mc")), "c"
        )
        .filter(F.col("_mw") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "w",
            F.pmod(F.xxhash64("c"), F.lit(dim)).cast("int").alias("slot"),
            ppmi.alias("_p"),
        )
        .filter(F.col("_p") > 0)
    )
    slot_sum = weighted.groupBy("w", "slot").agg(F.sum("_p").alias("_v"))
    as_map = slot_sum.groupBy("w").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "_v"))).alias("m")
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    vecs = as_map.select(
        F.col("w").alias("term"),
        F.transform(
            idx, lambda i: F.coalesce(F.element_at("m", i), F.lit(0.0))
        ).alias("vec"),
    )
    return svd_embed(vecs, k=k, id_col="term")
