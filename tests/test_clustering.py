"""Unit tests for distributed k-means, SemDeDup semantic dedup, and
filtered top-k — crafted micro-geometries where the right answer is
obvious by eye; the oracle sweep covers corpus-scale DuckDB parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_demos_spark.operators import clustering as CL
from streaming_demos_spark.operators import dedup as D


@pytest.fixture(scope="module")
def tiny_emb(spark):
    # Two obvious directions: ids 0-2 point along +x, ids 3-5 along +y.
    # Seeds with k=2 are ids 0 (x-ish) and 1 (also x-ish) — deliberately
    # imperfect so the Lloyd round has something to fix.
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.9, 0.1]),
        (2, [1.0, 0.05]),
        (3, [0.0, 1.0]),
        (4, [0.1, 0.9]),
        (5, [0.05, 1.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_kmeans_assign_is_total_and_deterministic(tiny_emb):
    a = CL.kmeans_assign(tiny_emb, k=2).collect()
    assert len(a) == 6  # every vector assigned exactly once
    got = {r.vec_id: r.cluster_id for r in a}
    # seeds are ids 0 ([1,0]) and 1 ([.9,.1]); x-vectors go to their
    # best cosine seed, y-vectors all prefer seed 1 (the more y-ish).
    assert got[0] == 0 and got[3] == 1 and got[4] == 1 and got[5] == 1


def test_lloyd_step_emits_k_times_d_scalar_rows(tiny_emb):
    step = CL.kmeans_step_centroids(tiny_emb, k=2)
    rows = step.collect()
    assert len(rows) == 2 * 2  # k=2 clusters x d=2 components
    # component means are plain averages of the member vectors
    c = {(r.cluster_id, r.component_idx): r.centroid_value for r in rows}
    members0 = [[1.0, 0.0], [1.0, 0.05]]  # ids 0 and 2 (cluster 0)
    assert c[(0, 0)] == pytest.approx(
        sum(v[0] for v in members0) / 2, abs=1e-6
    )


def test_two_round_sizes_split_the_geometry(tiny_emb):
    sizes = {r.cluster_id: r.n_members for r in
             CL.kmeans_two_round_sizes(tiny_emb, k=2).collect()}
    # after one Lloyd update the clusters settle into the 3+3 split
    assert sorted(sizes.values()) == [3, 3]


def test_semantic_dedup_drops_only_dominated(tiny_emb):
    # threshold 0.99 under the seed assignment (cells {0,2} and
    # {1,3,4,5}): 2 is dominated by 0 (cos ~0.9988); 4 and 5 are
    # dominated by 3 (cos ~0.9938 / ~0.9988); 1 survives in its cell
    # because cos(1,3) ~0.11 and no lower id is near it.
    kept = {r.vec_id for r in
            CL.semantic_dedup(tiny_emb, k=2, threshold=0.99).collect()}
    assert kept == {0, 1, 3}


def test_semantic_dedup_threshold_one_keeps_everything(tiny_emb):
    kept = CL.semantic_dedup(tiny_emb, k=2, threshold=1.000001).count()
    assert kept == 6


def test_filtered_topk_respects_predicate(spark):
    rows = [
        (0, [1.0, 0.0], 1),
        (1, [0.99, 0.1], 1),   # closest overall, but label 1
        (2, [0.9, 0.2], 2),
        (3, [0.0, 1.0], 2),
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    top = CL.filtered_topk(emb, query_vec_id=0, label=2, k=2).collect()
    assert [r.vec_id for r in top] == [2, 3]
    assert all(r.label == 2 for r in top)


def test_incremental_dedup_gates(spark):
    base = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [(10, "alpha"),   # exact dup of base -> dropped
         (11, "gamma"),   # novel -> kept
         (12, "gamma"),   # intra-batch dup of 11 -> dropped (min-id)
         (13, "delta")],  # novel -> kept
        ["doc_id", "text"],
    )
    kept = [r.doc_id for r in D.incremental_dedup(new, base).collect()]
    assert kept == [11, 13]


def test_ivf_index_layout_prunes_partitions(spark, tmp_path):
    from streaming_demos_spark.catalog import load_table
    from streaming_demos_spark.operators import clustering as CL

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf")
    CL.write_ivf_index(emb, path, k=4)

    probe = CL.read_ivf_cells(spark, path, [0, 2])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan

    # parity with the in-plan assignment: the probed cells carry
    # exactly the vectors kmeans_assign puts there
    want = {
        r.vec_id
        for r in CL.kmeans_assign(emb, k=4).filter(
            F.col("cluster_id").isin([0, 2])
        ).collect()
    }
    assert {r.vec_id for r in probe.collect()} == want
    # and the probe scan reads fewer files than the full layout
    full = spark.read.parquet(path)
    assert probe.count() < full.count()
