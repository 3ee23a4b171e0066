"""Properties of the k-means trainer (operators/similarity.train_kmeans).

No DuckDB oracle is possible (float-average accumulation order differs
across engines), so the algorithm is pinned by its invariants instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import similarity

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _inertia(emb, cents):
    return (
        similarity.kmeans_assign(emb, cents).agg(F.sum("dist2")).first()[0]
    )


def test_inertia_monotonically_improves(spark):
    emb = _emb(spark)
    i1 = _inertia(emb, similarity.train_kmeans(emb, k=4, iters=1))
    i3 = _inertia(emb, similarity.train_kmeans(emb, k=4, iters=3))
    assert i3 <= i1 + 1e-9  # Lloyd's never increases the objective


def test_training_is_deterministic(spark):
    emb = _emb(spark)
    a = similarity.train_kmeans(emb, k=4, iters=2).collect()
    b = similarity.train_kmeans(emb.repartition(13), k=4, iters=2).collect()
    assert [r["cluster"] for r in a] == [r["cluster"] for r in b]
    for ra, rb in zip(a, b):
        assert all(abs(x - y) < 1e-9 for x, y in zip(ra["centroid"], rb["centroid"]))


def test_assignment_covers_all_rows_once(spark):
    emb = _emb(spark)
    cents = similarity.train_kmeans(emb, k=4, iters=2)
    assigned = similarity.kmeans_assign(emb, cents)
    assert assigned.count() == emb.count()
    assert assigned.filter(F.col("cluster").isNull()).count() == 0
    assert assigned.select("cluster").distinct().count() <= 4


def test_trained_ivf_beats_random_lists_on_recall(spark):
    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5)
    exact = similarity.topk_bruteforce(emb, queries, k=5)
    truth = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    cents = similarity.train_kmeans(emb, k=4, iters=3)
    approx = similarity.topk_ivf(
        emb, queries, k=5, nprobe=2,
        centroids=cents.select(
            F.col("cluster").alias("vec_id"), F.col("centroid").alias("emb")
        ),
    )
    got = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(got & truth) / len(truth)
    assert recall >= 0.5  # probing half the trained lists finds most truth


def test_hash_init_beats_first_k_on_sorted_corpus(spark):
    """VERDICT r3 #6: first-k init seeds every centroid inside one
    region when ids correlate with content (sorted corpora).  The
    hash-stratified init must reach a within-cluster variance (inertia)
    no worse than first-k on such a fixture — here, three well-
    separated 2-D blobs laid out in id order, where first-k puts all
    three seeds in the first blob."""
    rows = []
    # two near blobs + two far blobs along a line: first-k seeds all
    # land in the leftmost region and Lloyd's converges with the two
    # far blobs merged under one centroid (measured inertia ~50008 vs
    # ~27.5 for hash-stratified seeds)
    centers = [(0.0, 0.0), (1.0, 0.0), (50.0, 0.0), (100.0, 0.0)]
    for b, (cx, cy) in enumerate(centers):
        for i in range(40):
            # deterministic in-blob jitter, no rand()
            dx, dy = ((i * 7) % 11 - 5) * 0.05, ((i * 13) % 11 - 5) * 0.05
            rows.append((b * 40 + i, [cx + dx, cy + dy]))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    i_first = _inertia(
        emb, similarity.train_kmeans(emb, k=4, iters=5, init="first_k")
    )
    i_hash = _inertia(
        emb,
        similarity.train_kmeans(emb, k=4, iters=5, init="hash_stratified"),
    )
    assert i_hash <= i_first + 1e-9
    # and on this fixture the separation is strict: first-k collapses
    # the far blobs under one centroid while hash strata span them
    assert i_hash < i_first * 0.1


def test_hash_init_is_repartition_deterministic(spark):
    emb = _emb(spark)
    a = similarity.train_kmeans(emb, k=4, iters=2,
                                init="hash_stratified").collect()
    b = similarity.train_kmeans(emb.repartition(13), k=4, iters=2,
                                init="hash_stratified").collect()
    assert [r["cluster"] for r in a] == [r["cluster"] for r in b]
    for ra, rb in zip(a, b):
        assert all(
            abs(x - y) < 1e-9
            for x, y in zip(ra["centroid"], rb["centroid"])
        )
