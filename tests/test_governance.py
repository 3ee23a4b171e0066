"""Unit coverage for the governance/graph operators (privacy,
anomaly gate, survivor selection, k-NN graph) beyond the oracle-gate
parity that tests/test_star_oracle.py already pins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vexere_lakehouse_pipeline_spark.operators import dedup, privacy, similarity
from vexere_lakehouse_pipeline_spark.plans import governance


def test_mask_digits_masks_every_digit(spark):
    df = spark.createDataFrame(
        [("Customer#000000042",), ("no digits here",), (None,)], ["name"]
    )
    out = [
        r.masked
        for r in df.select(privacy.mask_digits("name").alias("masked")).collect()
    ]
    assert out == ["Customer#XXXXXXXXX", "no digits here", None]


def test_pseudonymize_deterministic_and_salted(spark):
    df = spark.createDataFrame([("alice",), ("alice",), ("bob",)], ["name"])
    out = df.select(
        privacy.pseudonymize("name", "s1:").alias("a"),
        privacy.pseudonymize("name", "s2:").alias("b"),
    ).collect()
    # Same value + salt -> same surrogate; different salt -> different.
    assert out[0].a == out[1].a
    assert out[0].a != out[0].b
    assert len(out[0].a) == 64 and out[0].a == out[0].a.lower()


def test_k_anonymity_flags_small_groups(spark):
    rows = [("seg_a", 1)] * 5 + [("seg_b", 2)] * 2
    df = spark.createDataFrame(rows, ["seg", "nat"])
    rep = {
        (r.seg, r.nat): (r.group_size, r.meets_k)
        for r in privacy.k_anonymity_report(df, ["seg", "nat"], k=5).collect()
    }
    assert rep[("seg_a", 1)] == (5, True)
    assert rep[("seg_b", 2)] == (2, False)


def test_k_anonymity_requires_quasi_columns(spark):
    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="quasi"):
        privacy.k_anonymity_report(df, [])


def test_anomaly_gate_flags_injected_spike(spark):
    # 10 flat days then a 10x spike: only the spike day may fire, and
    # only once it has >= _MIN_N days of trailing history.
    rows = [(f"2024-01-{d:02d}", 100.0) for d in range(1, 11)]
    rows.append(("2024-01-11", 1000.0))
    orders = spark.createDataFrame(rows, ["d", "o_totalprice"]).select(
        F.col("d").cast("timestamp").alias("o_orderdate"), "o_totalprice"
    )
    import vexere_lakehouse_pipeline_spark.plans.governance as g

    real_load = g.load_table
    g.load_table = lambda spark, sf_dir, name: orders
    try:
        out = g.QUERIES["anomaly_daily_revenue"](spark, "ignored").collect()
    finally:
        g.load_table = real_load
    flags = {str(r.day): r.is_anomaly for r in out}
    assert flags["2024-01-11"] is True
    assert sum(flags.values()) == 1
    by_day = {str(r.day): r for r in out}
    # Flat stretch: trailing mean equals the constant revenue exactly.
    assert by_day["2024-01-10"].trailing_mean_cents == 10000


def test_survivor_selection_prefers_quality_then_id(spark):
    # Two docs with identical text (guaranteed same cluster), one longer.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", 10),
            (2, "alpha beta gamma delta epsilon zeta", 99),
            (3, "totally unrelated words nothing shared here", 50),
        ],
        ["doc_id", "text", "n_chars"],
    )
    out = {
        r.doc_id: r
        for r in dedup.survivor_selection(docs, quality_col="n_chars").collect()
    }
    assert out[1].survivor_id == 2 and out[1].is_survivor is False
    assert out[2].survivor_id == 2 and out[2].is_survivor is True
    assert out[3].survivor_id == 3 and out[3].is_survivor is True


def test_knn_graph_exact_cap_and_strategy_validation(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(4)], ["vec_id", "embedding"]
    )
    with pytest.raises(ValueError, match="unknown"):
        similarity.knn_graph(emb, strategy="bogus")
    orig = similarity.MAX_EXACT_KNN_ROWS
    similarity.MAX_EXACT_KNN_ROWS = 2
    try:
        with pytest.raises(ValueError, match="capped"):
            similarity.knn_graph(emb, strategy="exact").collect()
    finally:
        similarity.MAX_EXACT_KNN_ROWS = orig


def test_knn_graph_lsh_edges_subset_of_exact(spark):
    # LSH strategy may MISS edges (bucket pruning) but must never
    # invent one: every (src, dst, cos) it emits appears in the exact
    # pairwise scoring.
    emb = spark.createDataFrame(
        [(i, [float((i * 7) % 5 - 2), float(i % 3 - 1), 1.0]) for i in range(12)],
        ["vec_id", "embedding"],
    )
    exact = {
        (r.src, r.dst, r.cos_sim)
        for r in similarity.knn_graph(emb, k=11, strategy="exact").collect()
    }
    lsh = {
        (r.src, r.dst, r.cos_sim)
        for r in similarity.knn_graph(emb, k=3, strategy="lsh").collect()
    }
    assert lsh  # buckets are coarse enough that some edges survive
    assert lsh <= exact


def test_governance_queries_registered():
    for name in (
        "privacy_pseudonymize_customers",
        "privacy_kanonymity_report",
        "anomaly_daily_revenue",
        "dedup_survivor_selection",
        "sim_knn_graph",
    ):
        assert name in governance.QUERIES and name in governance.ORACLE_SQL


def test_pagerank_fixed_point_mass_and_hub(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph

    # Star graph: every node links to 0 (plus a back edge 0->1).
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(0, 1)], ["src", "dst"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["vec_id"])
    pr = {
        r.vec_id: r.pr_e12
        for r in graph.pagerank_fixed_point(edges, nodes, iters=3).collect()
    }
    assert len(pr) == 6
    # The hub receives every leaf's mass: far above any leaf.  (Node 1
    # is NOT a leaf — the 0->1 back edge hands it the hub's whole mass,
    # so it ranks second.)
    leaves = [pr[k] for k in range(2, 6)]
    assert pr[0] > 3 * max(leaves)
    assert pr[1] > max(leaves)
    assert max(pr, key=pr.get) == 0
    # Fixed-point truncation only ever loses mass: total <= 1.0 and
    # close to it (each div truncates at 1e-12).
    assert sum(pr.values()) <= graph.PR_SCALE
    assert sum(pr.values()) > int(graph.PR_SCALE * 0.8)


def test_pagerank_validates_damping(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    nodes = spark.createDataFrame([(1,), (2,)], ["vec_id"])
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank_fixed_point(edges, nodes, damping_pct=0)


def test_editdist_verify_scores_near_dups_high(spark):
    from vexere_lakehouse_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zet"),   # 1 char off
            (3, "completely different content entirely here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_a, r.doc_b): (r.edit_dist, r.sim_permille)
        for r in dedup.editdist_verify_pairs(docs).collect()
    }
    assert out[(1, 2)][0] == 1
    assert out[(1, 2)][1] >= 970
    # threshold filter keeps only near-identical pairs
    kept = dedup.editdist_verify_pairs(docs, max_permille_dist=50).collect()
    assert {(r.doc_a, r.doc_b) for r in kept} == {(1, 2)}


def test_editdist_prefilter_boundary_not_overpruned(spark):
    # Boundary regression: gap=5, maxlen=35 -> floor(1000*5/35)=142, so
    # with max_permille_dist=142 the pair PASSES (sim=858 >= 858); a
    # prefilter using mpd*mx (4970 < 5000) would wrongly drop it.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # 35 chars
            (2, "alpha beta gamma delta epsilon"),        # 30 chars
        ],
        ["doc_id", "text"],
    )
    out = dedup.editdist_verify_pairs(docs, max_permille_dist=142).collect()
    assert {(r.doc_a, r.doc_b, r.edit_dist, r.sim_permille) for r in out} == {
        (1, 2, 5, 858)
    }


def test_snapshot_diff_reordered_columns_and_type_drift(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "sdro"))
    v1 = t.commit(spark.createDataFrame([(1, "a")], "id int, v string"))
    # same columns, different order: must diff cleanly, not crash
    v2 = t.commit(spark.createDataFrame([("a2", 1)], "v string, id int"))
    out = snapshot_diff(spark, t, v1, v2, ["id"]).collect()
    assert [(r.id, r.v, r._change) for r in out] == [(1, "a2", "update")]

    t2 = SnapshotTable(str(tmp_path / "sdty"))
    w1 = t2.commit(spark.createDataFrame([(1, "a")], "id int, v string"))
    w2 = t2.commit(spark.createDataFrame([(1, "a")], "id string, v string"))
    with pytest.raises(ValueError, match="types"):
        snapshot_diff(spark, t2, w1, w2, ["id"])


def test_snapshot_diff_null_vs_sentinel_literal(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "sdnull"))
    v1 = t.commit(
        spark.createDataFrame([(1, "\x01NULL")], "id int, v string")
    )
    v2 = t.commit(
        spark.createDataFrame([(1, None)], "id int, v string")
    )
    out = snapshot_diff(spark, t, v1, v2, ["id"]).collect()
    # a real '\x01NULL' string changing to NULL IS a change
    assert [(r.id, r._change) for r in out] == [(1, "update")]


def test_weighted_pagerank_weights_steer_mass(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph

    # Node 0 links to 1 (weight 999) and 2 (weight 1): node 1 must end
    # far above node 2; unweighted PageRank would tie them.
    edges = spark.createDataFrame(
        [(0, 1, 999), (0, 2, 1), (1, 0, 1), (2, 0, 1)], ["src", "dst", "w"]
    )
    nodes = spark.createDataFrame([(i,) for i in range(3)], ["vec_id"])
    pr = {
        r.vec_id: r.pr_e12
        for r in graph.pagerank_weighted_fixed_point(
            edges, nodes, iters=3
        ).collect()
    }
    assert pr[1] > 5 * pr[2]
    assert sum(pr.values()) <= graph.PR_SCALE


def test_incremental_pairs_only_cross_side(spark):
    from vexere_lakehouse_pipeline_spark.operators import dedup

    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # near-dup of batch
            (2, "alpha beta gamma delta epsilon zet"),    # near-dup of both
            (3, "completely different words entirely here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_new, r.doc_old)
        for r in dedup.incremental_candidate_pairs(batch, corpus).collect()
    }
    # all pairs are new x old; the identical corpus doc is found
    assert (10, 1) in out
    assert all(n == 10 for n, _ in out)
    assert (10, 3) not in out


def test_incremental_pairs_reingested_id_keeps_separate_signatures(spark):
    from vexere_lakehouse_pipeline_spark.operators import dedup

    # Same doc_id on both sides with DIFFERENT texts: each side must
    # keep its own minhash signature (not a merged corrupted one), and
    # (new=42, old=42) appears only if the two VERSIONS near-dup.
    batch = spark.createDataFrame(
        [(42, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (42, "totally different stored version content here"),
            (7, "alpha beta gamma delta epsilon zeta"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.doc_new, r.doc_old)
        for r in dedup.incremental_candidate_pairs(batch, corpus).collect()
    }
    assert (42, 7) in out       # the real near-dup
    assert (42, 42) not in out  # unrelated versions must NOT pair

    # And when the re-ingested version IS near its stored version,
    # the (42, 42) pair is the correct, meaningful output.
    corpus2 = spark.createDataFrame(
        [(42, "alpha beta gamma delta epsilon zet")], ["doc_id", "text"]
    )
    out2 = {
        (r.doc_new, r.doc_old)
        for r in dedup.incremental_candidate_pairs(batch, corpus2).collect()
    }
    assert out2 == {(42, 42)}


def test_weighted_pagerank_rejects_bad_weights(spark):
    from vexere_lakehouse_pipeline_spark.operators import graph

    nodes = spark.createDataFrame([(1,), (2,)], ["vec_id"])
    for bad in [0, -5]:
        edges = spark.createDataFrame([(1, 2, bad)], ["src", "dst", "w"])
        with pytest.raises(ValueError, match="weights"):
            graph.pagerank_weighted_fixed_point(edges, nodes)
    edges = spark.createDataFrame(
        [(1, 2, None)], "src long, dst long, w long"
    )
    with pytest.raises(ValueError, match="weights"):
        graph.pagerank_weighted_fixed_point(edges, nodes)


def test_snapshot_diff_separator_injection(spark, tmp_path):
    from vexere_lakehouse_pipeline_spark.operators.snapshots import (
        SnapshotTable,
        snapshot_diff,
    )

    t = SnapshotTable(str(tmp_path / "sdsep"))
    v1 = t.commit(
        spark.createDataFrame([(1, "a", "a\x00vb")], "id int, c1 string, c2 string")
    )
    v2 = t.commit(
        spark.createDataFrame([(1, "a\x00va", "b")], "id int, c1 string, c2 string")
    )
    out = snapshot_diff(spark, t, v1, v2, ["id"]).collect()
    # boundary-shifting values must still register as an update
    assert [(r.id, r._change) for r in out] == [(1, "update")]


def test_er_matches_respect_block_and_distance(spark):
    from vexere_lakehouse_pipeline_spark.plans.governance import QUERIES

    rows = QUERIES["er_customer_matches"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r["name_dist"] <= 2
        assert r["cust_a"] < r["cust_b"]


def test_er_sorted_neighborhood_bounded_on_degenerate_corpus(spark, tmp_path):
    """Thousands of identical names: equality blocking re-blocks the
    hot key into bounded sub-blocks (linear work, partial recall);
    sorted neighborhood emits exactly the n·W bounded candidate set."""
    import pyspark.sql.functions as F

    from vexere_lakehouse_pipeline_spark.plans.governance import (
        _ER_SN_WINDOW,
        QUERIES,
    )

    n = 3000
    df = spark.range(n).select(
        (F.col("id") + 1).cast("long").alias("c_custkey"),
        F.lit("Customer#000000001").alias("c_name"),
        F.lit(1).cast("int").alias("c_nationkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
    )
    sf = str(tmp_path)
    df.coalesce(2).write.parquet(f"{sf}/customer.parquet")

    out = QUERIES["er_sorted_neighborhood_matches"](spark, sf)
    rows = out.collect()
    # every record pairs with its W successors, all at distance 0
    expected = sum(min(_ER_SN_WINDOW, n - 1 - i) for i in range(n))
    assert len(rows) == expected
    assert all(r.name_dist == 0 for r in rows)

    # the blocked variant hash-splits the hot block into ceil(n/cap)=3
    # sub-blocks: matches ARE found (the old drop policy emitted zero)
    # and the count stays ~n*cap/2, bounded below the quadratic
    # C(3000,2) = 4_498_500
    n_blocked = QUERIES["er_customer_matches"](spark, sf).count()
    assert 0 < n_blocked < 2_500_000


def test_er_sorted_neighborhood_finds_adjacent_near_dups(spark):
    from vexere_lakehouse_pipeline_spark.plans.governance import QUERIES

    rows = QUERIES["er_sorted_neighborhood_matches"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["name_dist"] <= 2
        assert r["cust_a"] < r["cust_b"]


def test_decayed_value_weights_recent_purchases_higher(spark):
    import datetime

    from pyspark.sql import functions as F

    from vexere_lakehouse_pipeline_spark.plans import governance

    # same value, different ages: decayed contribution must fall with
    # age; a purchase past the horizon contributes 0
    base = datetime.datetime(2024, 6, 1)
    rows = [
        (1, base, 1, "purchase", 100.0, None),                      # age 0
        (2, base - datetime.timedelta(weeks=4), 2, "purchase", 100.0, None),
        (3, base - datetime.timedelta(weeks=80), 3, "purchase", 100.0, None),
    ]
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    import os, tempfile

    d = tempfile.mkdtemp()
    events.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = {
        r["user_id"]: r["decayed_value"]
        for r in governance.QUERIES["events_decayed_user_value"](spark, d).collect()
    }
    assert out[1] == 100.0          # age 0 -> factor 1.0
    assert out[2] == 50.0           # one half-life -> 0.5
    assert out[3] == 0.0            # past the 52-week horizon


def test_ab_ztest_matches_hand_computation(spark):
    import datetime
    import math
    import tempfile

    from vexere_lakehouse_pipeline_spark.plans import governance

    # variant 0 = even user ids: users 0,2,4 (2 convert); variant 1 =
    # users 1,3 (1 converts)
    t = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid, conv in [(0, 1), (2, 1), (4, 0), (1, 1), (3, 0)]:
        rows.append((eid, t, uid, "view", 1.0, None)); eid += 1
        if conv:
            rows.append((eid, t, uid, "purchase", 5.0, None)); eid += 1
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    d = tempfile.mkdtemp()
    events.write.mode("overwrite").parquet(f"{d}/events.parquet")
    r = governance.QUERIES["events_ab_conversion_ztest"](spark, d).collect()[0]
    assert (r["n_a"], r["n_b"], r["x_a"], r["x_b"]) == (3, 2, 2, 1)
    p = 3 / 5
    z = (2 / 3 - 1 / 2) / math.sqrt(p * (1 - p) * (1 / 3 + 1 / 2))
    assert abs(r["z_score"] - round(z, 6)) < 1e-9


def test_hard_negatives_cross_label_and_ceiling(spark):
    from vexere_lakehouse_pipeline_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    out = similarity.hard_negative_candidates(emb, k=2).collect()
    for r in out:
        assert labels[r["src"]] != labels[r["neg"]]
        assert 1 <= r["rnk"] <= 2
    # every src gets exactly k negatives (cross-label candidates exist)
    from collections import Counter
    per_src = Counter(r["src"] for r in out)
    assert set(per_src.values()) == {2}

    import pytest as _pytest
    big = similarity.MAX_EXACT_KNN_ROWS
    try:
        similarity.MAX_EXACT_KNN_ROWS = 3
        with _pytest.raises(ValueError):
            similarity.hard_negative_candidates(emb, k=2)
    finally:
        similarity.MAX_EXACT_KNN_ROWS = big


def test_quality_drift_ks_exact_integer_statistic(spark):
    """KS drift on a hand-checkable fixture: src0 lengths {1,2,3},
    src1 lengths {3,4,5} -> inclusive CDF gaps peak at v=2..3 with
    |ca*t_b - cb*t_a| = 2*3 - 0*3 = 6 (D = 2/3); the tiny samples sit
    below the 5% critical value, so drift_flag is 0 even though the
    raw statistic is large — exactly the n-awareness PSI lacks."""
    import pandas as pd

    from vexere_lakehouse_pipeline_spark.plans.governance import (
        _DRIFT_A,
        _DRIFT_B,
        quality_drift_ks,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(6),
        "source": [_DRIFT_A] * 3 + [_DRIFT_B] * 3,
        "text": ["x", "xx", "xxx", "xxx", "xxxx", "xxxxx"],
    }))
    import vexere_lakehouse_pipeline_spark.catalog as cat

    orig = cat.load_table
    try:
        cat.load_table = lambda s, d, t: docs  # noqa: E731
        import vexere_lakehouse_pipeline_spark.plans.governance as gov

        gov_orig = gov.load_table
        gov.load_table = cat.load_table
        try:
            row = quality_drift_ks(spark, "unused").collect()[0]
        finally:
            gov.load_table = gov_orig
    finally:
        cat.load_table = orig
    assert (row["t_a"], row["t_b"]) == (3, 3)
    assert row["d_num"] == 6            # max |ca*t_b - cb*t_a|
    assert row["ks_permille"] == 666    # floor(1000*6/9)
    # crit = round(1358*sqrt(6/9)) = round(1108.9) = 1109 > 666
    assert row["crit_permille_05"] == 1109
    assert row["drift_flag"] == 0
