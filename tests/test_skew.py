"""Skew utilities (operators/skew.py) and the analytics report bundle
(operators/reports.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.operators.reports import (
    dataset_report,
)
from data_feature_extraction_and_retrieval_pipeline_spark.operators.skew import (
    salted_aggregate,
    salted_join,
)
from data_feature_extraction_and_retrieval_pipeline_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_salted_aggregate_matches_plain(spark):
    ev = load_table(spark, SF_DIR, "events")
    plain = {
        r["event_type"]: (r["n"], r["s"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"), F.max("value").alias("mx"))
        .collect()
    }
    salted = {
        r["event_type"]: (r["n"], r["s"], r["mx"])
        for r in salted_aggregate(
            ev, ["event_type"], {"n": ("*", "count"), "s": ("value", "sum"), "mx": ("value", "max")}
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert plain[k][1] == pytest.approx(salted[k][1], rel=1e-12)
        assert plain[k][2] == salted[k][2]


def test_salted_aggregate_rejects_non_reaggregable(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="non-re-aggregable"):
        salted_aggregate(ev, ["event_type"], {"a": ("value", "avg")})


def test_salted_join_row_identical(spark):
    ev = load_table(spark, SF_DIR, "events").select("event_id", "user_id", "value")
    dim = (
        ev.select("user_id").distinct()
        .withColumn("user_tier", (F.col("user_id") % 3).cast("int"))
    )
    plain = ev.join(dim, "user_id").select("event_id", "user_tier")
    salted = salted_join(ev, dim, "user_id").select("event_id", "user_tier")
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_dataset_report_bundle(spark):
    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings")
    rep = dataset_report(docs, ev, emb)
    assert set(rep) == {
        "source_counts", "lang_counts", "token_leaderboard",
        "length_histogram", "length_stats_by_lang", "distinct_counters",
        "coverage_split", "event_type_counts", "events_per_user_stats",
        "label_vector_stats",
    }
    counters = rep["distinct_counters"].first()
    assert counters["n_docs"] == docs.count()
    top = rep["token_leaderboard"].collect()
    assert len(top) == 30 and top[0]["count"] >= top[-1]["count"]
    norms = rep["label_vector_stats"].collect()
    for r in norms:
        assert r["mean_norm"] == pytest.approx(1.0, abs=1e-3)  # normalized corpus


def test_skew_stress_hot_key_levers_engage(spark):
    """Deliberate worst-case skew at sf0.1 (100k events): ~90% of all
    rows remapped onto ONE key. Asserts BOTH that the salting levers
    actually engage (the hot key's rows really spread across many
    (key, salt) phase-1 groups / the dim really replicates across all
    salt values) AND that results stay row-identical to the unsalted
    plans — the two halves of SCALING.md's skew promise."""
    sf01 = "/root/testdata/sf0.1"
    ev = (
        load_table(spark, sf01, "events")
        .select("event_id", "user_id", "value")
        .withColumn(
            "skew_key",
            F.when(F.col("event_id") % 10 < 9, F.lit(-1)).otherwise(
                F.col("user_id")
            ),
        )
    )
    buckets = 16

    # --- salted aggregate ---
    salted = salted_aggregate(
        ev,
        ["skew_key"],
        {"n": ("*", "count"), "s": ("value", "sum"), "mx": ("value", "max")},
        salt_buckets=buckets,
    )
    plain = ev.groupBy("skew_key").agg(
        F.count("*").alias("n"),
        F.sum("value").alias("s"),
        F.max("value").alias("mx"),
    )
    got = {r["skew_key"]: (r["n"], round(r["s"], 6), r["mx"]) for r in salted.collect()}
    want = {r["skew_key"]: (r["n"], round(r["s"], 6), r["mx"]) for r in plain.collect()}
    assert got.keys() == want.keys()
    assert got[-1][0] == want[-1][0] >= 80000  # the hot key really is hot
    for k in want:
        assert got[k][0] == want[k][0] and got[k][2] == want[k][2]
        assert got[k][1] == pytest.approx(want[k][1], rel=1e-9)

    # lever engagement: phase 1 must split the hot key across (almost)
    # every salt bucket — i.e. no single reduce task sees the key whole
    salt = (F.rand(seed=42) * buckets).cast("int").alias("__salt")
    hot_groups = (
        ev.filter(F.col("skew_key") == -1)
        .withColumn("__salt", salt)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(hot_groups) == buckets, "hot key must spread over all salts"
    assert max(r["count"] for r in hot_groups) < 0.2 * 90000, (
        "no phase-1 group may hold a dominant share of the hot key"
    )
    # and the plan is the two-exchange shape (key,salt partial -> key)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") >= 2
    assert "__salt" in plan

    # --- salted join ---
    dim = (
        ev.select("skew_key").distinct()
        .withColumn("tier", (F.col("skew_key") % 3).cast("int"))
    )
    sj = salted_join(ev, dim, "skew_key", salt_buckets=8).select(
        "event_id", "tier"
    )
    pj = ev.join(dim, "skew_key").select("event_id", "tier")
    assert sj.exceptAll(pj).count() == 0 and pj.exceptAll(sj).count() == 0
    # dim replication across all salt values is what spreads the hot
    # key's probe side — assert it really happened
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(8)]))
    )
    assert salted_dim.count() == dim.count() * 8


def test_sketch_profile_bounds_vs_exact(spark):
    """The sketch aggregates land within tolerance of the certified
    exact twins, and the plan keeps the exact versions' partial+final
    single-exchange shape (the scale win is state size, not plan
    shape)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.analytics import (
        sketch_profile,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    got = {r["event_type"]: r for r in sketch_profile(
        ev, "event_type", "user_id", "value"
    ).collect()}
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert got.keys() == exact.keys()
    for k in exact:
        e, g = exact[k], got[k]
        # HLL++ at rsd=0.05: allow 3 standard errors
        assert abs(g["approx_distinct"] - e["nd"]) <= max(3, 0.15 * e["nd"])
        # quantile sketch at accuracy=10000 on ~thousands of rows:
        # the approx quantile is an actual data value near the target
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == k).collect()
        )
        n = len(vals)
        import bisect

        for q, approx in ((0.5, g["approx_median"]), (0.95, g["approx_p95"])):
            rank = bisect.bisect_left(vals, approx) / max(n - 1, 1)
            assert abs(rank - q) <= 0.02, (k, q, approx, rank)

    plan = sketch_profile(ev, "event_type", "user_id", "value")._jdf \
        .queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, (
        "sketch aggregation must stay one exchange (partial+final)"
    )


def test_sketch_mergeability_across_splits(spark, tmp_path):
    """The 100 TB story for sketch profiling is that per-partition
    sketch STATE merges losslessly: profile each half of a corpus
    independently, merge the sketches, and land within the same
    tolerances as the whole-corpus sketch vs the exact twins.

    Two merge proofs:
    - HLL: explicit state-level merge — each hash-half aggregates to a
      serialized DataSketches HLL per group (hll_sketch_agg), the
      halves' binary sketches are union-merged (hll_union_agg), and
      the merged estimate must match the whole-corpus exact distinct
      within the 3-SE tolerance. This is literally the map-side
      combine a 1000-executor aggregation performs.
    - KLL-style quantiles (no exposed state in Spark): physical-split
      merge — the halves are written as separate parquet trees, read
      back as a two-file union so each half builds its own partial
      sketch, and the final-merge quantile must stay within the ±2%%
      rank tolerance of the exact order statistics.
    """
    import bisect

    ev = load_table(spark, "/root/testdata/sf0.01", "events").select(
        "event_type", "user_id", "value"
    )
    half_a = ev.filter(F.xxhash64("user_id", "value") % 2 == 0)
    half_b = ev.filter(F.xxhash64("user_id", "value") % 2 != 0)

    # --- HLL: materialize per-half sketches, merge the binary state
    sk_a = half_a.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    sk_b = half_b.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = (
        sk_a.unionByName(sk_b)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("nd_est"))
    )
    exact = {
        r["event_type"]: r
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    got = {r["event_type"]: r["nd_est"] for r in merged.collect()}
    assert got.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(got[k] - e["nd"]) <= max(3, 0.15 * e["nd"]), (
            k, got[k], e["nd"],
        )

    # --- KLL: separate parquet trees -> union scan -> one aggregation
    pa, pb = str(tmp_path / "half_a"), str(tmp_path / "half_b")
    half_a.write.parquet(pa)
    half_b.write.parquet(pb)
    both = spark.read.parquet(pa, pb)
    prof = {
        r["event_type"]: r
        for r in both.groupBy("event_type")
        .agg(
            F.percentile_approx("value", 0.5, 10000).alias("p50"),
            F.percentile_approx("value", 0.95, 10000).alias("p95"),
        )
        .collect()
    }
    for k in exact:
        vals = sorted(
            r["value"]
            for r in ev.filter(F.col("event_type") == k).collect()
        )
        n = len(vals)
        for q, approx in ((0.5, prof[k]["p50"]), (0.95, prof[k]["p95"])):
            rank = bisect.bisect_left(vals, approx) / max(n - 1, 1)
            assert abs(rank - q) <= 0.02, (k, q, approx, rank)


def test_window_group_limit_rule_and_salted_topn_identity(spark):
    """Two pins from the round-6 skew measurement (tools/skew_bench.py):

    1. The plain rank<=n filter — the engine's W1/W2 top-n-per-group
       form — compiles with a PARTIAL WindowGroupLimit before the
       exchange, i.e. Catalyst itself collapses a hot group to <= n
       rows per map task (the reason the plain form beats explicit
       salting at 24M rows / 98% hot). If this rule ever stops firing,
       the hot-image window becomes a single-task sort at scale.
    2. salted_top_n_per_group (the explicit fallback for shapes the
       rule can't rewrite) stays row-identical to the plain form on a
       skewed input with score ties.
    """
    from pyspark.sql import Window
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.skew import (
        salted_top_n_per_group,
    )

    df = spark.range(5000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 13).cast("double").alias("score"),  # heavy ties
        F.col("id").alias("row_id"),
    )
    w = Window.partitionBy("k").orderBy(F.desc("score"), F.col("row_id"))
    plain = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    physical = plain._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in physical and "Partial" in physical, physical[:800]

    a = {(r["k"], r["row_id"], r["rank"]) for r in plain.collect()}
    b = {
        (r["k"], r["row_id"], r["rank"])
        for r in salted_top_n_per_group(df, "k", "score", 5, "row_id").collect()
    }
    assert a == b
