"""Hot serving tier (serving.py, Engine.search_rows/search_content_rows,
Percolator.matches_rows) — equivalence against the Spark plans.

The hot tier exists to serve interactive traffic without the
per-request Spark plan cost; these tests are the contract that makes
it safe: for every mode and for the percolator, the resident-tier
result must match the operator layer's DataFrame result row for row
(ids and integer fields exactly; float scores to 1e-9 — the whole-image
dot accumulates SIMD-blocked in numpy vs left-to-right in the JVM HOF,
a ~1e-13 effect absorbed by the engine's 1e-6 rounded-score ordering).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.api import (
    Engine,
    Percolator,
)
from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
    py_tokens,
    round_half_up,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(spark):
    eng = Engine.from_sf_dir(spark, SF_DIR)
    eng.segment_tags = spark.createDataFrame(
        [
            (0, [("cat", 0.9), ("dog", 0.2)]),
            (1, [("cat", 0.4)]),
            (2, [("fish", 0.8), ("cat", 0.15)]),
            (3, []),
        ],
        "image_id long, tags array<struct<tag string, confidence float>>",
    )
    return eng


def _spark_rows(df):
    return [r.asDict() for r in df.collect()]


def _assert_rows_equal(hot_rows, spark_rows, float_tol=1e-9):
    assert len(hot_rows) == len(spark_rows), (hot_rows, spark_rows)
    for h, s in zip(hot_rows, spark_rows):
        assert set(h) == set(s), (h, s)
        for k, sv in s.items():
            hv = h[k]
            if isinstance(sv, float):
                assert hv == pytest.approx(sv, abs=float_tol), (k, h, s)
            else:
                assert hv == sv, (k, h, s)


PAYLOADS = [f"serving-payload-{i}".encode() for i in range(4)]


@pytest.mark.parametrize("mode", ["whole", "segment", "hybrid"])
def test_content_modes_match_spark(engine, mode):
    for payload in PAYLOADS:
        hot = engine.search_content_rows(
            payload, filename="q.png", mode=mode, top_k=5,
            model_loader=lambda: None,
        )
        df = engine.search_content(
            payload, filename="q.png", mode=mode, top_k=5,
            model_loader=lambda: None,
        )
        _assert_rows_equal(hot, _spark_rows(df))


def test_hybrid_weights_match_spark(engine):
    hot = engine.search_content_rows(
        PAYLOADS[0], filename="q.png", mode="hybrid", top_k=4,
        model_loader=lambda: None, whole_weight=0.7, segment_weight=0.3,
    )
    df = engine.search_content(
        PAYLOADS[0], filename="q.png", mode="hybrid", top_k=4,
        model_loader=lambda: None, whole_weight=0.7, segment_weight=0.3,
    )
    _assert_rows_equal(hot, _spark_rows(df))


@pytest.mark.parametrize("mode", ["whole", "segment", "hybrid"])
def test_tag_filter_matches_spark(engine, mode):
    hot = engine.search_content_rows(
        PAYLOADS[1], filename="q.png", mode=mode, top_k=5,
        model_loader=lambda: None, tag_filter=["cat", "fish"],
        min_confidence=0.5,
    )
    df = engine.search_content(
        PAYLOADS[1], filename="q.png", mode=mode, top_k=5,
        model_loader=lambda: None, tag_filter=["cat", "fish"],
        min_confidence=0.5,
    )
    _assert_rows_equal(hot, _spark_rows(df))
    # the filter actually bites: allowed = {0, 2} under floor 0.5
    # (image 1's cat sits at 0.4, below the floor)
    assert {r["image_id"] for r in hot} <= {0, 2}


def test_tags_mode_matches_spark(engine):
    hot = engine.search_rows("tags", tags=["cat", "fish"], top_k=10)
    df = engine.search("tags", tags=["cat", "fish"], top_k=10)
    _assert_rows_equal(hot, _spark_rows(df))
    assert [r["image_id"] for r in hot] == [2, 0, 1]  # (n_tags, conf, id)


def test_search_rows_validation_parity(engine):
    for kwargs, msg in [
        (dict(mode="whole"), "whole mode needs query_vec"),
        (dict(mode="segment"), "segment mode needs query_segments"),
        (dict(mode="tags"), "tags mode needs tags"),
        (dict(mode="nope"), "unknown mode"),
    ]:
        with pytest.raises(ValueError, match=msg):
            engine.search_rows(**kwargs)


def test_hot_rebuild_after_table_swap(engine, spark):
    """hot() caches; rebuild=True re-collects the current tables."""
    hot0 = engine.hot()
    assert engine.hot() is hot0
    assert engine.hot(rebuild=True) is not hot0


# -- sharded gather (the horizontal posture, executable) -------------------


@pytest.mark.parametrize("n_shards", [2, 3, 7])
def test_sharded_equals_single_all_modes(engine, n_shards):
    """ShardedHotIndex over N shards must return the same rows as the
    single index for every mode — the exactness proof behind the
    'N serving processes behind a balancer' posture (SCALING.md):
    ids, ranks, and integer fields identical; float scores to 1e-12
    (BLAS dgemm blocking makes the same row's dot differ by ~1 ulp
    between shard-sized and corpus-sized matmuls — absorbed by the
    1e-6 rounded-score ordering, like every other fp-order effect in
    this engine)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        ShardedHotIndex,
    )

    hot = engine.hot()
    sharded = ShardedHotIndex.from_hot(hot, n_shards)
    qvec, seg_rows = engine._encode_query(
        PAYLOADS[2], "q.png", "hybrid", dim=hot.dim,
        model_loader=lambda: None,
    )
    _assert_rows_equal(sharded.whole(qvec, 7), hot.whole(qvec, 7), 1e-12)
    _assert_rows_equal(
        sharded.segment(seg_rows, 5, candidate_cap=15),
        hot.segment(seg_rows, 5, candidate_cap=15), 1e-12,
    )
    _assert_rows_equal(
        sharded.hybrid(qvec, seg_rows, 5),
        hot.hybrid(qvec, seg_rows, 5), 1e-12,
    )
    assert sharded.tags(["cat", "fish"], 0.1, 10) == hot.tags(
        ["cat", "fish"], 0.1, 10
    )  # tag scoring is arithmetic-free: bit equality holds
    allowed = hot.tag_allowed(["cat"], 0.3)
    assert sharded.tag_allowed(["cat"], 0.3) == allowed
    _assert_rows_equal(
        sharded.whole(qvec, 7, allowed=allowed),
        hot.whole(qvec, 7, allowed=allowed), 1e-12,
    )
    _assert_rows_equal(
        sharded.hybrid(qvec, seg_rows, 5, allowed=allowed),
        hot.hybrid(qvec, seg_rows, 5, allowed=allowed), 1e-12,
    )
    _assert_rows_equal(
        sharded.segment(seg_rows, 5, candidate_cap=15, allowed=allowed),
        hot.segment(seg_rows, 5, candidate_cap=15, allowed=allowed),
        1e-12,
    )


def test_sharded_handles_empty_shards(engine):
    """More shards than distinct ids ⇒ some shards are empty; the
    gather must not care."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        ShardedHotIndex,
    )

    hot = engine.hot()
    n = int(len(hot.image_ids) + 5)
    sharded = ShardedHotIndex.from_hot(hot, n)
    qvec, _ = engine._encode_query(
        PAYLOADS[3], "q.png", "whole", dim=hot.dim,
        model_loader=lambda: None,
    )
    _assert_rows_equal(sharded.whole(qvec, 5), hot.whole(qvec, 5), 1e-12)
    # allowed-filter over empty shards (regression: a dtype-less empty
    # mask indexed the id array as float64)
    allowed = hot.tag_allowed(["cat"], 0.3)
    _assert_rows_equal(
        sharded.whole(qvec, 5, allowed=allowed),
        hot.whole(qvec, 5, allowed=allowed),
        1e-12,
    )
    seg_rows = [(1, [0.0] * hot.dim)]
    _assert_rows_equal(
        sharded.hybrid(qvec, seg_rows, 3, allowed=allowed),
        hot.hybrid(qvec, seg_rows, 3, allowed=allowed),
        1e-12,
    )


# -- primitive parity -----------------------------------------------------


def test_py_tokens_matches_spark_tokens(spark):
    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        text as X,
    )

    texts = [
        "Data  Vector\tTable\nJOIN",
        "  leading and trailing  ",
        "", "one", "a\x0bb\fc\rd",
        "Ünïcode Mixed CASE tokens",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string").select(
        X.tokens("t").alias("toks")
    )
    got = [r["toks"] for r in df.collect()]
    assert got == [py_tokens(t) for t in texts]


def test_round_half_up_matches_spark_round_randomized(spark):
    """400 seeded random doubles across magnitudes (including values
    engineered to land near the digit-7 rounding boundary) — the
    display-rounding twin must match F.round(double, 6) bit-for-bit
    on all of them."""
    import random

    rng = random.Random(0xD0D0)
    vals = []
    for _ in range(300):
        vals.append(rng.uniform(-10, 10) * 10 ** rng.randint(-8, 3))
    for _ in range(100):  # near .5 at the 7th digit
        vals.append(rng.randint(-(10**7), 10**7) / 10**7 + 5e-7)
    df = spark.createDataFrame([(v,) for v in vals], "v double").select(
        "v", F.round("v", 6).alias("r")
    )
    for r in df.collect():
        assert r["r"] == round_half_up(r["v"], 6), r["v"]


def test_round_half_up_matches_spark_round(spark):
    vals = [
        0.1234565, 0.12345649999, -0.1234565, 1.9999995, 2.0000005,
        0.0, -0.0, 123.4567894999, 5e-7, -5e-7, 1.5e-6,
    ]
    df = spark.createDataFrame([(v,) for v in vals], "v double").select(
        F.round("v", 6).alias("r")
    )
    got = [r["r"] for r in df.collect()]
    assert got == [round_half_up(v, 6) for v in vals]


# -- percolator hot scorer -------------------------------------------------


_DOCS = [
    (0, "data table join vector"),
    (1, "DATA data Data\tdata"),
    (2, "nothing relevant here"),
    (3, ""),
    (4, "vector   vector\nvector table"),
    (5, "the quick data fox"),
]


def _perc_parity(spark, p):
    hot = p.matches_rows(_DOCS)
    batch = spark.createDataFrame(_DOCS, "doc_id long, text string")
    cold = [r.asDict() for r in p.matches(batch).collect()]
    key = lambda r: (r["doc_id"], r["query_id"])  # noqa: E731
    assert sorted(map(key, hot)) == sorted(map(key, cold))
    cold_by = {key(r): r for r in cold}
    for h in hot:
        c = cold_by[key(h)]
        assert h["n_matched_terms"] == c["n_matched_terms"]
        assert h["bm25"] == pytest.approx(c["bm25"], abs=1e-9)


def test_matches_rows_parity_expr_form(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    p = Percolator(
        docs,
        [
            ("q_ab", ("data", "table"), 0.1),
            ("q_v", ("vector",), 0.0),
            ("q_hi", ("data",), 5.0),  # threshold nobody clears
        ],
    )
    assert not p._join_form
    _perc_parity(spark, p)


def test_matches_rows_parity_join_form(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    p = Percolator(
        docs,
        [("q_ab", ("data", "table"), 0.1), ("q_v", ("vector",), 0.0)],
        strategy="join",
    )
    assert p._join_form
    _perc_parity(spark, p)


def test_matches_rows_sees_registration(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    p = Percolator(docs, [("q_v", ("vector",), 0.0)])
    before = p.matches_rows(_DOCS)
    p.register(("q_new", ("quick", "fox"), 0.0))
    after = p.matches_rows(_DOCS)
    assert {r["query_id"] for r in after} >= {r["query_id"] for r in before}
    assert any(r["query_id"] == "q_new" for r in after)
    _perc_parity(spark, p)  # frozen-stats extension stayed consistent


def test_matches_rows_expr_order(spark):
    """Emission order is doc input order × query registration order —
    the expression form's deterministic order."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    p = Percolator(
        docs, [("qa", ("data",), 0.0), ("qb", ("vector",), 0.0)]
    )
    rows = p.matches_rows([(7, "vector data"), (3, "data")])
    assert [(r["doc_id"], r["query_id"]) for r in rows] == [
        (7, "qa"), (7, "qb"), (3, "qa")
    ]


def test_matches_rows_tokens_col_rejected(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    p = Percolator(
        docs, [("q", ("data",), 0.0)], tokens_col="toks"
    )
    with pytest.raises(ValueError, match="matches_rows scores text rows"):
        p.matches_rows(_DOCS)


def test_matches_rows_bm25_value(spark):
    """One hand-checked BM25 score (frozen stats over a 3-doc corpus)."""
    corpus = spark.createDataFrame(
        [(0, "a b c"), (1, "a a"), (2, "x")], "doc_id long, text string"
    )
    p = Percolator(corpus, [("q", ("a",), 0.0)])
    # n=3, sumdl=6, avgdl=2; term a: df=2
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    tf, dl = 2.0, 2.0
    norm = tf / (tf + 1.2 * (0.25 + 0.75 * (dl / 2.0)))
    expect = round_half_up(idf * norm, 6)
    got = p.matches_rows([(9, "a a")])
    assert len(got) == 1 and got[0]["bm25"] == expect


# -- durable artifact (save/load — the build-once/serve-forever split) -----


def _mode_rows(idx, qvec, seg_rows):
    """All four modes + the tag-filter primitive against one index."""
    allowed = idx.tag_allowed(["cat"], 0.3) if idx.tag_rows else None
    return {
        "whole": idx.whole(qvec, 7),
        "whole_filtered": idx.whole(qvec, 7, allowed=allowed),
        "segment": idx.segment(seg_rows, 5, candidate_cap=15),
        "hybrid": idx.hybrid(qvec, seg_rows, 5),
        "hybrid_filtered": idx.hybrid(qvec, seg_rows, 5, allowed=allowed),
        "tags": idx.tags(["cat", "fish"], 0.1, 10),
        "allowed": sorted(allowed) if allowed is not None else None,
    }


def test_save_load_roundtrip_spark_free(engine, tmp_path):
    """Build via Spark, save, load the .npz — the loaded copy must
    answer every mode with the exact rows of the live-built artifact
    (same float64 bits: the matrices round-trip verbatim), and loading
    itself must not touch the SparkSession (serving.py imports no
    pyspark; the subprocess test below proves the boot path end to
    end)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        HotSearchIndex,
    )

    hot = engine.hot(rebuild=True)
    path = str(tmp_path / "hot.npz")
    assert hot.save(path) == path
    loaded = HotSearchIndex.load(path)
    assert loaded.image_col == hot.image_col
    assert loaded.dim == hot.dim

    qvec, seg_rows = engine._encode_query(
        PAYLOADS[1], "q.png", "hybrid", dim=hot.dim,
        model_loader=lambda: None,
    )
    built, reloaded = _mode_rows(hot, qvec, seg_rows), _mode_rows(
        loaded, qvec, seg_rows
    )
    assert built == reloaded  # bit-exact: same resident float64 data


def test_load_boots_without_pyspark(engine, tmp_path):
    """The N-shard deployment story: a serving process boots one shard
    from the durable artifact with numpy alone. Run the load + a whole
    query in a subprocess where importing pyspark is IMPOSSIBLE
    (masked via a broken stub on sys.path ahead of site-packages) —
    if any code path touched Spark, the subprocess would die."""
    import json as _json
    import subprocess
    import sys

    hot = engine.hot()
    path = str(tmp_path / "shard.npz")
    hot.save(path)
    qvec, _ = engine._encode_query(
        PAYLOADS[0], "q.png", "whole", dim=hot.dim,
        model_loader=lambda: None,
    )
    mask = tmp_path / "mask"
    (mask / "pyspark").mkdir(parents=True)
    (mask / "pyspark" / "__init__.py").write_text(
        'raise ImportError("pyspark is masked in the serving process")'
    )
    import pathlib

    pkg_root = str(
        pathlib.Path(
            __import__(
                "data_feature_extraction_and_retrieval_pipeline_spark"
            ).__file__
        ).resolve().parent.parent
    )
    code = (
        "import json, sys\n"
        "from data_feature_extraction_and_retrieval_pipeline_spark"
        ".serving import HotSearchIndex\n"
        "idx = HotSearchIndex.load(sys.argv[1])\n"
        "q = json.loads(sys.argv[2])\n"
        "print(json.dumps(idx.whole(q, 5)))\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, path, _json.dumps(qvec)],
        capture_output=True, text=True, timeout=120,
        env={"PYTHONPATH": f"{mask}:{pkg_root}", "PATH": "/usr/bin:/bin"},
    )
    assert out.returncode == 0, out.stderr
    got = _json.loads(out.stdout)
    expect = [
        {k: (round(v, 12) if isinstance(v, float) else v) for k, v in r.items()}
        for r in hot.whole(qvec, 5)
    ]
    got = [
        {k: (round(v, 12) if isinstance(v, float) else v) for k, v in r.items()}
        for r in got
    ]
    assert got == expect


def test_sharded_from_paths_equals_single(engine, tmp_path):
    """save_shards → from_paths: the disk-booted sharded posture must
    merge to the single index's rows for every mode (the same
    equivalence the in-memory sharding pins)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        ShardedHotIndex,
    )

    hot = engine.hot()
    paths = ShardedHotIndex.from_hot(hot, 3).save_shards(
        str(tmp_path / "shards")
    )
    assert len(paths) == 3
    sharded = ShardedHotIndex.from_paths(paths)
    qvec, seg_rows = engine._encode_query(
        PAYLOADS[2], "q.png", "hybrid", dim=hot.dim,
        model_loader=lambda: None,
    )
    _assert_rows_equal(sharded.whole(qvec, 7), hot.whole(qvec, 7), 1e-12)
    _assert_rows_equal(
        sharded.segment(seg_rows, 5, candidate_cap=15),
        hot.segment(seg_rows, 5, candidate_cap=15), 1e-12,
    )
    _assert_rows_equal(
        sharded.hybrid(qvec, seg_rows, 5),
        hot.hybrid(qvec, seg_rows, 5), 1e-12,
    )
    assert sharded.tags(["cat", "fish"], 0.1, 10) == hot.tags(
        ["cat", "fish"], 0.1, 10
    )


def test_engine_hot_path_builds_then_boots(engine, spark, tmp_path):
    """Engine.hot(path=...): first call builds from the tables and
    saves; a DIFFERENT engine pointed at the same path serves the
    saved artifact, not its own tables — proof the boot read the disk
    copy."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        HotSearchIndex,
    )

    path = str(tmp_path / "engine-hot.npz")
    hot = engine.hot(rebuild=True, path=path)
    import os

    assert os.path.exists(path)

    dim = hot.dim
    other = Engine(
        spark.createDataFrame(
            [(999999, [0.0] * dim)],
            "image_id long, embedding array<double>",
        )
    )
    booted = other.hot(path=path)
    assert len(booted.image_ids) == len(hot.image_ids)  # not 1
    assert 999999 not in set(booted.image_ids.tolist())
    # rebuild=True with a path overwrites from the CURRENT tables
    rebuilt = other.hot(rebuild=True, path=path)
    assert len(rebuilt.image_ids) == 1
    assert len(HotSearchIndex.load(path).image_ids) == 1


# -- freshness (ingest → staleness signal → rebuild policy) ----------------


def test_ingest_staleness_and_auto_rebuild(spark):
    """The hot artifact is an immutable snapshot: after an ingest the
    engine KNOWS it is stale (hot_stale()), default policy keeps
    serving the snapshot (documented lambda split), and
    hot(rebuild='auto') refreshes so the new row becomes servable.
    serving_epoch moves at both steps — the response-cache version."""
    eng = Engine.from_sf_dir(spark, SF_DIR)
    hot0 = eng.hot()
    epoch0 = eng.serving_epoch
    assert not eng.hot_stale()
    qvec = [1.0] + [0.0] * (hot0.dim - 1)

    new_img = spark.createDataFrame(
        [(777777, qvec)], "image_id long, embedding array<double>"
    )
    eng.ingest(images=new_img)
    assert eng.hot_stale()
    assert eng.serving_epoch != epoch0
    # default policy: snapshot keeps serving (pre-ingest rows)
    assert eng.hot() is hot0
    assert 777777 not in {r["image_id"] for r in hot0.whole(qvec, 3)}
    # auto policy: stale ⇒ rebuild; the ingested row is now the top hit
    hot1 = eng.hot(rebuild="auto")
    assert hot1 is not hot0
    assert not eng.hot_stale()
    assert eng.hot(rebuild="auto") is hot1  # fresh ⇒ cached
    assert {r["image_id"] for r in hot1.whole(qvec, 1)} == {777777}


def test_hot_stale_probe_sees_external_growth(spark):
    """Table growth that bypasses ingest() (no epoch bump) is invisible
    to the cheap signal but caught by the row-count probe."""
    eng = Engine.from_sf_dir(spark, SF_DIR)
    hot0 = eng.hot()
    extra = spark.createDataFrame(
        [(888888, [0.0] * hot0.dim)], "image_id long, embedding array<double>"
    )
    eng.images = eng.images.unionByName(extra)  # external rebind
    assert not eng.hot_stale()  # epoch unchanged — cheap check blind
    assert eng.hot_stale(probe=True)  # count probe sees the growth


def test_save_load_float32_artifact(engine, tmp_path):
    """dtype="float32" artifact: half-width on disk and resident, and
    every mode's rows match the float64 tier at 1e-6 — the engine's
    rounded-score tolerance (the stored vectors are float32-quantized
    and scoring runs in float32, so bits differ below ~1e-7 relative;
    CLIP's native precision is float32 so no information is lost)."""
    import os

    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        HotSearchIndex,
    )

    hot = engine.hot(rebuild=True)
    p64 = str(tmp_path / "hot64.npz")
    p32 = str(tmp_path / "hot32.npz")
    hot.save(p64)
    hot.save(p32, dtype="float32")
    assert os.path.getsize(p32) < os.path.getsize(p64)

    loaded = HotSearchIndex.load(p32)
    assert loaded.image_mat.dtype == np.float32
    assert loaded.seg_mat is None or loaded.seg_mat.dtype == np.float32
    assert loaded.dim == hot.dim

    qvec, seg_rows = engine._encode_query(
        PAYLOADS[3], "q.png", "hybrid", dim=hot.dim,
        model_loader=lambda: None,
    )
    _assert_rows_equal(loaded.whole(qvec, 7), hot.whole(qvec, 7), 1e-6)
    _assert_rows_equal(
        loaded.segment(seg_rows, 5, candidate_cap=15),
        hot.segment(seg_rows, 5, candidate_cap=15), 1e-6,
    )
    _assert_rows_equal(
        loaded.hybrid(qvec, seg_rows, 5),
        hot.hybrid(qvec, seg_rows, 5), 1e-6,
    )
    # tags carry no vector math — identical rows either way
    assert loaded.tags(["cat", "fish"], 0.1, 10) == hot.tags(
        ["cat", "fish"], 0.1, 10
    )


def test_sharded_float32_from_paths(engine, tmp_path):
    """save_shards(dtype="float32") → from_paths: the disk-booted
    float32 sharded posture merges to the float64 single index's rows
    at the same 1e-6 tolerance."""
    from data_feature_extraction_and_retrieval_pipeline_spark.serving import (
        ShardedHotIndex,
    )

    hot = engine.hot()
    paths = ShardedHotIndex.from_hot(hot, 3).save_shards(
        str(tmp_path / "shards32"), dtype="float32"
    )
    sharded = ShardedHotIndex.from_paths(paths)
    qvec, seg_rows = engine._encode_query(
        PAYLOADS[0], "q.png", "hybrid", dim=hot.dim,
        model_loader=lambda: None,
    )
    _assert_rows_equal(sharded.whole(qvec, 7), hot.whole(qvec, 7), 1e-6)
    _assert_rows_equal(
        sharded.hybrid(qvec, seg_rows, 5),
        hot.hybrid(qvec, seg_rows, 5), 1e-6,
    )
