"""Property-based tests (hypothesis) for the column-function layer —
each property checks a Spark expression against a plain-Python
reference implementation on generated inputs, batched into one
DataFrame per example to keep job counts low.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from data_feature_extraction_and_retrieval_pipeline_spark.functions import text as X
from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
    vectors as V,
)

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

token = st.text(alphabet="abcxyz0", min_size=1, max_size=4)


def _py_shingles(tokens: list[str], n: int = 3) -> list[str]:
    if len(tokens) >= n:
        out, seen = [], set()
        for i in range(len(tokens) - n + 1):
            s = " ".join(tokens[i : i + n])
            if s not in seen:
                seen.add(s)
                out.append(s)
        return out
    return [" ".join(tokens)]


@given(st.lists(st.lists(token, min_size=0, max_size=12), min_size=1, max_size=8))
@settings(**SETTINGS)
def test_word_shingles_matches_python(spark, token_lists):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_lists)], "i: long, toks: array<string>"
    )
    got = {
        r["i"]: list(r["sh"])
        for r in df.select("i", X.word_shingles(F.col("toks"), 3).alias("sh")).collect()
    }
    for i, toks in enumerate(token_lists):
        assert got[i] == _py_shingles(toks, 3), toks


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-10, max_value=10, allow_nan=False, width=32),
            min_size=4,
            max_size=4,
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_l2_normalize_unit_norm(spark, vecs):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)], ["i", "v"])
    rows = df.select(
        "i",
        V.l2_norm(V.l2_normalize(F.col("v"))).alias("n"),
        V.l2_norm(F.col("v")).alias("orig"),
    ).collect()
    for r in rows:
        if r["orig"] > 0:
            assert abs(r["n"] - 1.0) < 1e-9
        else:
            assert r["n"] == 0.0


@given(
    st.lists(
        st.tuples(
            st.lists(st.floats(-5, 5, allow_nan=False, width=32), min_size=3, max_size=3),
            st.lists(st.floats(-5, 5, allow_nan=False, width=32), min_size=3, max_size=3),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_dot_matches_python(spark, pairs):
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pairs)], ["i", "a", "b"]
    )
    got = {r["i"]: r["d"] for r in df.select("i", V.dot("a", "b").alias("d")).collect()}
    for i, (a, b) in enumerate(pairs):
        # float32 storage, double accumulation — same as the engine
        expected = 0.0
        import numpy as np

        for x, y in zip(np.array(a, dtype=np.float32), np.array(b, dtype=np.float32)):
            expected += float(x) * float(y)
        assert math.isclose(got[i], expected, rel_tol=1e-12, abs_tol=1e-12)


@given(st.lists(st.sampled_from(["NA", "", "  ", "Konum Yok", "ok", "data x"]), min_size=1, max_size=12))
@settings(**SETTINGS)
def test_sentinel_cleanse_semantics(spark, cells):
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], ["i", "c"])
    got = {
        r["i"]: r["out"]
        for r in df.select("i", X.sentinels_to_null("c").alias("out")).collect()
    }
    for i, c in enumerate(cells):
        should_null = (
            c.strip() == "" or any(s in c for s in ("NA", "Konum Yok", "Konum İşaretlenmedi"))
        )
        assert (got[i] is None) == should_null, (c, got[i])


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=30),
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=0, max_size=30),
)
@settings(**SETTINGS)
def test_asof_join_matches_python(spark, left_ts, right_ts):
    """As-of join vs brute-force reference: latest right ≤ left, same key."""
    from datetime import datetime, timedelta

    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        asof_join,
    )

    base = datetime(2024, 1, 1)
    left = spark.createDataFrame(
        [(1, base + timedelta(seconds=s), i) for i, s in enumerate(left_ts)],
        ["key", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [(1, base + timedelta(seconds=s), float(s)) for s in right_ts],
        ["key", "ts", "val"],
    ) if right_ts else spark.createDataFrame([], "key: long, ts: timestamp, val: double")

    out = {r["lid"]: r["asof_val"] for r in asof_join(left, right, key="key", right_payload=["val"]).collect()}
    for i, s in enumerate(left_ts):
        prior = [t for t in right_ts if t <= s]
        expected = float(max(prior)) if prior else None
        assert out[i] == expected, (s, sorted(right_ts))


def _py_portable_token_hash(tok: str, base: int = 31, mod: int = 1_000_000_007) -> int:
    h = 0
    for ch in tok:
        h = (h * base + ord(ch)) % mod
    return h


def _py_portable_shingles(tokens: list[str], n: int = 3,
                          b: int = 1_000_003, mod: int = 1_000_000_007) -> list[int]:
    th = [_py_portable_token_hash(t) for t in tokens]
    if not th:
        return []
    if len(th) >= n:
        out = []
        for i in range(len(th) - n + 1):
            h = 0
            for x in th[i : i + n]:
                h = (h * b + x) % mod
            out.append(h)
        return out
    h = 0
    for x in th:
        h = (h * b + x) % mod
    return [h]


@given(st.lists(st.text(alphabet="abc xyz0", min_size=0, max_size=24),
                min_size=1, max_size=8))
@settings(**SETTINGS)
def test_portable_shingle_hashes_match_python(spark, texts):
    """The oracle-certifiable hash arithmetic (operators/dedup.py) is
    checked against a plain-Python model on arbitrary inputs — the
    same arithmetic the DuckDB oracle replays, so this property covers
    what the fixed-corpus driver check cannot: adversarial whitespace,
    short docs, empty docs."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import (
        portable_shingle_hashes,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i: long, text: string"
    )
    got = {
        r["i"]: list(r["sh"])
        for r in df.select(
            "i", portable_shingle_hashes(F.col("text"), 3).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        toks = [x for x in t.lower().split() if x]
        assert got[i] == _py_portable_shingles(toks, 3), t


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-1, max_value=1, allow_nan=False, width=32),
            min_size=4, max_size=4,
        ),
        min_size=1, max_size=6,
    )
)
@settings(**SETTINGS)
def test_sims_array_strategies_agree(spark, rows):
    """The two sims_array execution strategies (Arrow numpy matmul vs
    JVM HOF dots) must agree within float tolerance — the volume
    policy may pick either for the same query."""
    queries = [[1.0, 0.0, -1.0, 0.5], [0.25, 0.25, 0.25, 0.25]]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "i: long, v: array<double>",
    )
    a = {
        r["i"]: list(r["s"])
        for r in df.select(
            "i", V.sims_array("v", queries, arrow=True).alias("s")
        ).collect()
    }
    b = {
        r["i"]: list(r["s"])
        for r in df.select(
            "i", V.sims_array("v", queries, arrow=False).alias("s")
        ).collect()
    }
    for i in a:
        for x, y in zip(a[i], b[i]):
            assert math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)


# ---------------------------------------------------------------------------
# Curation operators (operators/curation.py)
# ---------------------------------------------------------------------------

def _py_chunks(tokens: list[str], window: int, stride: int):
    """Reference chunking rule: starts at k*stride, k in 0..n_chunks-1,
    n_chunks = 1 + ceil(max(n - window, 0) / stride)."""
    n = len(tokens)
    if n == 0:
        return []
    n_chunks = 1 + max(0, -((n - window) // -stride))
    return [tokens[k * stride : k * stride + window] for k in range(n_chunks)]


@given(
    st.lists(st.lists(token, min_size=0, max_size=20), min_size=1, max_size=6),
    st.integers(min_value=1, max_value=6),
    st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_chunk_windows_matches_python(spark, token_lists, window, extra):
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import curation

    stride = min(window, extra)
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(token_lists)],
        "doc_id: long, text: string",
    )
    rows = curation.chunk_windows(df, window=window, stride=stride).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, {})[r.chunk_idx] = r.n_tokens
    for i, toks in enumerate(token_lists):
        expected = _py_chunks(toks, window, stride)
        chunks = got.get(i, {})
        assert len(chunks) == len(expected), (toks, window, stride)
        for k, ch in enumerate(expected):
            assert chunks[k] == len(ch), (toks, window, stride, k)
        # every token position covered by at least one chunk
        covered = set()
        for k, ch in enumerate(expected):
            covered |= set(range(k * stride, k * stride + len(ch)))
        assert covered == set(range(len(toks))) or not toks


@given(
    # full int64 range incl. negatives and snowflake-scale ids: the
    # folded affine arithmetic must never wrap (regression for the
    # signed-% / overflow bug)
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62),
        min_size=1, max_size=50, unique=True,
    ),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
)
@settings(**SETTINGS)
def test_mixture_sample_threshold_semantics(spark, ids, thr_a, thr_b):
    """Selection is exactly {id : hash(id) mod 1000 < rate*1000}, so a
    higher rate is a superset and the Spark selection matches the
    arithmetic computed in plain Python."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import curation
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import _PORT_P

    lo, hi = sorted((thr_a, thr_b))
    df = spark.createDataFrame([(i, "s") for i in ids], "doc_id: long, source: string")
    got_lo = {r.doc_id for r in curation.mixture_sample(df, {}, lo / 1000).collect()}
    got_hi = {r.doc_id for r in curation.mixture_sample(df, {}, hi / 1000).collect()}
    expect_lo = {i for i in ids if (i * curation._MIX_A + curation._MIX_C) % _PORT_P % 1000 < lo}
    expect_hi = {i for i in ids if (i * curation._MIX_A + curation._MIX_C) % _PORT_P % 1000 < hi}
    assert got_lo == expect_lo and got_hi == expect_hi
    assert got_lo <= got_hi


@given(
    st.lists(
        st.lists(st.floats(-2, 2, allow_nan=False, width=32), min_size=4, max_size=4),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_portable_pq_encode_matches_python(spark, vecs):
    """The pure-Catalyst portable PQ encode equals a plain-Python
    replay on ARBITRARY float32 vectors (not just the fixtures): same
    left-to-right double accumulation, same first-max tie-break —
    the property the DuckDB oracle's bit-for-bit replay rests on."""
    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.similarity import (
        portable_pq_codebooks,
        pq_encode_catalyst,
    )

    books = portable_pq_codebooks(m=2, k=4, d=2)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: list(r["pq_code"])
        for r in pq_encode_catalyst(df, books).collect()
    }
    for i, v in enumerate(vecs):
        v32 = [float(np.float32(x)) for x in v]
        codes = []
        for s in range(2):
            sims = []
            for cvec in books[s]:
                acc = 0.0
                for j in range(2):
                    acc += v32[s * 2 + j] * cvec[j]
                sims.append(acc)
            codes.append(sims.index(max(sims)))
        assert got[i] == codes, (i, got[i], codes)


# ---------------------------------------------------------------------
# Round-5 additions: properties for the round-4/5 operators
# ---------------------------------------------------------------------

_WORDS = ["the", "of", "to", "Cat", "dog9", "x!!", "Aa", "42", "zq"]
doc_text = st.one_of(
    st.none(),
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join),
)


def _py_logit(text, weights=(-1.25, 2.5, 1.5, 0.875)):
    import re

    c = text if text is not None else ""
    toks = [t for t in re.split(r"\s+", c.lower()) if t]
    stop = {"the", "a", "an", "and", "of", "to", "in", "is", "it", "that"}
    length_sig = min(len(c) / 200.0, 1.0)
    alpha = (
        len(re.sub(r"[^A-Za-z ]", "", c)) / len(c) if len(c) > 0 else 0.0
    )
    stop_ratio = (
        sum(1 for t in toks if t in stop) / len(toks) if toks else 0.0
    )
    stop_sig = min(stop_ratio * 10.0, 1.0)
    w0, w1, w2, w3 = weights
    return w0 + w1 * length_sig + w2 * alpha + w3 * stop_sig


@given(st.lists(doc_text, min_size=1, max_size=10))
@settings(**SETTINGS)
def test_quality_classifier_matches_python(spark, texts):
    """The linear gate's logit equals the same left-to-right float
    expression in plain Python (identical op order => identical IEEE
    result), NULL text scores as empty text, and keep is consistent
    with the logit/threshold."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.curation import (
        quality_classifier,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    got = {
        r["doc_id"]: (r["logit"], r["keep"])
        for r in quality_classifier(df, threshold=1.0).collect()
    }
    for i, t in enumerate(texts):
        want = round(_py_logit(t), 6)
        assert abs(got[i][0] - want) <= 1e-9, (t, got[i][0], want)
        assert got[i][1] == (got[i][0] >= 1.0)


@given(
    st.lists(doc_text, min_size=1, max_size=8),
    st.lists(doc_text, min_size=0, max_size=8),
    st.booleans(),
)
@settings(**SETTINGS)
def test_incremental_exact_filter_matches_python(spark, batch, corpus, portable):
    """Batch-vs-corpus dedup drops exactly the arrivals whose content
    identity exists in the corpus, where NULL ≡ NULL and NULL ≢ ''
    (the exact_dedup agreement contract) — on both the xxhash and the
    portable fingerprint paths."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.dedup import (
        incremental_exact_filter,
    )

    bdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id: long, text: string"
    )
    cdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(corpus)],
        "doc_id: long, text: string",
    )
    got = sorted(
        r["doc_id"]
        for r in incremental_exact_filter(
            bdf, cdf, portable=portable
        ).collect()
    )
    seen = {(t is None, t or "") for t in corpus}
    want = sorted(
        i for i, t in enumerate(batch) if (t is None, t or "") not in seen
    )
    assert got == want, (batch, corpus, got, want)


ts_int = st.integers(min_value=0, max_value=40)


@given(
    st.lists(st.tuples(st.integers(0, 2), ts_int), min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 2), ts_int), min_size=1, max_size=10),
)
@settings(**SETTINGS)
def test_interval_join_matches_python(spark, left_rows, right_rows):
    """interval_join emits exactly the same-key pairs whose right ts
    falls in [lts - lower, lts + upper] — ALL in-window matches, the
    nested-loop reference computed row-by-row in Python."""
    from datetime import datetime, timedelta

    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        interval_join,
    )

    base = datetime(2024, 1, 1)
    ldf = spark.createDataFrame(
        [(k, base + timedelta(seconds=s)) for k, s in left_rows],
        "user_id: int, ts: timestamp",
    )
    rdf = spark.createDataFrame(
        [(k, base + timedelta(seconds=s)) for k, s in right_rows],
        "user_id: int, ts: timestamp",
    )
    got = sorted(
        (r["user_id"], r["lts"], r["rts"])
        for r in interval_join(
            ldf, rdf, key="user_id", lower_seconds=5, upper_seconds=3
        ).collect()
    )
    want = sorted(
        (lk, base + timedelta(seconds=ls), base + timedelta(seconds=rs))
        for lk, ls in left_rows
        for rk, rs in right_rows
        if lk == rk and ls - 5 <= rs <= ls + 3
    )
    assert got == want, (left_rows, right_rows)


def _round6(x: float) -> float:
    """Spark F.round HALF_UP on the shortest decimal repr of the
    double — Decimal(repr(x)) matches BigDecimal.valueOf(double)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


@given(
    st.lists(
        st.one_of(st.none(), st.lists(token, min_size=0, max_size=10)),
        min_size=1,
        max_size=10,
    ),
    st.lists(token, min_size=1, max_size=3, unique=True),
)
@settings(**SETTINGS)
def test_bm25_matches_python(spark, docs, terms):
    """bm25_topk vs a plain-Python Lucene-8 BM25 on generated corpora:
    same left-to-right per-term accumulation, NULL text = empty doc
    (counted in N, dl 0), only matching docs returned, ties broken on
    (rounded score desc, id)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        bm25_topk,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d) if d is not None else None) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = [
        (r.doc_id, r.n_matched_terms, r.bm25)
        for r in bm25_topk(df, terms, top_k=len(docs)).collect()
    ]

    toks = [d if d is not None else [] for d in docs]
    n = len(toks)
    sumdl = sum(len(t) for t in toks)
    dfc = [sum(1 for t in toks if q in t) for q in terms]
    want = []
    for i, t in enumerate(toks):
        tfs = [t.count(q) for q in terms]
        matched = sum(1 for tf in tfs if tf)
        if not matched:
            # a matching doc implies sumdl >= 1; skipping first keeps
            # the reference free of the 0/0 the Spark filter never hits
            continue
        score = 0.0
        for tf, dfq in zip(tfs, dfc):
            idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            score = score + idf * (
                tf / (tf + 1.2 * (0.25 + 0.75 * (len(t) / (sumdl / n))))
            )
        want.append((i, matched, _round6(score)))
    want.sort(key=lambda r: (-r[2], r[0]))
    assert got == want, (docs, terms)


@given(
    st.lists(
        st.one_of(st.none(), st.lists(token, min_size=0, max_size=8)),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_tfidf_keywords_matches_python(spark, docs):
    """tfidf_keywords vs plain Python: length-normalized tf · smoothed
    idf, N counts every doc (NULL text included), per-doc top-2 ranked
    by (rounded score desc, term asc)."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        curation,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d) if d is not None else None) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = sorted(
        (r.doc_id, r.rank, r.term, r.tfidf)
        for r in curation.tfidf_keywords(df, top_n=2).collect()
    )

    toks = [d if d is not None else [] for d in docs]
    n = len(toks)
    dfc: dict[str, int] = {}
    for t in toks:
        for term in set(t):
            dfc[term] = dfc.get(term, 0) + 1
    want = []
    for i, t in enumerate(toks):
        if not t:
            continue
        dl = len(t)
        scored = sorted(
            (
                -_round6((t.count(term) / dl) * math.log((n + 1) / (dfc[term] + 1))),
                term,
            )
            for term in set(t)
        )
        for rank, (neg, term) in enumerate(scored[:2], start=1):
            want.append((i, rank, term, -neg))
    assert got == sorted(want), docs


@given(
    st.lists(
        st.one_of(st.none(), st.lists(token, min_size=0, max_size=8)),
        min_size=1,
        max_size=8,
    ),
    st.lists(token, min_size=1, max_size=2, unique=True),
    st.floats(min_value=0.0, max_value=1.5, allow_nan=False),
)
@settings(**SETTINGS)
def test_percolate_matches_python(spark, docs, terms, min_score):
    """streaming.percolate vs plain Python on generated corpora: the
    threshold compares the RAW left-to-right accumulation (bit-
    identical), matches require >= 1 term hit, NULL text is an empty
    doc counted in N."""
    from data_feature_extraction_and_retrieval_pipeline_spark.streaming import (
        StandingQuery,
        bm25_stats,
        percolate,
    )

    df = spark.createDataFrame(
        [(i, " ".join(d) if d is not None else None) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    stats = bm25_stats(df, terms)
    q = StandingQuery("q", tuple(terms), min_score)
    got = sorted(
        (r.doc_id, r.query_id, r.n_matched_terms, r.bm25)
        for r in percolate(df, [q], stats, terms).collect()
    )

    toks = [d if d is not None else [] for d in docs]
    n = len(toks)
    sumdl = sum(len(t) for t in toks)
    dfc = [sum(1 for t in toks if w in t) for w in terms]
    want = []
    for i, t in enumerate(toks):
        tfs = [t.count(w) for w in terms]
        matched = sum(1 for tf in tfs if tf)
        if not matched:
            continue
        score = 0.0
        for tf, dfq in zip(tfs, dfc):
            idf = math.log(1 + (n - dfq + 0.5) / (dfq + 0.5))
            score = score + idf * (
                tf / (tf + 1.2 * (0.25 + 0.75 * (len(t) / (sumdl / n))))
            )
        if score >= min_score:
            want.append((i, "q", matched, _round6(score)))
    assert got == sorted(want), (docs, terms, min_score)


def _py_funnel(events, steps, within_us=None):
    """Plain-Python reference: greedy first-touch over the
    time-sorted (t, type) list (ties on t resolved by the array_sort
    struct order: (t, y) lexicographic, matching the operator's
    sorted fold)."""
    # the fold evaluates EVERY step's condition per event (struct of
    # k WHENs), so mirror that: no early break — one event may anchor
    # step k reading the prev anchor set by an EARLIER event only
    # (conditions use the accumulator, and t > prev is strict)
    anchors = [None] * len(steps)
    for t, y in sorted(events):
        for i, s in enumerate(steps):
            if anchors[i] is not None:
                continue
            if i == 0:
                if y == s:
                    anchors[i] = t
            elif (
                anchors[i - 1] is not None
                and y == s
                and t > anchors[i - 1]
                and (within_us is None or t <= anchors[i - 1] + within_us)
            ):
                anchors[i] = t
    depth = 0
    for i, a in enumerate(anchors):
        if a is not None:
            depth = i + 1
        else:
            break
    # depth counts the contiguous filled prefix (later anchors can
    # only fill when the previous one is set, so it IS contiguous)
    return anchors, depth


@given(
    st.lists(  # one inner list of (minute, type-index) per user
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=200),
                st.integers(min_value=0, max_value=3),
            ),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=6,
    ),
    st.sampled_from([None, 30, 90]),
)
@settings(**SETTINGS)
def test_funnel_matches_python(spark, user_events, within_min):
    """funnel() (incl. the within_seconds deadline) against a plain
    greedy-fold reference on random timelines — duplicate timestamps,
    repeated types, empty users, steps in any arrival order."""
    from data_feature_extraction_and_retrieval_pipeline_spark.operators.temporal import (
        funnel,
    )

    types = ["view", "click", "purchase", "other"]
    steps = ["view", "click", "purchase"]
    base = 1_704_067_200_000_000
    mins = 60 * 1_000_000
    rows = [
        (u, (base + m * mins) // 1_000_000, types[ty])
        for u, evs in enumerate(user_events)
        for m, ty in evs
    ]
    if not rows:
        return
    df = spark.createDataFrame(
        rows, "user_id long, sec long, event_type string"
    ).select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "event_type"
    )
    got = {
        r.user_id: ([r.step1_us, r.step2_us, r.step3_us], r.depth)
        for r in funnel(
            df,
            steps,
            within_seconds=within_min * 60 if within_min else None,
        ).collect()
    }
    for u, evs in enumerate(user_events):
        if not evs:
            continue  # no rows -> no output group
        pyev = [(base + m * mins, types[ty]) for m, ty in evs]
        want = _py_funnel(
            pyev, steps,
            within_us=within_min * 60 * 1_000_000 if within_min else None,
        )
        assert got[u] == want, (u, evs, got[u], want)


# ---------------------------------------------------------------------------
# Corpus-statistics operators (round-10 rebuilds): tf-weighted unigram
# NLL and tf-idf keywords vs plain-Python references
# ---------------------------------------------------------------------------


def _py_unigram(docs: dict[int, list[str]]):
    """(id -> (n_tokens, avg_nll)) under the corpus unigram model."""
    from collections import Counter

    freq = Counter(t for toks in docs.values() for t in toks)
    total = sum(freq.values())
    out = {}
    for i, toks in docs.items():
        if not toks:
            continue  # token-less docs vanish at the explode
        nll = [-math.log(freq[t] / total) for t in toks]
        out[i] = (len(toks), sum(nll) / len(nll))
    return out


@given(
    st.lists(st.lists(token, min_size=0, max_size=10), min_size=1, max_size=6)
)
@settings(**SETTINGS)
def test_unigram_logprob_matches_python(spark, token_lists):
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        curation,
    )

    docs = {i: toks for i, toks in enumerate(token_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id: long, text: string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_nll"])
        for r in curation.unigram_logprob(df).collect()
    }
    want = _py_unigram(docs)
    assert set(got) == set(want)
    for i, (n, nll) in want.items():
        assert got[i][0] == n
        assert math.isclose(got[i][1], nll, rel_tol=1e-9), (i, docs[i])


def _py_tfidf_top3(docs: dict[int, list[str]]):
    """(id -> [(rank, term, tfidf)]) with the operator's exact formula
    and (rounded score desc, term asc) ordering."""
    from collections import Counter

    n_docs = len(docs)
    dfreq = Counter()
    tfs = {}
    for i, toks in docs.items():
        tf = Counter(toks)
        tfs[i] = tf
        dfreq.update(tf.keys())
    out = {}
    for i, tf in tfs.items():
        dl = sum(tf.values())
        scored = [
            (
                round(
                    (c / dl) * math.log((n_docs + 1) / (dfreq[t] + 1)), 6
                ),
                t,
            )
            for t, c in tf.items()
        ]
        scored.sort(key=lambda p: (-p[0], p[1]))
        out[i] = [
            (r + 1, t, s) for r, (s, t) in enumerate(scored[:3])
        ]
    return out


@given(
    st.lists(st.lists(token, min_size=1, max_size=10), min_size=1, max_size=6)
)
@settings(**SETTINGS)
def test_tfidf_keywords_matches_python(spark, token_lists):
    from data_feature_extraction_and_retrieval_pipeline_spark.operators import (
        curation,
    )

    docs = {i: toks for i, toks in enumerate(token_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id: long, text: string",
    )
    got: dict[int, list] = {}
    for r in curation.tfidf_keywords(df, top_n=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tfidf"])
        )
    for i in got:
        got[i].sort()
    want = _py_tfidf_top3(docs)
    assert set(got) == set(want)
    for i in want:
        assert [(r, t) for r, t, _ in got[i]] == [
            (r, t) for r, t, _ in want[i]
        ], (i, docs[i])
        for (_, _, g), (_, _, w) in zip(got[i], want[i]):
            assert math.isclose(g, w, rel_tol=0, abs_tol=1.5e-6), (i, docs[i])


@given(
    st.integers(min_value=1, max_value=40),   # width
    st.integers(min_value=1, max_value=24),   # height
    st.integers(min_value=0, max_value=2),    # 0 gray, 1 rgb, 2 rgb-for-gray
    st.integers(min_value=0, max_value=2**31 - 1),  # pixel seed
    st.lists(st.integers(min_value=0, max_value=4), min_size=24, max_size=24),
)
@settings(**SETTINGS)
def test_png_codec_roundtrip_property(w, h, kind, seed, filter_sched):
    """Vendored PNG encode→decode is the identity for arbitrary sizes,
    pixel contents, and per-row filter schedules (every unfilter path:
    None/Sub/Up/Average/Paeth) — pure-Python property, no Spark."""
    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    rng = np.random.default_rng(seed)
    shape = (h, w) if kind == 0 else (h, w, 3)
    arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
    filters = [filter_sched[y % len(filter_sched)] for y in range(h)]
    out = imaging.png_decode(imaging.png_encode(arr, filters=filters))
    assert out.shape == arr.shape
    assert np.array_equal(out, arr)


@given(
    st.integers(min_value=9, max_value=64),
    st.integers(min_value=8, max_value=48),
    st.integers(min_value=0, max_value=2**31 - 1),
)
@settings(**SETTINGS)
def test_box_resize_matches_float_reference(w, h, seed):
    """The fixed-point BOX resample agrees with a float-space box
    average to within 1 grey level on arbitrary sizes (the fixed-point
    quantization bound), and EXACTLY equals round-half-up of the
    two-pass integer mean when the boxes align (w,h multiples of 9,8)."""
    import numpy as np

    from data_feature_extraction_and_retrieval_pipeline_spark.functions import (
        imaging,
    )

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    got = imaging.box_resize(arr, 9, 8).astype(np.int64)

    # float reference with the same coefficient geometry, two passes
    def ref_axis(img, out_size):
        out = np.zeros((img.shape[0], out_size))
        for xx, (xmin, kk) in enumerate(imaging._box_coeffs(img.shape[1], out_size)):
            ww = kk.astype(np.float64) / (1 << imaging._PRECISION_BITS)
            out[:, xx] = img[:, xmin:xmin + len(kk)].astype(np.float64) @ ww
        return out

    ref = ref_axis(ref_axis(arr, 9).round().clip(0, 255).T, 8).T.round()
    assert np.abs(got - ref).max() <= 1, (w, h)
    if w % 9 == 0 and h % 8 == 0:
        bw, bh = w // 9, h // 8
        a = arr.astype(np.int64)
        horiz = (a.reshape(h, 9, bw).sum(axis=2) + bw // 2) // bw
        vert = (horiz.reshape(8, bh, 9).sum(axis=1) + bh // 2) // bh
        assert np.array_equal(got, vert), (w, h)
