"""Corpus-curation operators for training-data pipelines (round-3
extensions of the LLM-data suite: SURVEY.md §6 scope, alongside
operators/dedup.py's near-dup/contamination passes).

Three map-heavy passes every large-scale pre-training pipeline runs
between raw ingest and tokenization:

- ``chunk_windows``     — overlapping token-window chunking (context-
                          length packing prep). Narrow, map-only: no
                          shuffle at any scale; output is linear in
                          token count.
- ``mixture_sample``    — deterministic stratified mixture sampling
                          (per-source rates, the "data mixture" knob).
                          A pure hash predicate: reproducible across
                          runs/engines, no RNG state, map-only.
- ``unigram_logprob``   — corpus-unigram negative-log-likelihood
                          scoring (the CCNet-style LM quality proxy,
                          one order below a real KenLM): one vocab
                          aggregation + one token-level join.

All three are pure Catalyst expression pipelines (no Python workers),
and every hash/score is portable arithmetic the DuckDB oracle replays
exactly (functions/text.py::portable_token_hashes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import text as X
from .dedup import _PORT_B, _PORT_P

# Mixture-sample hash family: first affine pair of the portable MinHash
# family (dedup._PORT_A/_C), hardcoded so oracle SQL embeds the same
# literals.
_MIX_A = 387420489
_MIX_C = 12345


def chunk_windows(
    df: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Overlapping token-window chunks: (id, chunk_idx, n_tokens,
    chunk_fp) with chunk k covering tokens [k·stride, k·stride+window).

    The standard context-window packing prep: documents longer than
    ``window`` tokens split into ``1 + ceil((n-window)/stride)`` chunks
    (the last may be short); shorter documents yield one chunk; empty
    documents none. ``chunk_fp`` folds the chunk's portable per-token
    hashes (``fold(acc·B + tok_hash) mod P``) — a content fingerprint
    for downstream chunk-level dedup that any BIGINT SQL engine
    reproduces.

    Scale: map-only (tokenize → posexplode over a computed chunk
    count → slice). No shuffle, no state; output rows ≈ corpus tokens
    / stride, each carrying a fingerprint instead of text, so the
    chunk index is a fraction of corpus bytes. ``carry_cols`` projects
    row metadata (shard keys, split labels) through the explode so
    downstream passes never join back to the corpus.
    """
    assert window >= 1 and 1 <= stride <= window
    carry = [F.col(c) for c in carry_cols]
    toks = X.tokens(F.col(text_col))
    base = df.select(F.col(id_col), *carry, toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    n = F.size("__toks")
    n_chunks = (
        F.lit(1)
        + F.greatest(
            F.ceil((n - F.lit(window)) / F.lit(float(stride))), F.lit(0)
        )
    ).cast("int")
    chunked = base.select(
        F.col(id_col),
        *carry,
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        F.col("__toks"),
    )
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_idx") * stride + 1, window
    )
    fp = F.aggregate(
        X.portable_token_hashes(chunk),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(_PORT_B) + h) % F.lit(_PORT_P),
    )
    return chunked.select(
        F.col(id_col),
        *carry,
        "chunk_idx",
        F.size(chunk).alias("n_tokens"),
        fp.alias("chunk_fp"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 1.0,
    stratum_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified mixture sampling: keep a row iff
    ``(id·A + C) mod P mod 1000 < rate(stratum)·1000``.

    The training-mixture knob (sample web text at 10%, books at 100%,
    …) as a pure hash predicate: no RNG state, identical selection on
    every run and engine, and membership is decidable per-row — a
    map-only filter that composes with any downstream pass. Rates
    quantize to 1/1000.

    Scale: the predicate is one multiply-mod per row; the stratum
    lookup is a CASE over a handful of literals (broadcast-free).
    """
    # fold the id into [0, P) BEFORE the affine step: (id mod P)·A + C
    # stays < 2^59, so the arithmetic never wraps int64 for ANY id
    # (snowflake-scale or negative), and equals (id·A + C) mod P for
    # the common nonnegative-id case. pmod keeps the residue
    # nonnegative where % would keep the dividend's sign.
    sel = (
        F.pmod(F.pmod(F.col(id_col), _PORT_P) * _MIX_A + _MIX_C, _PORT_P)
        % 1000
    )
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(stratum_col) == k
        thr = F.lit(int(round(v * 1000)))
        rate = F.when(cond, thr) if rate is None else rate.when(cond, thr)
    thr_col = (
        rate.otherwise(F.lit(int(round(default_rate * 1000))))
        if rate is not None
        else F.lit(int(round(default_rate * 1000)))
    )
    return df.filter(sel < thr_col)


def pack_bins(
    chunks: DataFrame,
    capacity: int,
    shard_col: str,
    order_cols: tuple[str, ...] = ("doc_id", "chunk_idx"),
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Shard-local sequence packing plan: assign chunks to fixed-
    capacity context bins by running token offset — chunk c lands in
    ``bin = floor(offset(c) / capacity)`` where offset is the
    cumulative token count of earlier chunks in the shard's
    deterministic order.

    The loader-side "sequence packing" step made declarative: bins are
    decided by arithmetic on a running sum, not a sequential first-fit
    loop, so the same layout is reproducible on any engine and any
    worker can compute its own shard's plan independently.

    Scale: ONE shuffle partitioning by shard; the window sort is
    shard-local (shards are loader units, bounded by construction —
    the analogue of one output file). Returns one row per (shard,
    bin): chunk and token totals.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(shard_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return (
        chunks.withColumn(
            "bin_id", F.floor(offset / F.lit(float(capacity)))
        )
        .groupBy(shard_col, "bin_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(tokens_col).alias("token_total"),
        )
    )


def unigram_vocab(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The corpus unigram model — (tok, c, total) — as a standalone
    frame: LANGUAGE-MODEL INDEX METADATA (Lucene keeps exactly these
    term statistics in segment metadata; a KenLM is this table with
    backoff). Persist it (indexes.materialized) and pass to
    :func:`unigram_logprob` as ``vocab_df`` so per-query broadcast
    builds collect the resident copy instead of re-aggregating the
    corpus."""
    from pyspark.sql import Window as _W

    tf = (
        df.select(
            F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("tok")
        )
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("__tf"))
    )
    freq = tf.groupBy("tok").agg(F.sum("__tf").alias("c"))
    return freq.withColumn("total", F.sum("c").over(_W.partitionBy()))


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab: bool = True,
    include_empty: bool = False,
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Corpus-unigram NLL quality score: (id, n_tokens, avg_nll) where
    ``avg_nll = mean(-ln(count(tok)/total_tokens))`` over the
    document's tokens — the CCNet-style "perplexity proxy" quality
    filter (low = in-distribution text, high = gibberish/rare-token
    soup).

    Scale: pass 1 aggregates the vocabulary (one shuffle on token,
    map-side combine collapses to vocab cardinality — Heaps-law
    sublinear in corpus size); pass 2 joins tokens back to their
    frequencies. ``broadcast_vocab=True`` broadcasts the frequency
    table (right for natural-language vocabularies, ~millions of rows
    even at 100 TB); set False to shuffle-join when the token domain
    is unbounded (code, URLs).

    Token-less documents vanish at the explode, so by default they
    have NO output row — a downstream ``avg_nll <= tau`` keep-join
    would silently drop them. ``include_empty=True`` re-attaches them
    as (id, n_tokens=0, avg_nll=null) so the caller decides their
    fate explicitly.
    """
    # One corpus explode feeds everything: the (id, tok) term-frequency
    # aggregate is the shared subtree — the vocabulary re-aggregates it
    # by token (ReusedExchange picks up the tf exchange), and the
    # scoring join runs at tf-level (one row per DISTINCT (id, tok))
    # instead of token-instance level. The per-document mean is the
    # tf-weighted form Σ tf·(−ln(c/total)) / Σ tf — mathematically the
    # instance mean (each distinct token contributes tf identical
    # instances). Previously the corpus was exploded twice and the
    # frequency join ran per token instance — measured ~2× slower.
    tf = (
        df.select(
            F.col(id_col), F.explode(X.tokens(F.col(text_col))).alias("tok")
        )
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("__tf"))
    )
    if vocab_df is not None:
        # resident language-model metadata (unigram_vocab, persisted
        # by the caller): the broadcast build collects the in-memory
        # copy instead of re-walking the corpus tf chain (r12)
        vocab = F.broadcast(vocab_df)
    elif broadcast_vocab:
        # total as a global window over the vocab-sized freq frame —
        # NOT a separate agg + crossJoin(broadcast(total)), which
        # schedules a second broadcast-build job re-walking the tf
        # chain. The single-partition window is safe exactly when the
        # vocab is broadcastable (same Heaps-law assumption), so both
        # choices hang off the one flag. Plan change r12, same values
        # (identical c/total division).
        from pyspark.sql import Window as _W

        freq = tf.groupBy("tok").agg(F.sum("__tf").alias("c"))
        vocab = F.broadcast(
            freq.withColumn("total", F.sum("c").over(_W.partitionBy()))
        )
    else:
        freq = tf.groupBy("tok").agg(F.sum("__tf").alias("c"))
        total = freq.agg(F.sum("c").alias("total"))
        vocab = freq.crossJoin(F.broadcast(total))
    scored = (
        tf.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.sum("__tf").alias("n_tokens"),
            (
                F.sum(F.col("__tf") * -F.log(F.col("c") / F.col("total")))
                / F.sum("__tf")
            ).alias("avg_nll"),
        )
    )
    if not include_empty:
        return scored
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            "avg_nll",
        )
    )


def tfidf_keywords(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 3,
    broadcast_vocab: bool = True,
    n_docs: int | None = None,
) -> DataFrame:
    """Per-document keyword extraction: the ``top_n`` tokens ranked by
    tf-idf — the metadata tagger a training-data pipeline runs to give
    every document searchable topic keys (the corpus-statistics
    sibling of the reference's per-image CLIP tag vocabulary,
    SAM/sam_segment_clip_pipeline.py:219-257, with corpus idf standing
    in for the model).

        tfidf(d, t) = (tf/dl) · ln((N + 1) / (df(t) + 1))

    (smoothed idf, never negative; tf length-normalized so long
    documents don't dominate).

    Scale shape: explode → groupBy(id, token) is the one unavoidable
    full-token shuffle (map-side combine collapses repeats); document
    frequency re-aggregates THAT frame by token (vocab-sized, Heaps-
    law sublinear — broadcast back when ``broadcast_vocab``, the right
    call for natural-language vocabularies even at 100 TB; set False
    to shuffle-join unbounded token domains); dl comes from a window
    SUM over the same id partitioning the rank window needs, so both
    window passes share one exchange; the per-doc top-n is a
    rank-limit window (WindowGroupLimit pushes the ≤n cut map-side).
    Ranking compares the ROUNDED score with a token tiebreak, so the
    kept set is engine-exact.

    Precondition: ``id_col`` is unique (one row per document — true of
    every corpus this engine produces; dedup runs upstream). The
    map-side dl below is a per-id constant ONLY under that invariant:
    with duplicate-id rows, MAX picks one row's token count where the
    document length should be the sum across the id's rows —
    concatenate (or dedup) multi-row documents before calling.
    """
    # dl (document length) is computed map-side from the token array
    # BEFORE the explode and carried through the (id, tok) aggregation
    # as a per-id constant — identical to the window SUM(tf) OVER
    # (PARTITION BY id) it replaces (sum of per-token counts ≡ array
    # size), but it saves a full window pass: only the rank window
    # remains on the id exchange.
    toks = df.select(
        F.col(id_col),
        X.tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    ).select(
        F.col(id_col),
        F.size("__toks").alias("__dl0"),
        F.explode("__toks").alias("tok"),
    )
    tf = toks.groupBy(id_col, "tok").agg(
        F.count("*").alias("tf"), F.max("__dl0").alias("dl")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfc"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    if n_docs is not None:
        # N is WRITE-TIME metadata (a parquet footer row count / the
        # index's doc count, Lucene-style) — callers holding it pass
        # the int and the plan inlines a literal, skipping the 1-row
        # count aggregate and its broadcast-materialization job (r12;
        # values identical — the literal equals the folded constant).
        nd = F.lit(int(n_docs) + 1).cast("double")
        scored_base = tf.join(dfreq, "tok")
    else:
        n_frame = df.groupBy().agg(F.count("*").alias("__n"))
        nd = (F.col("__n") + 1).cast("double")
        scored_base = tf.join(dfreq, "tok").crossJoin(F.broadcast(n_frame))
    scored = scored_base.select(
        F.col(id_col),
        F.col("tok").alias("term"),
        F.round(
            (F.col("tf").cast("double") / F.col("dl").cast("double"))
            * F.log(nd / (F.col("dfc") + 1).cast("double")),
            6,
        ).alias("tfidf"),
    )
    w_rank = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= int(top_n))
        .select(id_col, "rank", "term", "tfidf")
    )


def quality_classifier(
    df: DataFrame,
    weights: tuple[float, float, float, float] = (-1.25, 2.5, 1.5, 0.875),
    threshold: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality filtering — the linear-classifier gate the
    big public curations run between heuristics and training (the
    fastText-classifier pattern: score every document with a tiny
    linear model over cheap features, keep above a threshold; a real
    pipeline swaps the hand-set weights for trained ones, the plan is
    identical).

    Pure Catalyst: logit = w0 + w1·length_sig + w2·alpha_ratio +
    w3·stop_sig over the shared quality features (functions/text.py),
    accumulated strictly left-to-right so an external engine replays
    it bit-for-bit. NO sigmoid/exp on purpose — the sigmoid is
    monotone, so thresholding the logit is the same decision, and a
    transcendental would cost cross-engine reproducibility (libm vs
    JVM Math are only 1-ulp-correct). The default weights are exact
    binary fractions (1/16 grid — the portable-literal convention).

    Map-only: no shuffle at any scale; at 100 TB this is one pass
    fused with whatever filter chain surrounds it.
    """
    # Two-level select: the rounded logit is projected ONCE and both
    # output columns read the projected value (CollapseProject keeps
    # the levels separate because a non-trivial producer expression is
    # referenced twice). The single-select form embedded the whole
    # logit tree — tokenize included — once per output column (r14
    # plan fix; values identical).
    logit = quality_logit(text_col, weights)
    scored = df.select(F.col(id_col), F.round(logit, 6).alias("__logit"))
    return scored.select(
        F.col(id_col),
        F.col("__logit").alias("logit"),
        (F.col("__logit") >= F.lit(float(threshold))).alias("keep"),
    )


def quality_logit(
    text_col: str = "text",
    weights: tuple[float, float, float, float] = (-1.25, 2.5, 1.5, 0.875),
):
    """The classifier's logit as a bare Column expression — for
    callers that FILTER on it (CurationPipeline.filter_classifier):
    a row-local predicate fuses with the surrounding filter chain,
    where a join against the scored frame would not.

    NULL text scores as empty text (coalesce before the features):
    F.least skips NULL operands, so an un-coalesced NULL length would
    saturate the length signal to 1.0 and a quality gate would KEEP
    garbage null rows — the opposite of its job."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    t = X.tokens(c)
    length_sig = F.least(F.length(c).cast("double") / F.lit(200.0), F.lit(1.0))
    stop_sig = F.least(X.stopword_ratio(t) * F.lit(10.0), F.lit(1.0))
    w0, w1, w2, w3 = (float(w) for w in weights)
    return (
        F.lit(w0)
        + F.lit(w1) * length_sig
        + F.lit(w2) * X.alpha_ratio(c)
        + F.lit(w3) * stop_sig
    )
