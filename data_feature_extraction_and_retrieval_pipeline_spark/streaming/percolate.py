"""Percolation — standing queries matched against incoming documents.

The reference serves retrieval through Elasticsearch, and ES reverses
search with its percolator: queries are registered in an index, and
each document arriving at ingest is matched against every registered
query (the alerting / routing primitive behind "tell me when a doc
matching X lands"). The reference's ingest loop
(bulk_index_with_features.py) plus full-text relevance over its index
(the BM25 an analyzed ES ``match`` query computes — the endpoint's
own ``terms`` query is constant-scored; see retrieval.bm25_topk's
parity note) compose into exactly that standing shape once the corpus
statistics are frozen.

This is the Spark twin: standing BM25 term queries scored against a
FROZEN corpus-statistics row (the ``stats_df`` serving artifact of
``operators.retrieval.bm25_topk`` — built once at index time, like
ES's segment statistics) as a pure map-only Catalyst expression. No
state store, no watermark, no shuffle: the identical column logic
runs on a batch frame or on every readStream micro-batch in append
mode, which is what makes the operator trivially correct under
restart (stateless) and embarrassingly parallel across a
1000-executor ingest stream.

Scale shape: queries are the SMALL side — ES percolator indexes hold
thousands of queries against billions of documents, and the same
asymmetry holds here — so each query's terms are inlined as literal
expressions (per-doc work is O(|queries| x |terms|) token scans inside
whole-stage codegen). The stats row joins back as a broadcast; at 100
TB nothing about this plan changes except the number of input splits.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

from pyspark.sql import DataFrame, functions as F


class StandingQuery(NamedTuple):
    """A registered percolator query: match any of ``terms``, alert
    when the BM25 score (under the frozen stats) clears ``min_score``."""

    query_id: str
    terms: tuple[str, ...]
    min_score: float


def _term_eq(term: str):
    # Closure factory: Spark reads HOF-lambda arity from the Python
    # signature, so a default-arg capture would be mis-read as 2-arg.
    return lambda t: t == F.lit(term)


def bm25_stats(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str | None = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """The frozen corpus-statistics artifact: one row with the corpus
    size, total token count, and per-term document frequency for the
    union of all standing-query terms. One aggregate job (partial
    map-side, 1-row exchange); built at index time, reused by every
    percolation micro-batch — the exact ``stats_df`` contract of
    ``bm25_topk``. Column names are positional (``__df_<i>`` follows
    ``terms`` order), so pass the SAME term list to ``percolate``.
    """
    from ..functions import text as X

    # NULL-array identity: a missing token list is the empty doc —
    # without the coalesce, F.size(NULL) is -1 and dl/tf skew silently
    toks = (
        F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
        if tokens_col is not None
        else X.tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    # Tokenize ONCE into a named column, then derive dl and every tf
    # from it — embedding the tokenize tree in each derived column
    # re-splits the text once per term (codegen does not collapse
    # repeated HOF trees; the same r12-measured 2× of
    # retrieval._bm25_base applies). CollapseProject leaves the
    # two-level select alone because __toks is referenced |terms|+1
    # times and split() is not collapse-cheap.
    sized = docs.select(toks.alias("__toks")).select(
        F.size("__toks").alias("__dl"),
        *[
            F.size(F.filter(F.col("__toks"), _term_eq(t))).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )
    return sized.agg(
        F.count("*").alias("__n"),
        F.sum("__dl").alias("__sumdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )


def percolate(
    docs: DataFrame,
    queries: Sequence[StandingQuery],
    stats_df: DataFrame,
    stats_terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Match every document in ``docs`` (batch OR streaming frame)
    against every standing query; emit one row per (doc, query) hit:
    ``(doc_id, query_id, n_matched_terms, bm25)``.

    A hit means >= 1 query term present AND raw BM25 >= the query's
    ``min_score`` (the threshold compares the UNROUNDED left-to-right
    accumulation, which is bit-identical across engines — the rounded
    score is emitted for display). idf is computed IN-ENGINE from the
    stats columns (``F.log`` here = ``LN`` in the oracle, the same
    certified pairing ``text_bm25_topk`` uses).

    Plan: scan -> broadcast the 1-row stats -> per-query scores as
    literal-term expressions -> explode a |queries|-element struct
    array -> filter. Map-only after the broadcast; on a stream this
    needs append mode only.
    """
    from ..functions import text as X

    # Fail loudly at registration shape errors instead of leaking an
    # IndexError/KeyError from deep inside expression assembly: an
    # empty query set, a query with zero terms, or a query term the
    # frozen stats row never covered are all caller bugs — name the
    # offending query so the fix is one lookup away.
    if not queries:
        raise ValueError("percolate needs at least one standing query")
    stats_idx = {t: i for i, t in enumerate(stats_terms)}
    for q in queries:
        if not q.terms:
            raise ValueError(
                f"standing query {q.query_id!r} has no terms"
            )
        missing = [t for t in q.terms if t not in stats_idx]
        if missing:
            raise ValueError(
                f"standing query {q.query_id!r} uses terms not covered "
                f"by stats_terms: {missing} — rebuild the stats artifact "
                "over the union of all registered queries' terms"
            )
    # same NULL-array identity as bm25_stats (empty doc, not size -1)
    toks_expr = (
        F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
        if tokens_col is not None
        else X.tokens(F.coalesce(F.col(text_col), F.lit("")))
    )

    # Tokenize ONCE into a named column (same rationale and shape as
    # bm25_stats above / retrieval._bm25_base): the single-projection
    # form re-evaluated split(lower(text)) once per derived column —
    # |terms|+1 full tokenizations per document, measured ~2× the
    # whole matches() pass at 5 terms (plans/r13/api_percolate_
    # before.txt shows the duplicated trees). Still a stateless
    # narrow map — streaming-safe in append mode exactly as before.
    base = (
        docs.select(F.col(id_col), toks_expr.alias("__toks"))
        .select(
            F.col(id_col),
            F.size("__toks").alias("__dl"),
            *[
                F.size(F.filter(F.col("__toks"), _term_eq(t))).alias(
                    f"__tf_{stats_idx[t]}"
                )
                for t in sorted(
                    {t for q in queries for t in q.terms},
                    key=stats_idx.__getitem__,
                )
            ],
        )
        .crossJoin(F.broadcast(stats_df))
    )

    nd = F.col("__n").cast("double")
    # Degenerate-corpus guard: with zero tokens anywhere, avgdl would
    # be 0 and ANSI Spark throws on dl/avgdl during evaluation even
    # though every row is filtered (tf=0 ⇒ no match). Any positive
    # stand-in is value-identical whenever a token exists.
    avgdl = F.when(
        F.col("__sumdl") > 0, F.col("__sumdl").cast("double") / nd
    ).otherwise(F.lit(1.0))
    dld = F.col("__dl").cast("double")

    def _query_struct(q: StandingQuery):
        contribs = []
        n_matched = None
        for t in q.terms:
            i = stats_idx[t]
            tfd = F.col(f"__tf_{i}").cast("double")
            dfd = F.col(f"__df_{i}").cast("double")
            idf = F.log(
                F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
            )
            norm = tfd / (
                tfd
                + F.lit(float(k1))
                * (F.lit(1.0 - b) + F.lit(float(b)) * (dld / avgdl))
            )
            contribs.append(idf * norm)
            hit = (F.col(f"__tf_{i}") > 0).cast("int")
            n_matched = hit if n_matched is None else n_matched + hit
        score = contribs[0]
        for c in contribs[1:]:
            score = score + c
        return F.struct(
            F.lit(q.query_id).alias("query_id"),
            n_matched.alias("n_matched_terms"),
            score.alias("__score"),
            (
                (n_matched > 0) & (score >= F.lit(float(q.min_score)))
            ).alias("__hit"),
        )

    exploded = base.select(
        F.col(id_col),
        F.explode(F.array(*[_query_struct(q) for q in queries])).alias("m"),
    )
    return exploded.filter(F.col("m.__hit")).select(
        F.col(id_col),
        F.col("m.query_id").alias("query_id"),
        F.col("m.n_matched_terms").alias("n_matched_terms"),
        F.round(F.col("m.__score"), 6).alias("bm25"),
    )


def bm25_stats_table(
    docs: DataFrame,
    terms: Sequence[str],
    text_col: str | None = "text",
    tokens_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The frozen corpus statistics in LONG form, for query registries
    too large to inline as per-term columns: ``(term_stats, totals)``
    where term_stats is ``(term, df)`` — one ROW per standing-query
    term instead of one COLUMN — and totals is the 1-row ``(n,
    sumdl)``. At 10k registered queries the wide ``bm25_stats`` row
    would carry ~10k columns (its own codegen bomb); the long form is
    O(|vocab|) rows, broadcast-sized at any realistic registry.

    Two jobs over the corpus (distinct-token df + the size totals),
    both map-side combined; built at index time like ``bm25_stats``.
    """
    from ..functions import text as X

    toks = (
        F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
        if tokens_col is not None
        else X.tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    vocab = [str(t) for t in dict.fromkeys(terms)]
    counted = (
        docs.select(
            F.explode(F.array_distinct(toks)).alias("term")
        )
        .filter(F.col("term").isin(*vocab))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    # EVERY requested vocab term gets a row, df=0 for terms absent
    # from the corpus — percolate_join's tf⋈term_stats is an inner
    # join, so a missing row would silently drop that term's
    # contribution (a novel-term standing query — the core percolator
    # alerting case — would never fire), diverging from the expression
    # form's bit-identical contract where df=0 is a LARGE idf. The
    # vocab frame is literal and broadcast-sized by construction.
    spark = docs.sparkSession
    vocab_df = spark.createDataFrame(
        [(t,) for t in vocab], "term string"
    )
    term_stats = vocab_df.join(counted, "term", "left").select(
        "term", F.coalesce(F.col("df"), F.lit(0)).cast("long").alias("df")
    )
    totals = docs.select(F.size(toks).alias("__dl")).agg(
        F.count("*").alias("n"), F.sum("__dl").alias("sumdl")
    )
    return term_stats, totals


def _sql_str(s: str, escaped_literals: bool = False) -> str:
    """Single-quote-escaped SQL string literal body, parser-mode
    aware: quote DOUBLING (``''``) is valid under both the default
    parser and ``spark.sql.parser.escapedStringLiterals=true``, so it
    is the injection-safe quote escape regardless of session config;
    backslashes need doubling only under the default parser (with
    escapedStringLiterals they are literal characters)."""
    if not escaped_literals:
        s = s.replace("\\", "\\\\")
    return s.replace("'", "''")


def percolate_join(
    docs: DataFrame,
    queries: Sequence[StandingQuery],
    term_stats: DataFrame | None = None,
    totals: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    stats_rows: Sequence[tuple] | None = None,
    totals_rows: Sequence[tuple] | None = None,
) -> DataFrame:
    """The BROADCAST-JOIN percolator — same output contract as
    :func:`percolate` (``(doc_id, query_id, n_matched_terms, bm25)``,
    bit-identical scores), built for LARGE standing-query registries
    where the expression form stops compiling: ``percolate`` inlines
    one expression tree per query, so codegen/analysis cost is
    O(|queries| · |terms|) PER PLAN — measured to fall off a cliff in
    the thousands (tools/percolate_scale.py; crossover documented in
    SCALING.md). This form makes the registry DATA instead of CODE,
    riding as ONE denormalized broadcast
    ``(query_id, term, term_idx, min_score, df, n, sumdl)``:

      docs → explode tokens (tokenized once per doc, below the
             Generate) → ⋈ broadcast registry (vocab filter + query
             fan-out in one map-side join)
           → groupBy (doc, query, term): tf + per-term contribution
             [shuffle 1, map-side combined]
           → groupBy (doc, query): left-to-right fold of the
             term-idx-sorted contributions + matched count
             [shuffle 2, tiny — one row per (doc, query, term)]
           → threshold filter

    Plan cost is independent of |queries| (the registry rides as one
    broadcast), so 100k standing queries plan as fast as 10; the
    exchanges carry only standing-query vocab hits, never the full
    token stream.

    Stats arrive either as frames (``term_stats``/``totals``, the
    generic path — joined into the registry broadcast plan-side) or as
    driver-side rows (``stats_rows``/``totals_rows`` — the frozen
    write-time metadata a serving process keeps resident; the
    registry becomes an inline VALUES LocalRelation so one warm call
    schedules exactly one broadcast job plus the main job).

    Determinism contract: the score folds ``collect_list``ed
    contributions AFTER ``array_sort`` by the query's term order —
    the exact left-to-right accumulation the expression form computes
    (absent terms contribute exactly +0.0 there, which is an IEEE
    no-op on the non-negative contributions) — so expression, join,
    and SQL-oracle scores are bit-identical before the display round,
    and all three share ONE oracle. Aggregation-based ⇒ batch (or
    foreachBatch) semantics; the stateless expression form remains
    the direct-readStream path.
    """
    from ..functions import text as X

    if not queries:
        raise ValueError("percolate_join needs at least one standing query")
    qrows = []
    for q in queries:
        if not q.terms:
            raise ValueError(f"standing query {q.query_id!r} has no terms")
        for i, t in enumerate(q.terms):
            qrows.append((q.query_id, str(t), i, float(q.min_score)))
    spark = docs.sparkSession
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, docs.schema[id_col].dataType),
            T.StructField("query_id", T.StringType()),
            T.StructField("n_matched_terms", T.IntegerType()),
            T.StructField("bm25", T.DoubleType()),
        ]
    )
    if stats_rows is not None:
        if totals_rows is None or not totals_rows:
            raise ValueError("stats_rows requires totals_rows")
        df_by_term = {str(t): int(d) for t, d in stats_rows}
        n_val, sumdl_val = (int(x) for x in totals_rows[0])
        # terms/ids arrive from untrusted callers (the HTTP
        # /percolate/register body reaches this VALUES statement) —
        # escape per the session's actual parser mode, and reject
        # non-finite thresholds up front (repr('nan'/'inf') would CAST
        # to NULL and silently disable the floor)
        esc = (
            spark.conf.get(
                "spark.sql.parser.escapedStringLiterals", "false"
            ).lower()
            == "true"
        )
        for qid, _term, _idx, ms in qrows:
            if not math.isfinite(ms):
                raise ValueError(
                    f"standing query {qid!r} has non-finite "
                    f"min_score {ms!r}"
                )
        brows = [
            # repr() emits the shortest round-tripping decimal and
            # Spark's CAST(string AS DOUBLE) parses correctly-rounded,
            # so the min_score double survives bit-identically
            "('{}', '{}', {}, CAST('{}' AS DOUBLE), {}L, {}L, {}L)".format(
                _sql_str(qid, esc), _sql_str(term, esc), int(idx), repr(ms),
                df_by_term[term], n_val, sumdl_val,
            )
            for qid, term, idx, ms in qrows
            if term in df_by_term
        ]
        if not brows:
            return spark.createDataFrame([], out_schema)
        registry = spark.sql(
            "SELECT * FROM VALUES {} AS t(query_id, term, term_idx, "
            "min_score, df, n, sumdl)".format(", ".join(brows))
        )
    else:
        if term_stats is None or totals is None:
            raise ValueError(
                "percolate_join needs term_stats/totals frames or "
                "stats_rows/totals_rows"
            )
        qdf = spark.createDataFrame(
            qrows,
            "query_id string, term string, term_idx int, min_score double",
        )
        registry = qdf.join(term_stats, "term").crossJoin(totals)

    toks = (
        F.coalesce(F.col(tokens_col), F.array().cast("array<string>"))
        if tokens_col is not None
        else X.tokens(F.coalesce(F.col(text_col), F.lit("")))
    )
    # Tokenize ONCE per document, below the explode. Writing
    # ``select(id, size(toks), explode(toks))`` in one projection lets
    # Catalyst float the size() above the Generate, where the full
    # split+filter re-evaluates PER EXPLODED TOKEN ROW (measured ~3×
    # the whole query's cost at sf0.1); materializing the array as a
    # named column forces the split below the Generate — the exploded
    # rows reference the per-doc array, and size() on a materialized
    # array is O(1).
    base = docs.select(F.col(id_col), toks.alias("__toks"))
    occ = base.select(
        F.col(id_col),
        F.size("__toks").alias("__dl"),
        F.explode("__toks").alias("term"),
    )
    # Registry-as-data predicate pushdown AND query fan-out in one
    # map-side broadcast join: only standing-query vocab terms survive
    # to the tf shuffle (each occurrence duplicated once per standing
    # query containing the term). Without this the groupBy shuffles
    # EVERY token occurrence in the corpus — the difference between
    # terabytes and megabytes on the wire at 100 TB. __dl comes from
    # the FULL token array above, so length normalization is
    # unaffected. One broadcast for the whole operator: a warm call
    # schedules one broadcast job + the main job.
    hits = occ.join(F.broadcast(registry), "term")

    nd = F.col("n").cast("double")
    avgdl = F.when(
        F.col("sumdl") > 0, F.col("sumdl").cast("double") / nd
    ).otherwise(F.lit(1.0))
    tfd = F.col("tf").cast("double")
    dfd = F.col("df").cast("double")
    idf = F.log(F.lit(1.0) + (nd - dfd + F.lit(0.5)) / (dfd + F.lit(0.5)))
    norm = tfd / (
        tfd
        + F.lit(float(k1))
        * (F.lit(1.0 - b) + F.lit(float(b)) * (F.col("__dl").cast("double") / avgdl))
    )
    # tf per (doc, query, term) — numerically identical to tf per
    # (doc, term): the fan-out only duplicates rows across queries.
    # The stats ride as grouping keys (functionally dependent on the
    # term), so the contribution is computed post-combine without a
    # second stats join. Map-side partial aggregation compresses the
    # exchange to one row per (doc, query, term).
    contrib = (
        hits.groupBy(
            id_col, "__dl", "query_id", "term_idx", "min_score",
            "df", "n", "sumdl",
        )
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            id_col, "query_id", "term_idx", "min_score",
            (idf * norm).alias("c"),
        )
    )

    per_q = (
        contrib.groupBy(id_col, "query_id", "min_score")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_matched_terms"),
            # left-to-right fold in the query's term order — the
            # expression form's exact accumulation
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(F.col("term_idx"), F.col("c")))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s["c"],
            ).alias("__score"),
        )
    )
    return per_q.filter(F.col("__score") >= F.col("min_score")).select(
        F.col(id_col),
        F.col("query_id"),
        F.col("n_matched_terms"),
        F.round(F.col("__score"), 6).alias("bm25"),
    )


def percolate_join_stream(
    stream_docs: DataFrame,
    queries: Sequence[StandingQuery],
    term_stats: DataFrame | None = None,
    totals: DataFrame | None = None,
    sink_path: str = None,
    checkpoint: str = None,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    tokens_col: str | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    stats_rows: Sequence[tuple] | None = None,
    totals_rows: Sequence[tuple] | None = None,
):
    """The join-form percolator ON A STREAM — the past-the-codegen-wall
    path for large standing-query registries (the expression form dies
    at ~300 queries; SCALING.md "Percolator registry ceiling"):
    ``percolate_join`` is aggregation-based, so it runs inside
    foreachBatch with plain batch semantics per micro-batch, appending
    each batch's hits to a parquet sink. Registry size never touches
    the plan; exactly-once across restarts comes from the checkpointed
    source offsets plus the idempotent append of a deterministic
    transform. Returns the started StreamingQuery (availableNow)."""
    # fail at the CALL SITE, not inside the first micro-batch's
    # foreachBatch (where a None sink/checkpoint surfaces as an opaque
    # executor-side parquet error long after .start() returned)
    if sink_path is None or checkpoint is None:
        raise ValueError(
            "percolate_join_stream requires sink_path and checkpoint"
        )

    def _per_batch(batch_df: DataFrame, batch_id: int) -> None:
        hits = percolate_join(
            batch_df,
            queries,
            term_stats,
            totals,
            id_col=id_col,
            text_col=text_col,
            tokens_col=tokens_col,
            k1=k1,
            b=b,
            stats_rows=stats_rows,
            totals_rows=totals_rows,
        )
        hits.write.mode("append").parquet(sink_path)

    return (
        stream_docs.writeStream.foreachBatch(_per_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
