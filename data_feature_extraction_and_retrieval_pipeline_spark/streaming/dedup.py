"""Streaming deduplication for continuous training-data ingest.

A 100 TB corpus is not ingested once — it arrives as a stream, and
exact dedup must happen ON the stream or the batch dedup pass gets
rerun over the whole corpus per delivery. The operator is the
streaming twin of ``operators/dedup.py::exact_dedup``: rows carry the
same cheap (length, xxhash64) content fingerprint, and
``dropDuplicatesWithinWatermark`` keeps the seen-set state bounded by
the event-time horizon — the watermark is the state-eviction contract,
exactly like the windowed aggregations in ``ingest.py``.

Scale: state is O(distinct fingerprints inside the horizon), 16 bytes
of key each, partitioned by fingerprint across executors; no shuffle
carries document payloads. Late duplicates beyond the horizon are the
documented trade — at that point the write-time batch dedup
(exact_dedup over the landed table) is the backstop, which is how
production pipelines layer the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fingerprint_columns(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Attach the exact-dedup content fingerprint (length + two
    independent xxhash64s — the same ~24-byte key
    ``operators/dedup.py::exact_dedup`` groups on) so streaming and
    batch dedup agree on identity, with the same 2⁻¹²⁸-scale
    silent-merge bound."""
    c = F.col(text_col)
    return (
        df.withColumn("__len", F.length(c))
        .withColumn("__fp", F.xxhash64(c))
        .withColumn("__fp2", F.xxhash64(F.reverse(c)))
    )


def dedup_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Drop exact-duplicate documents on a stream.

    ``dropDuplicatesWithinWatermark`` (not plain ``dropDuplicates``):
    the seen-fingerprint state is evicted once the watermark passes,
    so state stays bounded on an unbounded stream — the plain variant
    would grow state forever. Within-horizon duplicates are dropped
    regardless of which micro-batch they arrive in.

    Checkpoint compatibility: adding ``__fp2`` to the dedup key set
    (round 3) changed the streaming state schema — a checkpoint
    written by the earlier (len, fp) key will NOT restore against
    this operator. Upgrading a live pipeline requires a new
    checkpoint location (and accepting that in-horizon duplicates
    spanning the cutover are not deduped), the standard Structured
    Streaming state-evolution procedure.
    """
    keyed = fingerprint_columns(stream, text_col=text_col)
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__len", "__fp", "__fp2"])
        .drop("__len", "__fp", "__fp2")
    )


# ---------------------------------------------------------------------------
# Streaming NEAR-dup: MinHash band-bucket state
# ---------------------------------------------------------------------------

from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from ..operators.dedup import portable_banded_signatures

COLLISION_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band", LongType()),
        StructField("key", LongType()),
        StructField("anchor_id", LongType()),
    ]
)

# per-bucket state: the first-seen (anchor) document id
_BUCKET_STATE = StructType([StructField("anchor", LongType())])


def _bucket_collision_fn(ttl_ms: int | None):
    def fn(key, batches, state: GroupState):
        import pandas as pd

        band, bkey = key
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        for pdf in batches:
            ids.extend(int(x) for x in pdf["doc_id"])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (anchor,) = state.get
        else:
            anchor = ids[0]
            state.update((anchor,))
        # never flag the anchor against itself: at-least-once sources
        # can re-deliver the anchor row (or one batch can carry a
        # duplicated id), and the batch twin filters doc_id != anchor
        dups = [i for i in ids if i != anchor]
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if dups:
            yield pd.DataFrame(
                {
                    "doc_id": dups,
                    "band": [band] * len(dups),
                    "key": [bkey] * len(dups),
                    "anchor_id": [anchor] * len(dups),
                }
            )

    return fn


def minhash_collision_stream(
    stream,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    ttl_ms: int | None = None,
):
    """Streaming MinHash near-dup candidate detection: every arriving
    document's banded signature keys are checked against the bucket
    anchors seen so far; collisions emit (doc, band, key, anchor)
    rows — the streaming half of the LSH pipeline, so near-dup
    flagging happens ON ingest instead of re-running the batch
    self-join per delivery (the exact-Jaccard verify stays a batch
    pass over the flagged pairs, as in the batch pipeline).

    The banded signatures reuse the batch operator's Catalyst
    expressions verbatim (operators/dedup.py::
    portable_banded_signatures — map-only, so legal on a streaming
    frame): stream and batch agree on every hash by construction, and
    a one-shot availableNow drain emits exactly the batch twin's
    (doc → bucket-min anchor) pairs (asserted in test_streaming).

    State: ONE long per occupied (band, key) bucket, partitioned by
    bucket across executors — O(buckets), not O(documents), and
    ``ttl_ms`` evicts idle buckets on a long-running stream (the
    processing-time analogue of the exact-dedup watermark horizon).
    """
    banded = portable_banded_signatures(
        stream, n=n, num_hashes=num_hashes, bands=bands,
        text_col=text_col, id_col=id_col,
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return banded.groupBy("band", "key").applyInPandasWithState(
        _bucket_collision_fn(ttl_ms),
        outputStructType=COLLISION_SCHEMA,
        stateStructType=_BUCKET_STATE,
        outputMode="append",
        timeoutConf=timeout,
    )
