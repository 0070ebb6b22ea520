"""Streaming extraction: readStream → extract → writeStream.

The per-document extraction UDF is stateless, so the batch operator
(``extract_spans_df``) applies to a streaming DataFrame unchanged —
``mapInPandas`` is supported on streams.  What streaming adds here:

* ``streaming_extract_spans`` — wire a streaming source (files/Kafka/…)
  of documents through the same extraction stage; checkpointing gives
  exactly-once sink semantics, which *is* the resume story for the
  streaming deployment (per-partition lineage comes free from the
  offset log).
* ``streaming_span_metrics`` — windowed per-source span-rate metrics
  with a watermark for late events.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.extract import DEFAULT_OPTIONS, ExtractOptions
from ..operators.pipeline import extract_spans_df

__all__ = [
    "streaming_append_snaptable",
    "streaming_extract_spans",
    "streaming_span_metrics",
    "streaming_sessionize",
    "streaming_dedup_exact",
    "streaming_incremental_dedup",
    "streaming_distinct_hll",
]


def streaming_extract_spans(
    stream_df: DataFrame,
    doc_id_col: str = "doc_id",
    html_col: str = "html",
    base_url_col: Optional[str] = "base_url",
    encoding: str = "utf-8",
    opts: ExtractOptions = DEFAULT_OPTIONS,
) -> DataFrame:
    """Streaming documents → streaming spans (same engine, same schema).

    Usage:
        src = spark.readStream.schema(sch).parquet(in_dir)
        out = streaming_extract_spans(src)
        out.writeStream.format("parquet")
           .option("checkpointLocation", ckpt)
           .option("path", out_dir).start()
    """
    if not stream_df.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    return extract_spans_df(
        stream_df,
        doc_id_col=doc_id_col,
        html_col=html_col,
        base_url_col=base_url_col,
        encoding=encoding,
        opts=opts,
    )


def streaming_span_metrics(
    spans_stream: DataFrame,
    ts_col: str = "ingest_ts",
    window: str = "1 minute",
    watermark: str = "5 minutes",
) -> DataFrame:
    """Tumbling-window extraction metrics with late-data watermark."""
    df = spans_stream
    if ts_col not in df.columns:
        df = df.withColumn(ts_col, F.current_timestamp())
    return (
        df.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_text").alias("n_text"),
            F.sum("n_media").alias("n_media"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
                "n_errors"
            ),
            F.sum("size_bytes").alias("bytes"),
        )
    )


def streaming_dedup_exact(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ttl_minutes: Optional[int] = None,
) -> DataFrame:
    """Custom stateful operator: exact dedup on a document STREAM — the
    first arrival of each content fingerprint passes through, every
    later copy is suppressed, across micro-batches and restarts (state
    lives in the checkpointed state store).

    Emits (fp, doc_id, n_seen_before) — append mode emits only first
    arrivals, so n_seen_before is always 0 (kept for schema stability;
    per-fp duplicate COUNTS are the batch ``dedup_exact``'s n_dups job).

    State per fingerprint = the first doc id: bounded by
    the DISTINCT corpus, the same asymptotics as any exact-dedup ledger.
    ``ttl_minutes`` bounds it harder with a processing-time expiry —
    right for ingestion streams where a re-crawl horizon exists (a copy
    arriving after the TTL re-emits, trading memory for exactness,
    exactly like a TTL'd dedup cache).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    if not docs.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")

    out_schema = StructType(
        [
            StructField("fp", StringType()),
            StructField("doc_id", StringType()),
            StructField("n_seen_before", IntegerType()),
        ]
    )
    state_schema = StructType([StructField("first_id", StringType())])
    ttl_ms = (ttl_minutes or 0) * 60 * 1000

    def _id_key(s):
        # numeric ids order numerically (the batch operators keep the
        # MIN numeric id; lexicographic min would pick "10" over "9")
        return (0, len(s), s) if s.isdigit() else (1, 0, s)

    def fn(key, pdfs, state):
        import pandas as pd

        fp = key[0]
        if state.hasTimedOut:
            state.remove()
            return
        ids = []
        for pdf in pdfs:
            ids.extend(str(x) for x in pdf["doc_id"])
        if not ids:
            return
        if state.exists:
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            return  # all copies — suppress
        # across batches "first" is arrival order; within one micro-batch
        # row order is partition-dependent, so the tie is broken by the
        # smallest id under the batch operators' numeric-min ordering
        first = min(ids, key=_id_key)
        state.update((first,))
        if ttl_ms:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            {"fp": [fp], "doc_id": [first], "n_seen_before": [0]}
        )

    from ..functions.text import fingerprint  # the ledger's fp family

    keyed = docs.select(
        fingerprint(F.col(text_col)).alias("fp"),
        F.col(id_col).cast("string").alias("doc_id"),
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes
        else GroupStateTimeout.NoTimeout
    )
    return keyed.groupBy("fp").applyInPandasWithState(
        fn, out_schema, state_schema, "append", timeout
    )


def streaming_incremental_dedup(
    docs: DataFrame,
    ledger: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ledger_fp_col: str = "fp",
) -> DataFrame:
    """Stream-side of ``incremental.incremental_dedup_exact``: suppress
    incoming documents whose content fingerprint is already in the
    AT-REST ledger of the accepted corpus — a stream-STATIC left-anti
    join, so no ledger state ever enters the state store (the corpus
    would not fit; the ledger table is the state).

    Emits the surviving (doc_id, fp) rows.  With the ledger persisted
    by ``incremental.write_ledger_bucketed`` each micro-batch probe
    satisfies the join distribution from the file layout — only the
    micro-batch shuffles, every batch, forever.  NOTE the stream-static
    join re-reads the ledger per micro-batch (Spark's documented
    semantics), which is exactly what an appended-to ledger wants:
    survivors committed by the batch appender become visible to later
    micro-batches without restarting the stream.  Duplicates WITHIN the
    stream are the stateful ``streaming_dedup_exact``'s job — compose
    this (vs history) with that (vs the live stream) for full coverage.
    """
    from ..functions.text import fingerprint

    if not docs.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    b = docs.select(
        F.col(id_col).alias("doc_id"),
        fingerprint(F.col(text_col)).alias("fp"),
    )
    led = ledger.select(F.col(ledger_fp_col).alias("fp"))
    return b.join(led, "fp", "left_anti")


def streaming_sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Custom stateful operator: per-user gap sessionization on a stream
    via ``applyInPandasWithState`` (the streaming twin of the batch
    ``operators.events.sessionize``).

    State per user = the OPEN session's event timestamps (not just its
    bounds): each batch merges new in-watermark events into the buffer,
    re-splits on gaps exactly like the batch operator, emits every
    closed session, and keeps only the open one — so a late event that
    precedes the open session's start by more than the gap becomes its
    own (immediately closed) session instead of being wrongly merged,
    matching the batch semantics.  Events with NULL/unparseable
    timestamps are dropped (they would poison the buffer as NaT).  An
    event-time timeout (last_ts + gap past the watermark) flushes idle
    sessions, so state is bounded by the active-user set × one
    session's events.  Remaining eager-emission caveat: a session
    closed by an observed gap is emitted immediately, so an
    in-watermark straggler arriving in a LATER batch that targets an
    already-emitted session starts a new one (Spark's built-in
    session_window avoids this by withholding emission until the
    watermark passes end + gap, at the cost of latency).
    """
    import pandas as pd  # noqa: F401  (worker-side)
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    if not events.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", IntegerType()),
        ]
    )
    state_schema = StructType(
        [StructField("ts_us", ArrayType(LongType()))]
    )
    gap_us = gap_minutes * 60 * 1_000_000

    def _split(buf):
        """Sorted event buffer → [(start, end, n)] split on gaps — the
        batch sessionize recurrence verbatim."""
        sessions = []
        start = last = buf[0]
        n = 1
        for t in buf[1:]:
            if t - last > gap_us:
                sessions.append((start, last, n))
                start, n = t, 1
            else:
                n += 1
            last = t
        sessions.append((start, last, n))
        return sessions

    def _rows(user, sessions):
        import pandas as pd

        return pd.DataFrame(
            {
                "user_id": [user] * len(sessions),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in sessions
                ],
                "session_end": [
                    pd.Timestamp(e, unit="us") for _, e, _ in sessions
                ],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def fn(key, pdfs, state):
        import pandas as pd

        user = key[0]
        if state.hasTimedOut:
            buf = sorted(state.get[0])
            state.remove()
            yield _rows(user, _split(buf))
            return

        ts_list = []
        for pdf in pdfs:
            # NaT guard: a NULL/unparseable ts would inject int64-min
            ts_list.extend(
                int(t.value // 1000)
                for t in pd.to_datetime(pdf["ts"])
                if not pd.isna(t)
            )
        # watermark floor (ms): timeout timestamps at or below the current
        # watermark are rejected by Spark — clamp below.
        wm_ms = state.getCurrentWatermarkMs()
        if not ts_list:
            # empty batch iterator for this key (no new data, no timeout):
            # keep state, refresh the timeout, emit nothing.
            if state.exists:
                last_us = max(state.get[0])
                state.setTimeoutTimestamp(
                    max(last_us // 1000 + gap_minutes * 60 * 1000, wm_ms + 1)
                )
            return
        buf = list(state.get[0]) if state.exists else []
        buf = sorted(buf + ts_list)
        sessions = _split(buf)
        open_start, open_last, _ = sessions[-1]
        state.update(([t for t in buf if t >= open_start],))
        state.setTimeoutTimestamp(
            max(open_last // 1000 + gap_minutes * 60 * 1000, wm_ms + 1)
        )
        if len(sessions) > 1:
            yield _rows(user, sessions[:-1])

    src = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").alias("ts"),
    ).withWatermark("ts", watermark)
    return src.groupBy("user_id").applyInPandasWithState(
        fn,
        out_schema,
        state_schema,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


def streaming_distinct_hll(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    p: int = 8,
) -> DataFrame:
    """Custom stateful operator: per-group STREAMING distinct-token
    estimates via HyperLogLog register merge — state per group is 2^p
    small ints in the checkpointed state store, bounded no matter how
    long the stream runs (the reason a streaming distinct counter must
    sketch).  After each micro-batch that touches a group, emits the
    group's refreshed (group, est, n_tokens_seen).

    The register math is BYTE-IDENTICAL to the batch operator
    (``operators.sketches.hll_distinct``): same portable fold, bucket,
    rank, exact power-of-two harmonic sum, linear-counting correction —
    so a stream's final estimate equals the batch estimate over the
    same rows (pinned by test), and a batch-built register table can
    seed a stream (or vice versa): lambda-architecture-safe.
    """
    import re

    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from ..functions.text import _LOWERC, _UPPER
    from ..operators.sketches import _BASE, _MOD

    if not docs.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")

    m = 1 << p
    a, b = 0x6B8B4567 | 1, 0x327B23C6
    _ws = re.compile(r"[ \t\n\x0B\f\r]+")
    _tr = str.maketrans(_UPPER, _LOWERC)
    alpha = 0.7213 / (1.0 + 1.079 / m)

    out_schema = StructType(
        [
            StructField("group", StringType()),
            StructField("est", DoubleType()),
            StructField("n_tokens_seen", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("regs", StringType()),  # comma-joined 2^p ranks
            StructField("n_seen", LongType()),
        ]
    )

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            regs_s, n_seen = state.get
            regs = [int(x) for x in regs_s.split(",")]
        else:
            regs, n_seen = [0] * m, 0
        for pdf in pdfs:
            for text in pdf[text_col]:
                toks = [
                    t
                    for t in _ws.sub(" ", str(text)).strip(" ")
                    .translate(_tr)
                    .split(" ")
                    if t
                ]
                n_seen += len(toks)
                for t in toks:
                    h = 0
                    for ch in t:
                        h = (h * _BASE + ord(ch)) % _MOD
                    j = h % m
                    rm = (h * a + b) % _MOD
                    r = 32 if rm == 0 else 32 - len(bin(rm)[2:])
                    if r > regs[j]:
                        regs[j] = r
        state.update((",".join(str(x) for x in regs), n_seen))
        nz = sum(1 for x in regs if x > 0)
        s_nz = sum(2.0 ** -x for x in regs if x > 0)
        zeros = m - nz
        est_raw = (alpha * m * m) / (s_nz + zeros)
        if est_raw <= 2.5 * m and zeros > 0:
            import math

            est = float(m) * math.log(float(m) / float(zeros))
        else:
            est = est_raw
        yield pd.DataFrame(
            {
                "group": [key[0]],
                "est": [round(est, 4)],
                "n_tokens_seen": [n_seen],
            }
        )

    keyed = docs.select(
        F.col(group_col).cast("string").alias("g"), F.col(text_col)
    )
    # "append": each emission is a new immutable snapshot row (an
    # append-only log of refreshed estimates) — file sinks only support
    # append; readers take the row with max n_tokens_seen per group
    return keyed.groupBy("g").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def streaming_append_snaptable(
    stream_df: DataFrame,
    table_path: str,
    checkpoint_dir: str,
    batch_prefix: str = "epoch",
):
    """Exactly-once streaming sink into a snapshot-manifest table.

    Structured Streaming's foreachBatch gives at-least-once epoch
    delivery (a crashed micro-batch is REPLAYED with the same epoch_id
    after restart from the checkpoint); SnapTable.append is idempotent
    on batch_id, so keying the commit by epoch turns the replay into a
    no-op — at-least-once delivery x idempotent commit = exactly-once
    table contents, the standard foreachBatch pattern, with the dedup
    ledger living in the table's own manifest instead of a separate
    store.  Readers see each micro-batch atomically (snapshot commit),
    never a half-written epoch.

    Returns the DataStreamWriter — caller picks the trigger and calls
    .start():

        q = streaming_append_snaptable(spans, tbl, ckpt)\
            .trigger(availableNow=True).start()
    """
    from ..sources.snaptable import SnapTable

    if not stream_df.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    tbl = SnapTable(table_path)

    def _commit(batch_df: DataFrame, epoch_id: int) -> None:
        tbl.append(batch_df, "%s-%08d" % (batch_prefix, epoch_id))

    return stream_df.writeStream.foreachBatch(_commit).option(
        "checkpointLocation", checkpoint_dir
    )


def streaming_feed_entries(
    feeds: DataFrame,
    seen_ledger: DataFrame,
    xml_col: str = "xml",
    id_col: str = "doc_id",
) -> DataFrame:
    """Continuous discovery: a stream of fetched feed documents →
    NEVER-SEEN entries only.

    Per micro-batch: ``feeds.feed_entries_df`` parses the RSS/Atom
    payloads (Arrow ``mapInPandas`` — streaming-safe, per-row work),
    each entry gets a stable identity (its ``entry_id``/guid when the
    feed provides one, else the link), and a stream-STATIC left-anti
    join against the at-rest ``seen_ledger`` (one ``entry_key``
    column) suppresses everything already discovered — the same
    no-state-store shape as ``streaming_incremental_dedup``: the
    ledger table IS the state, appends to it become visible to later
    micro-batches without a restart.  Downstream commits survivors to
    the ledger + the frontier (``jobs/frontier_job.py`` consumes the
    same contract).
    """
    from ..operators.feeds import feed_entries_df

    if not feeds.isStreaming:
        raise ValueError("expected a streaming DataFrame (readStream source)")
    entries = feed_entries_df(feeds, xml_col=xml_col, id_col=id_col)
    keyed = entries.withColumn(
        "entry_key", F.coalesce(F.col("entry_id"), F.col("link"))
    ).where(F.col("entry_key").isNotNull())
    led = seen_ledger.select(F.col("entry_key"))
    return keyed.join(led, "entry_key", "left_anti")
