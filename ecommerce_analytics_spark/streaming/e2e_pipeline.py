"""The full streaming topology as ONE checkpointed pipeline (§3.2).

The reference's runtime is a single dataflow: Kafka source → JSON parse
(drop on failure) → keyBy → enrichment → fan-out to two sinks
(RealTimeAnalytics.java:48-104). Rounds 1-4 certified every stage of
that topology piecewise (parse/dead-letter, enrichment, watermark
windows, sinks each have their own tests); this module composes them
into one checkpointed Structured Streaming pipeline and certifies the
WHOLE path against the DuckDB oracle:

    sim_events replay source (deterministic offsets, sentinel-punctuated)
      → to_json wire serialization (the S4 producer shape)
      → from_json parse + corrupt routing (P12/T7,
        RealTimeAnalytics.java:65-82 — reference drops; we dead-letter)
      → segment/risk enrichment (P13/P14, EnrichmentFunction.java:38-52)
      → watermarked hourly window × event_type aggregate (A6/T4/T5)
      → docstore sink (S7, manifest-commit protocol, idempotent epochs)

plus the dead-letter fan-out as a second sink query — Spark's unit of
execution is one sink per streaming query, so the reference's dual
Kafka+Mongo fan-out (RealTimeAnalytics.java:90-104) maps to two
queries over the same source, each with its own checkpoint.

End-of-replay flush: a finite replay feeding a watermarked aggregation
never closes its last windows (the watermark trails max observed event
time). The sim source's ``sentinel_days`` option emits one synthetic
row far past the last real event as the final offset; it advances the
watermark past every real window while its OWN window never closes, so
it is invisible in append output — no filter needed (and none wanted:
a pre-aggregation filter gets pushed below the EventTimeWatermark node
by Catalyst, which would hide the sentinel from the watermark tracker).

Scale notes (100 TB): the only stateful exchange is the window×type
aggregation — partial aggregation map-side, state hash-partitioned on
the group key, watermark bounds state to ~watermark-horizon windows.
Parse/enrich/serialize are stateless map stages fused by codegen. The
wire roundtrip serializes timestamps with explicit microseconds
(``yyyy-MM-dd'T'HH:mm:ss.SSSSSS``) — the bare ISO-second shape the
reference uses (§1.3) would silently truncate sub-second event times
and flip window assignment for boundary rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ecommerce_analytics_spark.streaming.pipeline import (
    parse_event_lines, split_dead_letter,
)

WIRE_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
RESULT_SCHEMA = ("window_start string, event_type string, "
                 "n_events bigint, total_value double, "
                 "id_checksum bigint")


def to_wire(events: DataFrame, corrupt_every: int | None = None) -> DataFrame:
    """S4 producer serialization: one JSON line per event.

    ``corrupt_every`` deterministically mangles every k-th event_id's
    payload (test harness for the dead-letter path — the reference has
    no way to even observe its parse failures)."""
    payload = F.to_json(F.struct(
        "event_id",
        F.date_format("ts", WIRE_TS_FMT).alias("ts"),
        "user_id", "event_type", "value",
    ))
    if corrupt_every:
        payload = F.when(
            (F.col("event_id") >= 0)
            & (F.col("event_id") % corrupt_every == 0),
            F.concat(F.lit("{corrupt!"), payload),
        ).otherwise(payload)
    return events.select(payload.alias("value"))


def enrich(valid: DataFrame) -> DataFrame:
    """P13/P14 enrichment on the parsed stream (shared column exprs
    with the batch query — the parity contract)."""
    from ecommerce_analytics_spark.operators.events_enrichment import (
        risk_expr, segment_expr,
    )
    return valid.withColumn("user_segment", segment_expr()) \
                .withColumn("risk_score", risk_expr())


def windowed_rollup(enriched: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """A6/T4/T5: watermarked hourly tumbling window × event_type.

    Exact-cents revenue accumulator (numerics.money_sum — a long sum in
    state, one decimal multiply per emitted group), so the streaming
    result is bit-identical to the batch/DuckDB computation."""
    from ecommerce_analytics_spark.numerics import money_sum
    return (
        enriched
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
             money_sum("value").alias("total_value"),
             F.sum("event_id").cast("long").alias("id_checksum"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"),
                "event_type", "n_events", "total_value", "id_checksum")
    )


def build_pipeline(spark: SparkSession, events_path: str,
                   batch_rows: int = 4000,
                   corrupt_every: int | None = None,
                   dead_batch_rows: int | None = None,
                   ) -> tuple[DataFrame, DataFrame]:
    """(windowed rollup, dead-letter lines) streaming DataFrames for
    the full topology. Callers attach sinks + checkpoints.

    The two sink queries read the replay INDEPENDENTLY (each streaming
    query owns its source offsets), so each gets the reader shape its
    semantics need: the stateful rollup replays in ``batch_rows``
    micro-batches with the end-of-replay sentinel (cross-batch state +
    watermark flush); the stateless dead-letter route needs neither —
    it drains in one big batch (``dead_batch_rows``, default the whole
    file) with no sentinel, halving the replay's Python-source cost."""
    from ecommerce_analytics_spark.sources.simulator import register_sim_source
    register_sim_source(spark)

    def reader(rows: int, sentinel_days: int):
        return (spark.readStream.format("sim_events")
                .option("path", events_path)
                .option("batch_rows", str(rows))
                .option("sentinel_days", str(sentinel_days))
                .load())

    agg_stream = reader(batch_rows, 30)
    valid, _ = split_dead_letter(
        parse_event_lines(to_wire(agg_stream, corrupt_every)))
    dead_rows = dead_batch_rows or replay_total_offset(events_path)
    dead_stream = reader(dead_rows, 0)
    _, dead = split_dead_letter(
        parse_event_lines(to_wire(dead_stream, corrupt_every)))
    return windowed_rollup(enrich(valid)), dead


def _drained(progress, total_offset: int, stateful: bool) -> bool:
    """A pull-based simple stream reader has no availableNow horizon
    (each read() advances the offset), so 'the replay is done' is a
    client-side condition on the last committed progress: offsets
    exhausted, and — for the stateful query — the subsequent no-data
    batch (numInputRows == 0) has committed, which is the batch where
    the sentinel-advanced watermark flushes every real window."""
    if progress is None:
        return False
    end = progress["sources"][0]["endOffset"]
    if isinstance(end, str):
        # simple-reader offsets surface as the Python-dict repr
        import ast
        end = ast.literal_eval(end)
    idx = end["idx"]
    if idx < total_offset:
        return False
    return (progress["numInputRows"] == 0) if stateful else True


def drain_replay(q, total_offset: int, stateful: bool = True,
                 stop_after_first_batch: bool = False,
                 timeout_s: float = 300.0) -> None:
    """Run a streaming query over a sentinel-punctuated sim_events
    replay until it is drained (see _drained), then stop it. Shared by
    the pipeline runner and the append-mode parity tests."""
    import time
    deadline = time.time() + timeout_s
    while time.time() < deadline and q.isActive:
        if stop_after_first_batch:
            if q.recentProgress:
                break
        elif _drained(q.lastProgress, total_offset, stateful):
            break
        time.sleep(0.1)
    else:
        if q.isActive:
            q.stop()
            raise TimeoutError(f"stream did not drain in {timeout_s}s")
    q.stop()
    q.awaitTermination()


def replay_total_offset(events_path: str) -> int:
    """Terminal offset of a sentinel-punctuated replay of this table
    (single file or directory-of-parts — same layout contract as the
    sim_events source it paces)."""
    from ecommerce_analytics_spark.sources.simulator import _num_rows
    return _num_rows(events_path) + 1


def stream_width(spark: SparkSession, batch_rows: int):
    """Scale-adaptive shuffle/state width for a replay topology, set
    for the duration of query START (the incremental planner reads
    ``spark.sql.shuffle.partitions`` once, at the first batch, and
    pins it in the checkpoint).

    Rationale (round 11, guide §2.2/§5): every micro-batch pays a
    fixed per-state-partition cost — an HDFS-backed store open +
    delta-file commit + one Python sink writer task — regardless of
    rows held. At the session default (cluster width: 32 here) a
    12.5k-row batch holding ~455 window-state rows committed 32
    stores and launched 32 near-empty sink writers per batch;
    progress metrics showed state commitTimeMs ~12-16s (summed)
    per batch against ~0.5s of actual update work. Width is therefore
    derived from per-batch VOLUME — one partition per ~5k batch rows,
    min 2 (cross-partition state stays exercised), capped at the
    session width — so it grows with the data (sf1.0 → ~25, 100 TB →
    the cap) instead of with the local core count. Invariance waves
    that perturb the width explicitly (SPARK_GRAFT_EXTRA_CONF) are
    honored untouched; restore() puts the session value back so batch
    queries in the same session are unaffected.
    """
    key = "spark.sql.shuffle.partitions"
    if key in os.environ.get("SPARK_GRAFT_EXTRA_CONF", ""):
        class _Noop:
            def restore(self):
                pass
        return _Noop()
    prev = spark.conf.get(key)
    width = max(2, min(int(prev), batch_rows // 5000))
    spark.conf.set(key, str(width))

    class _Restore:
        def restore(self):
            spark.conf.set(key, prev)
    return _Restore()


def run_pipeline(spark: SparkSession, events_path: str, run_dir: str,
                 batch_rows: int = 4000,
                 corrupt_every: int | None = None,
                 stop_after_first_batch: bool = False,
                 timeout_s: float = 300.0) -> None:
    """Execute the topology to completion with checkpoints under
    ``run_dir``; restartable — rerunning with the same run_dir resumes
    from the checkpointed offsets and the docstore's idempotent
    per-epoch manifests absorb any replayed micro-batch.

    ``stop_after_first_batch`` stops each query after its first
    committed micro-batch instead of draining — the restart-parity
    test's mid-stream kill switch."""
    from ecommerce_analytics_spark.sources.docstore import register_docstore_sink
    register_docstore_sink(spark)
    total_offset = replay_total_offset(events_path)
    rollup, dead = build_pipeline(spark, events_path, batch_rows,
                                  corrupt_every)
    queries = []
    width = stream_width(spark, batch_rows)
    try:
        for name, df, stateful, total in (
                ("agg", rollup, True, total_offset),
                # the dead-letter reader runs sentinel-free: its
                # terminal offset is the raw row count
                ("dead", dead, False, total_offset - 1)):
            q = (df.writeStream.format("docstore")
                 .outputMode("append")
                 .option("path", os.path.join(run_dir, f"store_{name}"))
                 .option("checkpointLocation",
                         os.path.join(run_dir, f"ck_{name}"))
                 .trigger(processingTime="0 seconds")
                 .start())
            queries.append((q, stateful, total))
    finally:
        width.restore()
    for q, stateful, total in queries:
        drain_replay(q, total, stateful,
                     stop_after_first_batch, timeout_s)


def read_rollup(spark: SparkSession, run_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.sources.docstore import read_docstore
    return read_docstore(spark, os.path.join(run_dir, "store_agg"),
                         RESULT_SCHEMA)


def read_dead_letters(spark: SparkSession, run_dir: str) -> DataFrame:
    from ecommerce_analytics_spark.sources.docstore import read_docstore
    return read_docstore(spark, os.path.join(run_dir, "store_dead"),
                         "raw string")


def _register_query() -> None:
    from ecommerce_analytics_spark.numerics import money_sum_sql
    from ecommerce_analytics_spark.plans.registry import query

    @query(
        "stream_pipeline_e2e",
        f"""
        SELECT strftime(date_trunc('hour', ts),
                        '%Y-%m-%d %H:%M:%S') AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               {money_sum_sql('value')} AS total_value,
               CAST(sum(event_id) AS BIGINT) AS id_checksum
        FROM events GROUP BY 1, 2
        """,
        doc="The FULL streaming topology executed end-to-end as one "
            "checkpointed pipeline (VERDICT r4 #5): deterministic "
            "replay source → wire JSON → parse/dead-letter split → "
            "enrichment → watermarked hourly window aggregate → "
            "docstore sink, then the committed store read back. The "
            "hash must equal the oracle computed directly from the "
            "parquet — any row lost at a stage boundary, any window "
            "left unflushed at end-of-replay, any duplicate from an "
            "epoch replay, or any precision loss in the wire/document "
            "serialization flips it.",
        tags=("streaming", "e2e", "sink", "source", "window"),
    )
    def q_stream_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
        from ecommerce_analytics_spark.io import run_tmpdir
        run_dir = run_tmpdir("stream_e2e_")
        path = os.path.join(sf_dir, "events.parquet")
        # scale rows-per-microbatch with the input so the replay is
        # always ~8 micro-batches: cross-batch state is exercised at
        # every SF while per-batch overhead (driver-side prefetch,
        # state-store commit, epoch manifest) stays constant instead
        # of growing linearly with SF. The pytest surfaces use small
        # fixed batch_rows to stress many-batch behavior.
        batch_rows = max(4000, (replay_total_offset(path) - 1) // 8)
        run_pipeline(spark, path, run_dir, batch_rows=batch_rows)
        return read_rollup(spark, run_dir)


_register_query()


def _register_session_query() -> None:
    from ecommerce_analytics_spark.numerics import money_sum, money_sum_sql
    from ecommerce_analytics_spark.plans.registry import query

    gap_ms = 30 * 60 * 1000

    @query(
        "stream_sessionize_e2e",
        f"""
        WITH flagged AS (
          SELECT user_id, event_id, ts, value,
                 CASE WHEN lag(ts) OVER w IS NULL
                        OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > {gap_ms}
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT *, sum(new_sess) OVER (
              PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_no
          FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start, max(ts) AS session_end,
               CAST(count(*) AS BIGINT) AS n_events,
               {money_sum_sql('value')} AS total_value
        FROM sess GROUP BY user_id, session_no
        """,
        doc="Session windows certified THROUGH the streaming engine: "
            "sentinel-punctuated replay → watermarked session_window "
            "aggregation in APPEND mode (sessions emit only when the "
            "watermark passes last-event+gap) → docstore sink → read "
            "back; must hash-match the first-principles lag+cumsum "
            "session oracle. The driver-visible twin of the append-"
            "mode gap-close parity test.",
        tags=("streaming", "sessions", "window", "e2e"),
    )
    def q_stream_sessionize_e2e(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
        from ecommerce_analytics_spark.io import run_tmpdir
        from ecommerce_analytics_spark.sources.docstore import (
            read_docstore, register_docstore_sink,
        )
        from ecommerce_analytics_spark.sources.simulator import (
            register_sim_source,
        )
        register_sim_source(spark)
        register_docstore_sink(spark)
        run_dir = run_tmpdir("stream_sess_")
        path = os.path.join(sf_dir, "events.parquet")
        total = replay_total_offset(path)
        stream = (spark.readStream.format("sim_events")
                  .option("path", path)
                  .option("batch_rows", str(max(4000, (total - 1) // 8)))
                  .option("sentinel_days", "30")
                  .load())
        agg = (
            stream
            .withWatermark("ts", "1 hour")
            .groupBy("user_id",
                     F.session_window("ts", "30 minutes").alias("w"))
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).cast("long").alias("n_events"),
                 money_sum("value").alias("total_value"))
            .select("user_id", "session_start", "session_end",
                    "n_events", "total_value")
        )
        width = stream_width(spark, max(4000, (total - 1) // 8))
        try:
            q = (agg.writeStream.format("docstore")
                 .outputMode("append")
                 .option("path", os.path.join(run_dir, "store"))
                 .option("checkpointLocation", os.path.join(run_dir, "ck"))
                 .trigger(processingTime="0 seconds")
                 .start())
        finally:
            width.restore()
        drain_replay(q, total)
        return read_docstore(
            spark, os.path.join(run_dir, "store"),
            "user_id bigint, session_start timestamp, "
            "session_end timestamp, n_events bigint, total_value double")


_register_session_query()
