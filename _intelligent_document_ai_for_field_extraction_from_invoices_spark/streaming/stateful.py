"""Custom stateful streaming operator: sessionization with
applyInPandasWithState (engine extension — the reference has no streaming,
SURVEY §2.9; this is the streaming twin of operators/sessionize.py).

State per user: (last_event_us, n_sessions, n_events). Each micro-batch
folds its events (ts-ordered) into the state and emits the updated counts in
'update' mode. On a bounded source drained in micro-batches the final row per
user equals the batch operator's result — asserted in tests."""

from __future__ import annotations

import uuid
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = "user_id long, n_sessions long, n_events long"
STATE_SCHEMA = "last_us long, n_sessions long, n_events long"


def _sessionize_group(key, pdfs: Iterable[pd.DataFrame],
                      state: GroupState):
    (user_id,) = key
    if state.exists:
        last_us, n_sessions, n_events = state.get
    else:
        last_us, n_sessions, n_events = None, 0, 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for us in ts_us.tolist():  # epoch micros regardless of Arrow unit
            if last_us is None or us - last_us > SESSION_GAP_US:
                n_sessions += 1
            last_us = us
            n_events += 1
    state.update((last_us, n_sessions, n_events))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_sessions": [n_sessions],
         "n_events": [n_events]}
    )


def session_counts_stream(spark: SparkSession, sf_dir: str,
                          files_per_trigger: int | None = None,
                          sink: str = "parquet",
                          out_dir: str | None = None) -> DataFrame:
    """Streaming session counts over the events table, driven to
    completion; returns the final per-user rows.

    Default sink is DISTRIBUTED: update-mode batches append to `out_dir`
    parquet via foreachBatch and the last row per user is reduced from the
    read-back (never through the driver). `sink="memory"` is the explicit
    bounded-test opt-in (round-3 verdict #2: the library default must not
    collect an unbounded stream driver-side)."""
    static = spark.read.parquet(f"{sf_dir}/events.parquet")
    reader = spark.readStream.schema(static.schema)
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    stream = reader.parquet(sf_dir)
    sessions = (
        stream.filter(stream.event_id.isNotNull())
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    # update mode emits one row per (user, batch); the final answer is the
    # last emission per user — n_events is monotone, so max_by on it
    last_per_user = """SELECT user_id, n_sessions, n_events FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) AS rn FROM {src}
            ) WHERE rn = 1"""
    if sink == "memory":
        name = f"sess_{uuid.uuid4().hex[:8]}"
        q = (
            sessions.writeStream.outputMode("update")
            .format("memory").queryName(name).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.sql(last_per_user.format(src=name))
    from .stream import _tmp_out  # noqa: PLC0415

    out = out_dir or _tmp_out()
    q = (
        sessions.writeStream.outputMode("update")
        .option("checkpointLocation", f"{out}/_checkpoint")
        .foreachBatch(lambda b, _i:
                      b.write.mode("append").parquet(f"{out}/data"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    import os  # noqa: PLC0415

    if not os.path.isdir(f"{out}/data"):
        return spark.createDataFrame([], sessions.schema)  # zero batches
    spark.read.parquet(f"{out}/data").createOrReplaceTempView(
        view := f"sess_out_{uuid.uuid4().hex[:8]}")
    return spark.sql(last_per_user.format(src=view))
