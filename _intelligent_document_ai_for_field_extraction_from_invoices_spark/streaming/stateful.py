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
                          files_per_trigger: int | None = None) -> DataFrame:
    """Streaming session counts over the events table; returns the final
    per-user rows (memory sink, update mode, bounded source drained)."""
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
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory").queryName(name).start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends one row per (user, batch); keep the last per user
    return spark.sql(
        f"""SELECT user_id, n_sessions, n_events FROM (
              SELECT *, row_number() OVER (PARTITION BY user_id
                        ORDER BY n_events DESC) AS rn FROM {name}
            ) WHERE rn = 1"""
    )
