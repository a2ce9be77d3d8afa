"""Custom stateful streaming operator via ``applyInPandasWithState``:
the newcards known-set tracker (A2/D4 — ``maxKnownSetCount = 50``,
``Program.fs:15,143-151``) as continuously-maintained streaming state.

Input: a stream of successfully-crawled card events ``(kind, num)``
(e.g. the cards sink of ``streaming.pipeline.stream_pages_to_cards``).
State per ``kind``: the top-``MAX_KNOWN`` numeric ids seen so far, exactly
the reference's bounded known-set fold (union → sort desc → truncate).
Output per micro-batch and kind: the refreshed set, its max, and how many
ids were newly admitted — the signal the discovery loop keys off.

This is the (c)-tier operator pattern from the task brief: semantics that
neither plain aggregation (needs bounded evolving state across batches) nor
window functions (unbounded history) express — so it runs as an
Arrow-batched stateful pandas transform with explicit GroupState.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MAX_KNOWN = 50  # maxKnownSetCount, Program.fs:15

OUTPUT_SCHEMA = (
    "kind string, batch_max long, n_new int, n_known int, known_nums array<long>"
)
STATE_SCHEMA = "known array<long>"


def _track_known(key: tuple, pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    (kind,) = key
    known: list[int] = list(state.get[0]) if state.exists else []
    before = set(known)
    batch_max = None
    for pdf in pdfs:
        if not len(pdf):
            continue
        m = int(pdf["num"].max())  # vectorized over the Arrow batch
        batch_max = m if batch_max is None else max(batch_max, m)
        known.extend(pdf["num"].astype("int64").tolist())
    # the reference's fold: union -> sort desc -> truncate (Program.fs:143-151)
    known = sorted(set(known), reverse=True)[:MAX_KNOWN]
    state.update((known,))
    n_new = len(set(known) - before)
    yield pd.DataFrame(
        {
            "kind": [kind],
            "batch_max": [batch_max],
            "n_new": [n_new],
            "n_known": [len(known)],
            "known_nums": [known],
        }
    )


def known_set_tracker(card_events: DataFrame) -> DataFrame:
    """Apply the stateful known-set fold to a (kind, num) card-event stream."""
    return (
        card_events.groupBy("kind")
        .applyInPandasWithState(
            _track_known,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_known_set_tracker(spark, source_dir: str, out_dir: str,
                          checkpoint_dir: str, available_now: bool = True,
                          max_files_per_trigger: int | None = 1):
    """Stream (kind, num) parquet events through the tracker to a parquet
    sink; one output row per (micro-batch, kind) shows the state evolving."""
    reader = spark.readStream.schema("kind string, num long").format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    events = reader.load(source_dir)
    writer = (
        known_set_tracker(events)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
