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


# ---------------------------------------------------------------------------
# Per-host token-bucket politeness gate (north_rule: "per-host politeness
# scheduler ... token-bucket delay budgets") as cross-micro-batch state.
# The batch CrawlJob enforces budgets per wave (operators/politeness.py);
# a continuously-running fetcher needs the budget to survive batch
# boundaries — bucket fill is state, not a per-batch aggregate.
# ---------------------------------------------------------------------------

GATE_OUTPUT_SCHEMA = (
    "host string, url string, ts_ms long, admitted boolean, "
    "tokens_after double"
)
GATE_STATE_SCHEMA = "tokens double, last_ms long"


def _gate_host(capacity: float, rate_per_s: float):
    def gate(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            tokens, last_ms = float(state.get[0]), int(state.get[1])
        else:
            tokens, last_ms = float(capacity), -1
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            state.update((tokens, last_ms))
            return
        # deterministic within-batch order: event time, then url — the
        # stream's own clock, never the wall clock
        rows = rows.sort_values(["ts_ms", "url"], kind="mergesort")
        admitted, after = [], []
        for ts, _url in zip(rows["ts_ms"].astype("int64"), rows["url"]):
            ts = int(ts)
            if last_ms >= 0 and ts > last_ms:
                tokens = min(float(capacity),
                             tokens + (ts - last_ms) / 1000.0 * rate_per_s)
            last_ms = max(last_ms, ts)
            if tokens >= 1.0:
                tokens -= 1.0
                admitted.append(True)
            else:
                admitted.append(False)
            after.append(tokens)
        state.update((tokens, last_ms))
        yield pd.DataFrame(
            {
                "host": host,
                "url": rows["url"].to_numpy(),
                "ts_ms": rows["ts_ms"].astype("int64").to_numpy(),
                "admitted": admitted,
                "tokens_after": after,
            }
        )

    return gate


def politeness_gate(fetch_requests: DataFrame, capacity: float = 4.0,
                    rate_per_s: float = 1.0) -> DataFrame:
    """Token-bucket admission over a (host, url, ts_ms) fetch-request
    stream.  Each host's bucket starts full (``capacity``), refills at
    ``rate_per_s`` tokens/sec of *event time*, and every admitted request
    costs one token; a drained bucket rejects (``admitted = false``) until
    event time refills it.  State (tokens, last event ts) persists across
    micro-batches, so a burst split over two triggers is throttled exactly
    like the same burst in one — proven by the stream≡batch test.

    Scale: state is two scalars per host, hash-partitioned by host —
    10^8 hosts ≈ a few GB across the cluster; each group's work is a
    single Arrow-batched pass over its own rows.
    """
    return (
        fetch_requests.groupBy("host")
        .applyInPandasWithState(
            _gate_host(capacity, rate_per_s),
            outputStructType=GATE_OUTPUT_SCHEMA,
            stateStructType=GATE_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_politeness_gate(spark, source_dir: str, out_dir: str,
                        checkpoint_dir: str, capacity: float = 4.0,
                        rate_per_s: float = 1.0,
                        max_files_per_trigger: int | None = 1):
    """Stream (host, url, ts_ms) parquet requests through the gate to a
    parquet sink (availableNow, one file per trigger by default so tests
    exercise genuine cross-batch state)."""
    reader = spark.readStream.schema(
        "host string, url string, ts_ms long"
    ).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reqs = reader.load(source_dir)
    return (
        politeness_gate(reqs, capacity=capacity, rate_per_s=rate_per_s)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------- rate anomaly

ANOM_OUTPUT_SCHEMA = ("key string, bucket long, cnt long, n_hist long, "
                      "z double, is_anomaly boolean")
ANOM_STATE_SCHEMA = ("nb long, s1 long, s2 long, open_bucket long, "
                     "open_cnt long, dropped long")


def _anomaly_fold(bucket_ms: int, z_thresh: float):
    def fold(key: tuple, pdfs: Iterator[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            nb, s1, s2, ob, oc, dropped = (int(x) for x in state.get)
        else:
            nb, s1, s2, ob, oc, dropped = 0, 0, 0, -1, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not len(rows):
            state.update((nb, s1, s2, ob, oc, dropped))
            return
        rows = rows.sort_values(["ts_ms", "event_id"], kind="mergesort")
        out = []
        for ts in rows["ts_ms"].astype("int64"):
            b = int(ts) // bucket_ms
            if ob < 0:
                ob, oc = b, 1
            elif b == ob:
                oc += 1
            elif b > ob:
                # close the open bucket: score vs PRIOR history, then
                # fold.  Poisson floor on the std (count data can't have
                # variance below its mean's square root in expectation):
                # a flat history (std 0) still flags a genuine spike.
                z = 0.0
                if nb >= 1:
                    mean = s1 / nb
                    std = max(s2 / nb - mean * mean, 0.0) ** 0.5
                    z = (oc - mean) / max(std, mean ** 0.5)
                out.append((k, ob, oc, nb, round(z, 4),
                            abs(z) >= z_thresh))
                nb, s1, s2 = nb + 1, s1 + oc, s2 + oc * oc
                ob, oc = b, 1
            else:
                dropped += 1        # late past a closed bucket: watermark's
        state.update((nb, s1, s2, ob, oc, dropped))
        if out:
            yield pd.DataFrame(out, columns=[
                "key", "bucket", "cnt", "n_hist", "z", "is_anomaly",
            ])

    return fold


def rate_anomaly_stream(events: DataFrame, bucket_ms: int = 3_600_000,
                        z_thresh: float = 3.0) -> DataFrame:
    """Streaming (prequential) twin of
    :func:`crawler_spark.operators.events.rate_anomaly`: per key, each
    CLOSED event-time bucket is z-scored against the running mean/std
    of that key's previously closed buckets, then folded in — the
    one-pass online form of the batch detector (history grows as the
    stream runs; the batch op scores against the full history at once).
    The std carries a Poisson floor (``max(std, sqrt(mean))``) so a
    perfectly flat history still flags a genuine spike instead of
    dividing by zero variance.

    Cross-micro-batch exactness: a bucket whose events split over two
    triggers counts ONCE with the summed count (the open bucket rides
    the state); buckets close when a later bucket's first event
    arrives; events older than the open bucket are counted in a
    ``dropped`` state counter, not scored (a real deployment puts a
    watermark in front).  State is six integers per key.
    """
    return (
        events.groupBy("key")
        .applyInPandasWithState(
            _anomaly_fold(bucket_ms, z_thresh),
            outputStructType=ANOM_OUTPUT_SCHEMA,
            stateStructType=ANOM_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_rate_anomaly_stream(spark, source_dir: str, out_dir: str,
                            checkpoint_dir: str,
                            bucket_ms: int = 3_600_000,
                            z_thresh: float = 3.0,
                            max_files_per_trigger: int | None = 1):
    """Stream (key, event_id, ts_ms) parquet events through the anomaly
    fold to a parquet sink (availableNow; one file per trigger so tests
    exercise genuine cross-batch state)."""
    reader = spark.readStream.schema(
        "key string, event_id long, ts_ms long"
    ).format("parquet")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    ev = reader.load(source_dir)
    return (
        rate_anomaly_stream(ev, bucket_ms=bucket_ms, z_thresh=z_thresh)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
