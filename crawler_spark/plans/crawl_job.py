"""Wave-based crawl scheduler (D4/D5 + K1-K6) with snapshot checkpoint/resume.

The reference's actor pipeline (card agent → downloader → photo fan-in,
SURVEY §3.1) is re-expressed as deterministic fetch-wave micro-batches:

wave k:
  1. pending frontier  ←  snapshot k-1          (frontier table, overwrite)
  2. drop seen (anti-join ∪ bloom prefilter) and known-missing (C1-C3)
  3. politeness token-bucket selects ≤budget urls/host (F3); rest deferred
  4. fetch = left join vs `pages` (F1/J3)
  5. cards:  downloaded → parse UDF (P15) → `cards` append;
             photo fan-out (J1) enqueued for wave k+1
     photos: downloaded → image validation (P18) → `card_photos` append
     absent  → `missing` append  (MissingResourceTracker semantics)
  6. `seen` append (url_hash of everything successfully stored — absent
     lives in `missing`, transport errors stay out so retries can re-fetch),
     `crawl_log` append (wave, seq, id, status, error) — crawl-order evidence
  7. new frontier snapshot = deferred ∪ fan-out ∪ in-budget retries

Every table is a SnapshotStore (Iceberg-contract) table; killing the job
between waves and resuming from the latest snapshots reproduces the exact
same remaining execution (tested in tests/test_resume.py).

Determinism contract (SURVEY §4.2): crawl order = (wave, seq) where seq is
the reference's enumeration order — rf before rl, n ascending (Utils.fs:20-23),
photos in card array order scaled into the parent's seq slot.  The final
URL-seen set = seen ∪ missing = the reference's {card dirs} ∪ {missing lines}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.parse_udfs import with_parsed_card
from ..functions.url import url_hash, url_host
from ..operators.fetch import fetch_downloaded, fetch_wave, within_retry_budget
from ..operators.photos import fanin_photos, fanout_photos, validate_image
from ..operators.politeness import (
    apply_robots, hot_host_list, select_wave, select_wave_salted,
)
from ..operators.seen import (
    CuckooFilter,
    ShardedBloom,
    build_bloom_into,
    filter_from_bytes,
    filter_not_missing,
    filter_unseen,
    filter_unseen_with_bloom,
    filter_unseen_with_bloom_sharded,
)
from ..sources.frontier import frontier_from_range
from ..sources.store import SnapshotStore

FRONTIER_SCHEMA = (
    "seq long, id string, url string, num long, kind string, url_hash long, "
    "host string, resource_type string, attempt int"
)
SEEN_SCHEMA = "url_hash long, id string, wave int"
MISSING_SCHEMA = "id string, wave int"
LOG_SCHEMA = "wave int, seq long, id string, resource_type string, status string, error string"

# photos occupy seq slots right after their parent card:
# photo_seq' = parent_seq * PHOTO_SEQ_SLOT + photo_index + 1 (≤64 photos/card)
PHOTO_SEQ_SLOT = 64


class CrawlJob:
    def __init__(self, spark: SparkSession, store_dir: str, pages_df: DataFrame,
                 wave_seconds: int = 3600, robots_df: DataFrame | None = None,
                 use_bloom: bool = False, salted: bool = True,
                 prewarm: bool = True, bloom_capacity: int = 2_000_000,
                 bloom_fpp: float = 0.01, bloom_shards: int = 32,
                 faults_df: DataFrame | None = None,
                 retry_delay_unit_ms: int | None = None,
                 retry_max_delay_ms: int | None = None,
                 seen_filter: str = "bloom",
                 prefilter_min_seen: int = 2_000_000,
                 pages_bucketed: bool = False,
                 hot_refresh_waves: int = 4,
                 hot_host_threshold: int = 100_000):
        self.spark = spark
        self.store = SnapshotStore(store_dir)
        self.pages = pages_df
        # pages_bucketed: pages_df is a catalog table written by
        # sources.pages.write_pages_bucketed (bucketed by url_hash) — the
        # payload joins then run storage-partitioned with NO Exchange on the
        # pages side at any wave size (the 10^10-url layout, operators/fetch)
        self.pages_bucketed = pages_bucketed
        if pages_bucketed:
            assert "url_hash" in pages_df.columns, (
                "bucketed pages must carry url_hash (write_pages_bucketed)"
            )
        self.wave_seconds = wave_seconds
        self.robots = robots_df
        self.use_bloom = use_bloom
        self.salted = salted
        # hot-host cache for the salted selector: the set of hosts above
        # the salting threshold changes slowly between waves, so the
        # per-wave frontier count aggregation is refreshed only every
        # hot_refresh_waves waves (a stale entry costs a few waves of
        # per-salt rounding or single-task ranking, never a budget
        # violation beyond the documented n_salts-1 overshoot).
        # Composition-shift guard: a wave whose frontier size estimate
        # (previous wave's deferred + enqueued_photos — free from the
        # wave stats) moved outside [0.5x, 2x] of the size at the last
        # refresh forces an early refresh — this is exactly the
        # card-wave -> photo-wave transition, where a never-seen host
        # (the photo CDN) can arrive already-hot and would otherwise
        # rank unsalted in one task for up to hot_refresh_waves-1 waves.
        self.hot_refresh_waves = max(1, hot_refresh_waves)
        self.hot_host_threshold = hot_host_threshold
        self._hot_hosts: list[str] | None = None
        self._hot_age = 0
        self._hot_n: int | None = None   # frontier-size est at last refresh
        self._next_n: int | None = None  # est of the upcoming wave's frontier
        # F2 fault/retry surface: faults_df (url, fail_attempts) injects
        # transport errors; the fib budget parameters default to the
        # reference's 100ms unit / 180s cap (Downloader.fs:134-137)
        self.faults = faults_df
        from ..operators.fetch import DELAY_UNIT_MS, MAX_PERMITTED_DELAY_MS
        self.retry_delay_unit_ms = retry_delay_unit_ms or DELAY_UNIT_MS
        self.retry_max_delay_ms = retry_max_delay_ms or MAX_PERMITTED_DELAY_MS
        # wave pipelining state: one shared driver pool; per-table commit
        # chains (a table's next commit waits on its previous one, so
        # snapshot ids can never race); the deferred-finalize queue
        self._pool_obj = None
        self._last_commit: dict = {}
        self._pending: list = []
        # incremental seen-filter state: the merged filter (bloom or the
        # deletion-capable cuckoo variant, north_rule "bloom/cuckoo") and the
        # seen snapshot id it covers; persisted per wave under seen_bloom/ so
        # a resumed job reloads it instead of rescanning the seen table
        # "sharded-routed" = same ShardedBloom state, but the wave
        # prefilter ROUTES each bitmap shard to the tasks holding its key
        # range (cogroup) instead of broadcasting the whole filter — the
        # 10^10-key layout where a full filter no longer fits an executor
        assert seen_filter in ("bloom", "cuckoo", "sharded-routed")
        self.seen_filter = seen_filter
        self._filter_degraded = False  # cuckoo overflow -> exact path only
        # cost gate: while |seen| is below this, the exact anti-join is
        # cheaper than paying the prefilter UDF over the whole frontier
        # (measured: at sandbox scale the anti-join won every round), so the
        # filter is MAINTAINED each wave (cheap driver-side fold) but only
        # APPLIED once the seen side is big enough to dominate the anti-join
        self.prefilter_min_seen = prefilter_min_seen
        self.bloom_capacity = bloom_capacity
        self.bloom_fpp = bloom_fpp
        self.bloom_shards = bloom_shards
        self._bloom: ShardedBloom | None = None
        self._bloom_snap = -1
        self._bloom_dir = self.store.root / "seen_bloom"
        if prewarm:
            self._prewarm_python_workers()

    def _prewarm_python_workers(self) -> None:
        """Spawn + warm one Python worker per core (imports, Arrow streams)
        BEFORE the first wave — otherwise worker startup serializes into the
        first parse stage and distorts its latency (measured: tens of
        seconds at 32 cores)."""
        n = self.spark.sparkContext.defaultParallelism
        probe = self.spark.range(0, n * 4, 1, n).select(
            F.lit("<html><body></body></html>").alias("text")
        )
        with_parsed_card(probe, "text").select("card.error").count()

    # ------------------------------------------------------------------ state
    def _read(self, table: str, schema: str) -> DataFrame:
        return self.store.read_or_empty(self.spark, table, schema)

    # ------------------------------------------------------------------ bloom
    def _bloom_blob_path(self, seen_snap: int):
        return self._bloom_dir / f"merged-{seen_snap}.bin"

    def _bloom_sync(self) -> ShardedBloom | None:
        """Bring the in-memory merged seen-bloom up to the latest seen
        snapshot WITHOUT rescanning the seen table.

        Fast path: the filter (persisted per wave as a single blob) already
        covers the latest snapshot — zero I/O.  Crash/resume path: load the
        newest blob, then top up from ONLY the snapshot data dirs committed
        after it (each commit writes exactly one new dir).  A full build
        happens at most once per store lifetime (legacy store with no blob).
        Returns None while the seen table is empty (nothing to prefilter).
        """
        latest = self.store.latest_snapshot_id("seen")
        if latest is None:
            if self._bloom is None:
                self._bloom = self._filter_new()
                self._bloom_snap = -1
            return None
        if self._filter_degraded:
            return None
        if self._bloom is not None and self._bloom_snap >= latest:
            return self._bloom
        if self._bloom is None:
            # newest persisted blob ≤ latest, if any
            best = -1
            if self._bloom_dir.exists():
                for p in self._bloom_dir.glob("merged-*.bin"):
                    try:
                        sid = int(p.stem.split("-")[1])
                    except ValueError:
                        continue
                    if best < sid <= latest:
                        best = sid
            if best >= 0:
                self._bloom = filter_from_bytes(
                    self._bloom_blob_path(best).read_bytes()
                )
                self._bloom_snap = best
            else:
                self._bloom = self._filter_new()
                self._bloom_snap = -1
        if self._bloom_snap < latest:
            dirs = self.store.data_dirs_between("seen", self._bloom_snap, latest)
            if dirs:
                delta = self.spark.read.parquet(*dirs).select("url_hash")
                self._filter_add(delta)
            self._bloom_snap = latest
            if self._filter_degraded:
                return None
            self._persist_bloom()
        return self._bloom

    def _filter_new(self):
        if self.seen_filter == "cuckoo":
            return CuckooFilter.sized(self.bloom_capacity)
        return ShardedBloom.sized(
            self.bloom_capacity, self.bloom_fpp, self.bloom_shards
        )

    # a wave's keys below this come to the driver as one Arrow batch and
    # fold in-process (milliseconds); above it, the distributed mapInPandas
    # partial build runs.  Round 2 ran the 32-task partial job for EVERY
    # wave — ~10 s of fixed cost per wave that a politeness-bounded wave
    # (tens of thousands of keys) never needed.
    DRIVER_FOLD_MAX_ROWS = 2_000_000

    def _filter_add(self, keys_df: DataFrame, n_rows: int | None = None) -> None:
        """Fold a key DataFrame into the in-memory filter.

        Bloom, small/known wave: one driver-side Arrow fetch + vectorized
        ``add_many``.  Bloom, unknown or huge input (legacy full rebuild):
        distributed mapInPandas partials, OR-merged (bytes move, not rows).
        Cuckoo: driver-side vectorized insert — bounded because only
        politeness-bounded waves are ever added; a cuckoo overflow
        (capacity undersized) would mean false negatives, so it DEGRADES
        the job to the exact anti-join path instead (correctness is never
        at stake).
        """
        import numpy as _np

        if isinstance(self._bloom, CuckooFilter):
            keys = keys_df.toPandas()["url_hash"].to_numpy(_np.int64)
            if self._bloom.insert_many(keys):
                self._filter_degraded = True
        elif n_rows is not None and n_rows <= self.DRIVER_FOLD_MAX_ROWS:
            keys = keys_df.toPandas()["url_hash"].to_numpy(_np.int64)
            self._bloom.add_many(keys)
        else:
            partial = build_bloom_into(keys_df, self._bloom.empty_like())
            self._bloom.bits |= partial.bits
            self._bloom.n_items += partial.n_items

    def _bloom_add_wave(self, wave_keys_df: DataFrame, seen_snap: int,
                        n_rows: int | None = None) -> None:
        """Fold the freshly committed wave's keys into the merged filter and
        persist — the only per-wave filter work (the wave, never the table)."""
        if self._bloom is None:
            # first wave with anything stored: seen was empty until now, so
            # the sync path had nothing to load — start a fresh filter
            self._bloom = self._filter_new()
            self._bloom_snap = -1
        self._filter_add(wave_keys_df, n_rows)
        self._bloom_snap = seen_snap
        if not self._filter_degraded:
            self._persist_bloom()

    def _persist_bloom(self) -> None:
        import os

        self._bloom_dir.mkdir(parents=True, exist_ok=True)
        path = self._bloom_blob_path(self._bloom_snap)
        tmp = path.with_suffix(".bin.tmp")
        tmp.write_bytes(self._bloom.to_bytes())
        os.replace(tmp, path)  # atomic, like the manifest

    # ------------------------------------------------------ wave pipelining
    @property
    def _pool(self):
        """Shared driver thread pool for wave-tail jobs.  16 workers is
        deadlock-safe by construction: pipeline depth is capped at 2 waves
        (see run_wave head), each wave submits ≤12 tasks, and a wave's
        tasks only ever wait on the PREVIOUS wave's — which were submitted
        first, so FIFO worker assignment means they already hold workers
        and can always make progress (they depend only on a fully-drained
        wave)."""
        if self._pool_obj is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool_obj = ThreadPoolExecutor(
                max_workers=16, thread_name_prefix="crawl-tail"
            )
        return self._pool_obj

    def _submit_chained(self, label: str, steps: dict, table: str, fn):
        """Submit ``fn`` chained on ``table``'s previous commit — concurrent
        across TABLES, serialized per table, so two pipelined waves can
        never race a snapshot id.  ``prev`` is captured HERE, on the driver
        thread, so chain order is submission order even though the bodies
        run on pool threads."""
        import time as _time

        prev = self._last_commit.get(table)

        def run():
            if prev is not None:
                prev.result()
            ts = _time.perf_counter()
            out = fn()
            steps[label] = round(_time.perf_counter() - ts, 3)
            return out

        fut = self._pool.submit(run)
        self._last_commit[table] = fut
        return fut

    def _submit_commit(self, label: str, steps: dict, table: str,
                       df: DataFrame, mode: str = "append"):
        return self._submit_chained(
            label, steps, table,
            lambda: self.store.commit(table, df, mode=mode),
        )

    def _await_tables(self, *tables: str) -> None:
        """Barrier on the commit chains the NEXT wave's plan reads."""
        for t in tables:
            f = self._last_commit.get(t)
            if f is not None:
                f.result()

    def _drain_pending(self) -> None:
        pending, self._pending = self._pending, []
        for fin in pending:
            fin.result()

    def next_wave_number(self) -> int:
        latest = self.store.latest_snapshot_id("frontier")
        return 0 if latest is None else latest + 1

    def pending_frontier(self) -> DataFrame:
        return self._read("frontier", FRONTIER_SCHEMA)

    # ------------------------------------------------------------------ seeds
    def seed_range(self, first: int, last: int) -> None:
        """Range mode seed (D5, Program.fs:47-62)."""
        self.seed_frontier(frontier_from_range(self.spark, first, last))

    def seed_frontier(self, frontier_df: DataFrame) -> None:
        assert self.store.latest_snapshot_id("frontier") is None, "already seeded"
        self.store.commit("frontier", frontier_df, mode="overwrite")

    def enqueue_frontier(self, frontier_df: DataFrame) -> None:
        """Union new descriptors into the pending frontier (newcards mode:
        each poll cycle enqueues freshly discovered ids, Program.fs:97-98)."""
        if self.store.latest_snapshot_id("frontier") is None:
            self.store.commit("frontier", frontier_df, mode="overwrite")
            return
        merged = (
            self.pending_frontier()
            .unionByName(frontier_df)
            .dropDuplicates(["id"])
        )
        self.store.commit("frontier", merged, mode="overwrite")

    # ------------------------------------------------------------------ waves
    def run_wave(self, drain: bool = True) -> dict:
        """Execute one fetch wave; commits one snapshot per state table.
        Returns wave stats (also appended to crawl_log), including a
        ``step_seconds`` breakdown — the per-wave lineage/metrics surface.

        ``drain=False`` pipelines waves the way a real crawler overlaps
        fetch with store: the wave returns as soon as its tail jobs are
        SUBMITTED, and the next wave's frontier/politeness/fetch pipeline
        runs while this wave's cards/log/metrics commits finish.  The next
        wave's head barriers only on the commit chains its plan actually
        reads (frontier, seen, missing); per-table commit chaining keeps
        snapshot ids race-free; the returned stats dict is completed in
        place when :meth:`crawl` drains.  Pipeline depth is capped at 2."""
        import time as _time

        steps: dict[str, float] = {}

        def _mark(label: str, t0: float) -> float:
            now = _time.perf_counter()
            steps[label] = round(now - t0, 3)
            return now

        t0 = _time.perf_counter()
        # pipeline-depth cap (deadlock-safe pool sizing, see _pool) + the
        # head barrier: everything this wave's PLAN reads must be committed
        while len(self._pending) > 1:
            self._pending.pop(0).result()
        self._await_tables("frontier", "seen", "missing")
        t0 = _mark("await_prev_wave", t0)
        wave = self.next_wave_number()
        # snapshot-summary row counts (Iceberg planner stats): the drained
        # check is a manifest lookup, not a scan job; a None (pre-summary
        # manifest) falls back to the scan-side isEmpty
        n_frontier = self.store.total_rows("frontier")
        if n_frontier == 0:
            return {"wave": wave, "fetched": 0, "done": True}
        frontier = self.pending_frontier()
        if n_frontier is None and frontier.isEmpty():
            return {"wave": wave, "fetched": 0, "done": True}
        t0 = _mark("read_frontier", t0)

        # C1-C3: negative cache first (reference checks missing before local
        # presence, CrawlerPet911.fs:79-92), then the positive seen set.
        # Both anti-joins are ELIDED when the manifest row counts prove the
        # build side empty — the stats-based join elision a real catalog
        # (Iceberg total-records) gives its planner.  In a fully-resolving
        # corpus the missing table stays at 0 rows forever, so this deletes
        # a shuffle barrier from every wave, not just wave 0.
        if self.store.total_rows("missing") != 0:
            missing = self._read("missing", MISSING_SCHEMA)
            frontier = filter_not_missing(frontier, missing)
        wave_persisted: list = []  # prefilter caches to release at wave end
        if self.store.total_rows("seen") == 0:
            pass  # wave 0 (or nothing stored yet): no seen filter at all
        elif self.use_bloom:
            seen = self._read("seen", SEEN_SCHEMA)
            # incremental filter: covers all committed seen snapshots without
            # rescanning the seen table (per-wave folds; the exact anti-join
            # backstop guarantees correctness).  None ⇒ seen empty or the
            # cuckoo overflowed (degraded) — either way the exact anti-join
            # is the safe path (a no-op against an empty seen table).  The
            # cost gate keeps the exact path while |seen| is small enough
            # that the anti-join beats a prefilter pass over the frontier.
            bloom = self._bloom_sync()
            use_prefilter = (
                bloom is not None and bloom.n_items >= self.prefilter_min_seen
            )
            prefilter_fn = (
                filter_unseen_with_bloom_sharded
                if self.seen_filter == "sharded-routed"
                else filter_unseen_with_bloom
            )
            frontier = (
                prefilter_fn(
                    frontier, seen, bloom, persisted_out=wave_persisted
                )
                if use_prefilter
                else filter_unseen(frontier, seen)
            )
        else:
            frontier = filter_unseen(
                frontier, self._read("seen", SEEN_SCHEMA)
            )

        if self.robots is not None:
            frontier = apply_robots(frontier, self.robots)

        t0 = _mark("seen_missing_filters", t0)

        # F3: politeness token bucket.  The salted path reuses the cached
        # hot-host list (refreshed every hot_refresh_waves) so the steady-
        # state wave pays ONE frontier scan + ONE shuffle instead of a
        # count aggregation job per wave.
        if self.salted:
            est = self._next_n
            shifted = est is not None and (
                self._hot_n is None
                or not (self._hot_n // 2 <= est <= self._hot_n * 2)
            )
            if (self._hot_hosts is None
                    or self._hot_age >= self.hot_refresh_waves
                    or shifted):
                self._hot_hosts = sorted(
                    r["host"] for r in hot_host_list(
                        frontier, self.hot_host_threshold
                    ).collect()
                )
                self._hot_age = 0
                self._hot_n = est
            self._hot_age += 1
            hot_df = self.spark.createDataFrame(
                [(h,) for h in self._hot_hosts], "host string"
            )
            picked = select_wave_salted(
                frontier, self.wave_seconds, self.robots, hot_hosts=hot_df
            )
        else:
            picked = select_wave(frontier, self.wave_seconds, self.robots)
        picked.cache()
        batch = picked.where(F.col("selected")).drop("selected")
        deferred = picked.where(~F.col("selected")).drop("selected")

        t0 = _mark("politeness_select", t0)

        # F1/J3: fetch.  The page payloads (html/text, kilobytes per row) are
        # each consumed exactly ONCE — text by the card parser, html by the
        # image validator — so only the slim status columns are cached; the
        # payload-bearing join is streamed straight into its single consumer
        # instead of being materialized.  At 100 TB caching payloads would be
        # the memory bottleneck; this shape never holds a page after use.
        fetched = fetch_wave(
            batch, self.pages, payload=False, faults_df=self.faults
        ).cache()
        # materialize the slim cache + wave counts in ONE job, so the heavy
        # payload paths below can be skipped entirely when their input is
        # empty (a pages scan per skipped path saved — e.g. photo-only waves)
        frow = fetched.agg(
            F.count(F.lit(1)).alias("fetched"),
            F.sum(F.when(F.col("fetch_status") == "downloaded", 1).otherwise(0)).alias("downloaded"),
            F.sum(F.when(F.col("fetch_status") == "absent", 1).otherwise(0)).alias("absent"),
            F.sum(
                F.when(
                    (F.col("resource_type") == "card")
                    & (F.col("fetch_status") == "downloaded"), 1
                ).otherwise(0)
            ).alias("cards_downloaded"),
            F.sum(
                F.when(
                    (F.col("resource_type") == "photo")
                    & (F.col("fetch_status") == "downloaded"), 1
                ).otherwise(0)
            ).alias("photos_downloaded"),
            F.sum(
                F.when(F.col("resource_type") == "card", 1).otherwise(0)
            ).alias("cards_total"),
            F.sum(
                F.when(F.col("resource_type") == "photo", 1).otherwise(0)
            ).alias("photos_total"),
        ).collect()[0]
        n_cards_dl = int(frow["cards_downloaded"] or 0)
        n_photos_dl = int(frow["photos_downloaded"] or 0)
        n_cards_wave = int(frow["cards_total"] or 0)
        n_photos_wave = int(frow["photos_total"] or 0)
        t0 = _mark("fetch_plan", t0)

        # ---- cards ----------------------------------------------------------
        if n_cards_dl:
            # wave size gates the join strategy: broadcast small waves,
            # hash-partitioned join for waves too big to broadcast
            parsed_src = fetch_downloaded(
                batch.where(F.col("resource_type") == "card"), self.pages,
                wave_rows=n_cards_wave, faults_df=self.faults,
                bucketed=self.pages_bucketed,
            )
        else:
            parsed_src = self.spark.createDataFrame(
                [], FRONTIER_SCHEMA + ", warc_ts timestamp, html binary, "
                    "text string, mime string, fetch_status string"
            )
        parsed = (
            with_parsed_card(parsed_src, "text")
            .select(
                "seq",
                # parsed card id (byte-identical extraction) when the parse
                # succeeded, else the frontier id so error rows stay addressable
                F.coalesce(F.col("card.id"), F.col("id")).alias("id"),
                "url", "num", "kind",
                # K1 .mime sidecar of the stored card (FileCollector.fs:36-40)
                "mime",
                *[F.col(f"card.{c}").alias(c) for c in
                  ("animal", "sex", "type", "address", "latitude", "longitude",
                   "date", "description", "author", "photos", "error")],
                # engine telemetry (dropped before the cards commit;
                # aggregated into wave_metrics.parse_fallbacks)
                "parse_fallback",
            )
        ).cache()
        good_cards = parsed.where(F.col("error").isNull())

        # J1: photo fan-out → next wave's frontier rows.  seq/num/kind ride
        # through the explode (card ids are unique), so the fan-out is a
        # narrow generate — no join-back shuffle on the wave's critical path.
        photo_frontier = (
            fanout_photos(
                good_cards.select(F.col("id"), "photos", "error",
                                  "seq", "num", "kind"),
                carry=("seq", "num", "kind"),
            )
            .select(
                (F.col("seq") * PHOTO_SEQ_SLOT + F.col("photo_seq") + 1).alias("seq"),
                F.col("photo_id").alias("id"),
                "url",
                "num",
                "kind",
                url_hash(F.col("url")).alias("url_hash"),
                url_host(F.col("url")).alias("host"),
                F.lit("photo").alias("resource_type"),
                F.lit(0).alias("attempt"),
            )
        )

        # ---- photos ---------------------------------------------------------
        if n_photos_dl:
            photos_src = fetch_downloaded(
                batch.where(F.col("resource_type") == "photo"), self.pages,
                wave_rows=n_photos_wave, faults_df=self.faults,
                bucketed=self.pages_bucketed,
            )
        else:
            photos_src = self.spark.createDataFrame(
                [], FRONTIER_SCHEMA + ", warc_ts timestamp, html binary, "
                    "text string, mime string, fetch_status string"
            )
        from ..operators.photos import mime_to_ext

        photo_results = validate_image(photos_src).select(
            F.split(F.col("id"), "/")[0].alias("card_id"),
            F.col("seq"),
            F.col("id").alias("photo_id"),
            F.col("url"),
            F.col("image_ok"),
            # K1/K2 mime sidecar (FileCollector.fs:36-40, captured at
            # Downloader.fs:114) + extension mapping (Images.fs:26-34)
            F.col("mime"),
            mime_to_ext(F.col("mime")).alias("ext"),
            F.when(~F.col("image_ok"), F.lit("Resource is not a valid image")).alias("error"),
        )

        absent = fetched.where(F.col("fetch_status") == "absent")

        # EVERY remaining wave action — the seven table commits, the bloom
        # fold, and the three stat aggregates — is submitted concurrently
        # from driver threads.  The round-4 stage profiler (BENCH.md §16.2)
        # measured the wave's fixed cost as ~10 s of SEQUENTIAL thin-job
        # latency (each ≤0.2 s of task time behind 0.4-1.3 s of
        # submit/barrier overhead); concurrent submission collapses that sum
        # to the slowest member.  Sharing the `parsed`/`picked`/`fetched`
        # caches across concurrent jobs is safe AND work-free: Spark's
        # BlockManager takes a per-block write lock in getOrElseUpdate, so a
        # second job needing a partition another job is already computing
        # blocks until it lands, then reads it — partitions are computed
        # exactly once no matter how many jobs race.

        # seen = successfully STORED resources ({dirs created} in the
        # reference) — absent goes to `missing`, transport errors stay out
        # entirely so the retry path can re-fetch them next wave
        seen_rows = fetched.where(
            F.col("fetch_status") == "downloaded"
        ).select(F.col("url_hash"), F.col("id"), F.lit(wave).alias("wave"))
        # per-host lineage metrics (K6 / north-rule "per-partition lineage
        # and fetch/parse metrics"): where each wave's fetches went, keyed by
        # the host the politeness layer shards on — committed concurrently
        # with the four state tables (one cheap agg over the slim cache)
        host_metrics = fetched.groupBy("host").agg(
            F.count(F.lit(1)).alias("fetched"),
            F.sum(F.when(F.col("fetch_status") == "downloaded", 1).otherwise(0)).alias("downloaded"),
            F.sum(F.when(F.col("fetch_status") == "absent", 1).otherwise(0)).alias("absent"),
            F.sum(F.when(F.col("fetch_status") == "error", 1).otherwise(0)).alias("errors"),
        ).select(F.lit(wave).alias("wave"), "host", "fetched", "downloaded",
                 "absent", "errors")
        # ---- crawl log plan (K5/K6, ordering evidence) — lazy until commit
        log = fetched.select(
            F.lit(wave).alias("wave"),
            "seq",
            "id",
            "resource_type",
            F.col("fetch_status").alias("status"),
            F.when(
                (F.col("resource_type") == "card") & (F.col("fetch_status") == "absent"),
                F.lit("Absent"),
            ).alias("error"),
        ).unionByName(
            parsed.where(F.col("error").isNotNull()).select(
                F.lit(wave).alias("wave"),
                "seq",
                "id",
                F.lit("card").alias("resource_type"),
                F.lit("parse_error").alias("status"),
                "error",
            )
        )

        # ---- next frontier plan ---------------------------------------------
        # F2: transport errors (impossible against the deterministic corpus,
        # kept for the live-fetch variant) re-enter within the fib budget
        frontier_cols = [c.split(" ")[0] for c in FRONTIER_SCHEMA.split(", ")]
        retries = (
            fetched.where(F.col("fetch_status") == "error")
            .where(
                within_retry_budget(
                    F.col("attempt"),
                    self.retry_delay_unit_ms,
                    self.retry_max_delay_ms,
                )
            )
            .withColumn("attempt", F.col("attempt") + 1)
            .select(*frontier_cols)
        )
        next_frontier = deferred.unionByName(photo_frontier).unionByName(retries)

        def _timed(label, fn):
            def run():
                ts = _time.perf_counter()
                out = fn()
                steps[label] = round(_time.perf_counter() - ts, 3)
                return out
            return run

        def _seen_then_bloom():
            # seen = successfully STORED resources; the bloom fold chains
            # onto the commit inside the same thread (it needs the snapshot
            # id) — this wave's keys only, the seen table is never rescanned
            # after wave 0, and small waves fold driver-side in milliseconds.
            snap = self.store.commit("seen", seen_rows)
            if self.use_bloom:
                self._bloom_add_wave(
                    fetched.where(F.col("fetch_status") == "downloaded").select(
                        "url_hash"
                    ),
                    snap,
                    n_rows=int(frow["downloaded"] or 0),
                )
            return snap

        fut = {
            "cards": self._submit_commit(
                "tail.cards", steps, "cards",
                parsed.drop("url", "parse_fallback")),
            "card_photos": self._submit_commit(
                "tail.card_photos", steps, "card_photos", photo_results),
            "missing": self._submit_commit(
                "tail.missing", steps, "missing",
                absent.select("id", F.lit(wave).alias("wave"))),
            "seen": self._submit_chained(
                "tail.seen_bloom", steps, "seen", _seen_then_bloom),
            "host_metrics": self._submit_commit(
                "tail.host_metrics", steps, "host_metrics", host_metrics),
            "crawl_log": self._submit_commit(
                "tail.crawl_log", steps, "crawl_log", log),
            "frontier": self._submit_commit(
                "tail.next_frontier", steps, "frontier", next_frontier,
                mode="overwrite"),
            "parsed_ok": self._pool.submit(_timed(
                "tail.parsed_ok", good_cards.count)),
            "parse_fallbacks": self._pool.submit(_timed(
                "tail.parse_fallbacks",
                lambda: parsed.agg(F.sum(
                    F.col("parse_fallback").cast("long")
                ).alias("n")).collect()[0]["n"])),
            "enqueued_photos": self._pool.submit(_timed(
                "tail.enqueued_photos", photo_frontier.count)),
            "picked_agg": self._pool.submit(_timed(
                "tail.picked_agg",
                lambda: picked.agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("selected"), 1).otherwise(0)).alias(
                        "selected"),
                ).collect()[0])),
        }
        t_tail = _time.perf_counter()

        # stats returned NOW (head numbers are final; tail numbers are
        # filled in place by the finalize task) — callers that need the
        # complete dict drain first (run_wave default / crawl end)
        stats = {
            "wave": wave,
            "fetched": frow["fetched"],
            "downloaded": int(frow["downloaded"] or 0),
            "absent": int(frow["absent"] or 0),
            "parsed_ok": None,
            "deferred": None,
            "enqueued_photos": None,
            "done": False,
            "step_seconds": steps,
        }

        def _finalize():
            # barrier on THIS wave's tail, complete the stats in place,
            # persist the wave metrics row (the K6 trace surface, queryable
            # like any other table), then release the wave's caches
            results = {k: f.result() for k, f in fut.items()}
            steps["parallel_tail"] = round(_time.perf_counter() - t_tail, 3)
            prow = results["picked_agg"]
            stats["parsed_ok"] = results["parsed_ok"]
            stats["deferred"] = int(prow["n"]) - int(prow["selected"] or 0)
            stats["enqueued_photos"] = results["enqueued_photos"]
            # next wave's frontier size estimate, feeding the hot-host
            # composition-shift refresh (benign race under pipelining: a
            # missed update only delays the refresh to the age trigger)
            self._next_n = int(stats["deferred"]) + int(
                stats["enqueued_photos"] or 0
            )
            import json as _json

            return self.spark.createDataFrame(
                [(
                    wave, int(stats["fetched"]), stats["downloaded"],
                    stats["absent"], int(stats["parsed_ok"]),
                    int(stats["deferred"]), int(stats["enqueued_photos"]),
                    int(results["parse_fallbacks"] or 0),
                    _json.dumps(steps),
                )],
                "wave int, fetched long, downloaded long, absent long, "
                "parsed_ok long, deferred long, enqueued_photos long, "
                "parse_fallbacks long, step_seconds_json string",
            )

        def _release():
            picked.unpersist()
            fetched.unpersist()
            parsed.unpersist()
            for df in wave_persisted:
                df.unpersist()
            return stats

        # wave_metrics rides the same per-table chain as every other commit
        # (submission order = wave order, so snapshot ids stay monotone);
        # the metrics fn itself barriers on this wave's tail futures first.
        # Its own duration goes to a scratch dict — the metrics row can't
        # contain the timing of the commit that writes it.
        metrics_fut = self._submit_chained(
            "tail.wave_metrics", {}, "wave_metrics",
            lambda: self.store.commit("wave_metrics", _finalize()),
        )
        fin = self._pool.submit(
            lambda: (metrics_fut.result(), _release())[1]
        )
        self._pending.append(fin)
        if drain:
            self._drain_pending()
        return stats

    def crawl(self, max_waves: int | None = None) -> list[dict]:
        """Run waves until the frontier drains (D5 batch mode).  Waves are
        PIPELINED: wave w+1's frontier/politeness/fetch head overlaps wave
        w's cards/log/metrics tail (drain=False), the way a real crawler
        overlaps fetch with store; the final drain completes every stats
        dict in place before returning."""
        stats = []
        try:
            while max_waves is None or len(stats) < max_waves:
                s = self.run_wave(drain=False)
                if s.get("done"):
                    break
                stats.append(s)
        finally:
            self._drain_pending()
        return stats

    # ------------------------------------------------------------ maintenance
    def maintain(self, keep_last: int = 1) -> dict:
        """Between-session store maintenance: compact every table's current
        snapshot to one dir, then expire history to ``keep_last`` snapshots
        (Iceberg's routine rewrite_data_files + expire_snapshots pass).  A
        crawl commits one snapshot per wave per table, so without this the
        scan-side file count grows linearly with crawl age.

        Ordering is load-bearing for the incremental seen-filter: expiry
        drops manifest lines, and a filter blob older than the expiry
        horizon could no longer see those lines' data dirs to top up from —
        bloom false negatives, i.e. re-crawling seen urls.  So after
        compacting ``seen`` the filter is REBUILT from the compacted
        snapshot (one single-dir scan, accurate n_items for the cost gate),
        persisted, and older blobs are pruned — only then does history
        expire.  Resume always reads latest, which is never expired.

        Returns {table: {"compacted_to": id|None, "expired": n,
        "deleted_dirs": n}}.
        """
        out = {}
        for table in self.store.tables():
            snap = self.store.compact(self.spark, table)
            if table == "seen" and self.use_bloom and not self._filter_degraded:
                latest = self.store.latest_snapshot_id("seen")
                if latest is not None:
                    df = self.store.read(self.spark, "seen").select("url_hash")
                    self._bloom = self._filter_new()
                    self._filter_add(df, n_rows=df.count())
                    self._bloom_snap = latest
                    if not self._filter_degraded:
                        self._persist_bloom()
                        for p in self._bloom_dir.glob("merged-*.bin"):
                            try:
                                sid = int(p.stem.split("-")[1])
                            except ValueError:
                                continue
                            if sid < latest:
                                p.unlink()
            out[table] = {
                "compacted_to": snap,
                **self.store.expire_snapshots(table, keep_last=keep_last),
            }
        return out

    # ------------------------------------------------------------------ reads
    def cards(self) -> DataFrame:
        return self._read(
            "cards",
            "seq long, id string, num long, kind string, mime string, "
            "animal int, sex int, "
            "type int, address string, latitude double, longitude double, "
            "date timestamp, description string, "
            "author struct<name:string,phone:string,email:string>, "
            "photos array<struct<ID:string,url:string>>, error string",
        )

    def card_photos(self) -> DataFrame:
        return self._read(
            "card_photos",
            "card_id string, seq long, photo_id string, url string, "
            "image_ok boolean, mime string, ext string, error string",
        )

    def seen_set(self) -> DataFrame:
        return self._read("seen", SEEN_SCHEMA)

    def missing_set(self) -> DataFrame:
        return self._read("missing", MISSING_SCHEMA)

    def crawl_log(self) -> DataFrame:
        return self._read("crawl_log", LOG_SCHEMA)

    def wave_metrics(self) -> DataFrame:
        return self._read(
            "wave_metrics",
            "wave int, fetched long, downloaded long, absent long, "
            "parsed_ok long, deferred long, enqueued_photos long, "
            "parse_fallbacks long, step_seconds_json string",
        )

    def host_metrics(self) -> DataFrame:
        return self._read(
            "host_metrics",
            "wave int, host string, fetched long, downloaded long, "
            "absent long, errors long",
        )

    def revalidate_cards(self) -> dict:
        """C4 cache self-heal (Crawler.fs:71-84): cards whose stored parse
        failed re-enter the frontier and are dropped from the seen set so
        the next wave re-fetches and re-parses them.

        The reference re-parses each local copy on every access and
        re-downloads on failure; batch-side that is one revalidation sweep:
        ``error IS NOT NULL`` rows (the stored parse verdict) are exactly
        the local copies that would fail re-processing.  Seen-set removal is
        a metadata-only overwrite commit (Iceberg DELETE equivalent).

        Cards commits are append-only, so a successful re-parse ADDS an
        error-IS-NULL row next to the old error row — such cards are healed
        and must not re-enter the frontier (otherwise every sweep would
        re-fetch them forever).  Bad = has an error row AND no good row.
        """
        from ..sources.frontier import frontier_from_ids

        cards = self.cards()
        bad = (
            cards
            .where(F.col("error").isNotNull())
            .select("id")
            .distinct()
            .join(
                cards.where(F.col("error").isNull()).select("id").distinct(),
                "id",
                "left_anti",
            )
        )
        n_bad = bad.count()
        if not n_bad:
            return {"revalidated": 0}
        refetch = frontier_from_ids(bad)
        healed_seen = self.seen_set().join(
            refetch.select("url_hash"), "url_hash", "left_anti"
        )
        # bring the seen-filter up to date BEFORE the overwrite: it then
        # covers a superset of the healed table without ever re-reading it
        flt = self._bloom_sync() if self.use_bloom else None
        self.store.commit("seen", healed_seen, mode="overwrite")
        if flt is not None and not self._filter_degraded:
            if isinstance(flt, CuckooFilter):
                # the deletion-capable variant removes the healed keys so
                # the prefilter stays precise; a bloom keeps them as stale
                # false positives (correct either way — the exact anti-join
                # backstop decides)
                import numpy as _np

                keys = refetch.select("url_hash").toPandas()["url_hash"].to_numpy(
                    _np.int64
                )
                flt.delete_many(keys)
            self._bloom_snap = self.store.latest_snapshot_id("seen")
            self._persist_bloom()
        self.enqueue_frontier(refetch)
        return {"revalidated": n_bad}

    def finalize(self) -> DataFrame:
        """Cards joined with their photo fan-in barrier (J2)."""
        results = self.card_photos().select(
            "card_id",
            F.col("seq").alias("photo_seq"),
            "photo_id",
            F.col("image_ok").alias("photo_ok"),
            "error",
        )
        fanin = fanin_photos(results)
        from ..operators.photos import cards_with_photo_status

        return cards_with_photo_status(self.cards().where(F.col("error").isNull()), fanin)
