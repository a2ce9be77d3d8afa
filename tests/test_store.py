"""SnapshotStore maintenance: compaction (rewrite_data_files analog) and
snapshot expiry (expire_snapshots analog) — the operational pieces a
one-snapshot-per-wave crawl needs to not accumulate files forever."""

from __future__ import annotations

from pathlib import Path

from crawler_spark.sources.store import SnapshotStore


def _commit_range(spark, store, table, lo, hi):
    df = spark.range(lo, hi).withColumnRenamed("id", "v")
    return store.commit(table, df, mode="append")


def test_compact_rewrites_to_one_dir_preserving_data_and_history(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    _commit_range(spark, store, "t", 0, 10)       # snap 0
    _commit_range(spark, store, "t", 10, 25)      # snap 1
    _commit_range(spark, store, "t", 25, 30)      # snap 2
    assert len(store.snapshots("t")[-1]["dirs"]) == 3

    before = sorted(r["v"] for r in store.read(spark, "t").collect())
    snap_id = store.compact(spark, "t", target_partitions=1)
    assert snap_id == 3
    latest = store.snapshots("t")[-1]
    assert latest["dirs"] == ["snap-3"]           # one dir after compaction
    assert latest["compaction_of"] == 2
    after = sorted(r["v"] for r in store.read(spark, "t").collect())
    assert after == before == list(range(30))
    # time-travel below the compaction still resolves (old dirs untouched)
    asof1 = sorted(r["v"] for r in store.read(spark, "t", as_of=1).collect())
    assert asof1 == list(range(25))
    # nothing left to compact
    assert store.compact(spark, "t") is None


def test_compact_on_empty_or_single_dir_is_noop(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    assert store.compact(spark, "empty") is None
    _commit_range(spark, store, "one", 0, 5)
    assert store.compact(spark, "one") is None


def test_expire_snapshots_gc_and_horizon(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    _commit_range(spark, store, "t", 0, 10)       # snap 0
    _commit_range(spark, store, "t", 10, 20)      # snap 1
    store.compact(spark, "t", target_partitions=1)  # snap 2 (dirs: snap-2)
    _commit_range(spark, store, "t", 20, 22)      # snap 3 (dirs: snap-2,3)

    res = store.expire_snapshots("t", keep_last=2)
    assert res == {"expired": 2, "deleted_dirs": 2}   # snap-0, snap-1 dirs GC'd
    assert not (Path(str(tmp_path)) / "t" / "snap-0").exists()
    assert not (Path(str(tmp_path)) / "t" / "snap-1").exists()
    # snap-2's dir survives: still referenced by the kept snapshot 3
    assert (Path(str(tmp_path)) / "t" / "snap-2").exists()

    # latest read unaffected; incremental reads above the horizon unaffected
    vals = sorted(r["v"] for r in store.read(spark, "t").collect())
    assert vals == list(range(22))
    assert store.data_dirs_between("t", after=2) == [
        str(Path(str(tmp_path)) / "t" / "snap-3")
    ]
    # time-travel below the horizon intentionally stops resolving
    assert store.read(spark, "t", as_of=1) is None
    # idempotent at the same horizon
    assert store.expire_snapshots("t", keep_last=2) == {
        "expired": 0, "deleted_dirs": 0,
    }


def test_expire_never_touches_latest(spark, tmp_path):
    store = SnapshotStore(str(tmp_path))
    _commit_range(spark, store, "t", 0, 4)
    res = store.expire_snapshots("t", keep_last=1)
    assert res == {"expired": 0, "deleted_dirs": 0}
    assert sorted(r["v"] for r in store.read(spark, "t").collect()) == [0, 1, 2, 3]
