"""WARC source/sink: serialization invariants, parser tolerance, the
distributed write→read round trip, CDX offset fidelity (ranged-read
checked against the real files), and the ingestion composition that lands
in the BASELINE input_hint shape."""

import gzip
import hashlib
import io

import pytest
from pyspark.sql import functions as F

from crawler_spark.sources import warc as W


def _docs_df(spark, sf_dir, n=200):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(n)
    return docs.select(
        F.concat(F.lit("https://corpus.example/"), F.col("source"),
                 F.lit("/"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id"))
        .alias("warc_ts"),
        F.encode(F.col("text"), "utf-8").alias("html"),
    )


def test_record_size_formula():
    url, date, payload = "https://a.example/x", "2024-01-01T00:00:07Z", b"hi!"
    rec = W.warc_record_bytes(url, date, payload)
    assert len(rec) == (W._HEADER_CONST + len(url)
                        + len(str(len(payload))) + len(payload))
    # deterministic bytes: same inputs, same record (incl. the uuid5 id)
    assert rec == W.warc_record_bytes(url, date, payload)


def test_parse_single_and_envelope():
    date = "2024-01-01T00:00:07Z"
    plain = W.warc_record_bytes("https://a/x", date, b"<p>hi</p>")
    env = W.warc_record_bytes("https://a/y", date, b"<p>ho</p>",
                              http_envelope=True)
    recs = W.parse_warc(plain + env)
    assert [r["url"] for r in recs] == ["https://a/x", "https://a/y"]
    assert recs[0]["payload"] == b"<p>hi</p>" and recs[0]["http_status"] is None
    assert recs[1]["payload"] == b"<p>ho</p>" and recs[1]["http_status"] == 200
    assert recs[0]["offset"] == 0 and recs[1]["offset"] == len(plain)
    assert recs[1]["length"] == len(env)


def test_parse_tolerates_truncation_and_garbage():
    date = "2024-01-01T00:00:07Z"
    rec = W.warc_record_bytes("https://a/x", date, b"payload")
    assert len(W.parse_warc(rec + b"WARC/1.0\r\nbroken")) == 1
    assert len(W.parse_warc(rec + rec[: len(rec) // 2])) == 1
    assert len(W.parse_warc(b"not a warc at all")) == 0
    assert W.parse_warc(b"\x1f\x8bcorrupt gzip") == []


def test_parse_gzip_whole_and_per_record_members():
    date = "2024-01-01T00:00:07Z"
    r1 = W.warc_record_bytes("https://a/1", date, b"one")
    r2 = W.warc_record_bytes("https://a/2", date, b"two")
    whole = gzip.compress(r1 + r2, mtime=0)
    got = W.parse_warc(whole)
    assert [r["payload"] for r in got] == [b"one", b"two"]

    def member(b):
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
            g.write(b)
        return buf.getvalue()

    m1, m2 = member(r1), member(r2)
    got = W.parse_warc(m1 + m2)
    assert [r["payload"] for r in got] == [b"one", b"two"]
    # per-member offsets describe the COMPRESSED regions (ranged reads)
    assert (got[0]["offset"], got[0]["length"]) == (0, len(m1))
    assert (got[1]["offset"], got[1]["length"]) == (len(m1), len(m2))


@pytest.mark.parametrize("gz", [False, True])
def test_write_read_roundtrip(spark, sf_dir, tmp_path, gz):
    src = _docs_df(spark, sf_dir)
    out = str(tmp_path / ("gz" if gz else "plain"))
    (tmp_path / ("gz" if gz else "plain")).mkdir()
    manifest = W.write_warc(src, out, shards=4, gzip_records=gz).collect()
    assert sorted(m["shard"] for m in manifest) == [0, 1, 2, 3]
    assert sum(m["records"] for m in manifest) == src.count()

    back = W.read_warc(spark, out + ("/*.warc.gz" if gz else "/*.warc"))
    exp = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in src.collect()}
    got = {(r["url"], r["warc_ts"], bytes(r["html"])) for r in back.collect()}
    assert got == exp


def test_cdx_offsets_support_ranged_reads(spark, sf_dir, tmp_path):
    src = _docs_df(spark, sf_dir, n=60)
    out = str(tmp_path)
    W.write_warc(src, out, shards=4).collect()
    idx = W.cdx_index(src, shards=4).collect()
    assert len(idx) == 60
    for row in idx[:10]:
        with open(f"{out}/{row['warc_file']}", "rb") as f:
            f.seek(row["warc_offset"])
            blob = f.read(row["warc_length"])
        (rec,) = W.parse_warc(blob)
        assert rec["url"] == row["url"]
        assert hashlib.md5(rec["payload"]).hexdigest() == row["digest"]
    # SURT urlkey shape
    key = next(r["urlkey"] for r in idx)
    assert key.startswith("example,corpus)/")


def test_pages_from_warc_matches_input_hint_shape(spark, sf_dir, tmp_path):
    src = _docs_df(spark, sf_dir, n=40)
    W.write_warc(src, str(tmp_path), shards=2).collect()
    pages = W.pages_from_warc(spark, str(tmp_path) + "/*.warc")
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert dict(pages.dtypes)["html"] == "binary"
    rows = pages.collect()
    assert len(rows) == 40
    # the synthetic docs are plain text: extraction must be the identity
    one = next(r for r in rows)
    assert one["text"] == bytes(one["html"]).decode()
    assert one["lang"] is not None


# ---------------------------------------------------------------------------
# property tests: the parser must invert the serializer for ARBITRARY payloads
# (including adversarial ones embedding record markers and CRLF runs) and for
# every archive layout (plain / whole-gzip / per-record members / envelope)
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_URL = st.from_regex(
    r"https://[a-z]{1,8}\.example/[a-z0-9/éп中]{0,20}",
    fullmatch=True)  # incl. non-ascii path chars: headers are UTF-8
_PAYLOAD = st.one_of(
    st.binary(min_size=0, max_size=400),
    # adversarial: payloads that look like record boundaries
    st.tuples(st.binary(max_size=50), st.binary(max_size=50)).map(
        lambda t: t[0] + b"\r\n\r\nWARC/1.0\r\n" + t[1]
    ),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(_URL, _PAYLOAD), min_size=1, max_size=6),
       st.sampled_from(["plain", "gzip_whole", "gzip_members", "envelope"]))
def test_parse_inverts_serialize(recs, layout):
    date = "2024-01-01T00:00:07Z"
    blobs = [
        W.warc_record_bytes(u, date, p, http_envelope=(layout == "envelope"))
        for u, p in recs
    ]
    if layout == "gzip_whole":
        data = gzip.compress(b"".join(blobs), mtime=0)
    elif layout == "gzip_members":
        def member(b):
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                g.write(b)
            return buf.getvalue()
        data = b"".join(member(b) for b in blobs)
    else:
        data = b"".join(blobs)
    got = W.parse_warc(data)
    assert [(r["url"], r["payload"]) for r in got] == recs
    if layout == "plain":
        # offsets partition the archive exactly, in order, gap-free
        assert got[0]["offset"] == 0
        for a, b in zip(got, got[1:]):
            assert b["offset"] == a["offset"] + a["length"]
        assert got[-1]["offset"] + got[-1]["length"] == len(data)


def test_ingest_warc_incremental(spark, sf_dir, tmp_path):
    from crawler_spark.sources.store import SnapshotStore

    arch = tmp_path / "archives"
    arch.mkdir()
    store = SnapshotStore(str(tmp_path / "store"))
    glob_ = str(arch) + "/*.warc"

    src = _docs_df(spark, sf_dir, n=80)
    W.write_warc(src, str(arch), shards=2).collect()

    # run 1: both archives consumed in one snapshot
    r1 = W.ingest_warc_incremental(spark, store, glob_)
    assert r1["snapshot"] == 0 and len(r1["new_files"]) == 2
    assert r1["rows"] == 80

    # run 2: nothing new → no snapshot written
    r2 = W.ingest_warc_incremental(spark, store, glob_)
    assert r2 == {"snapshot": None, "new_files": [], "rows": 0}
    assert store.latest_snapshot_id("warc_pages") == 0

    # a third archive appears: ONLY it is ingested
    extra = _docs_df(spark, sf_dir, n=120).exceptAll(src)
    W.write_warc(extra.withColumn(
        "url", F.regexp_replace("url", "corpus[.]example", "late.example")
    ), str(arch), shards=1).collect()
    import os
    os.rename(arch / "part-00000.warc", arch / "part-late.warc")
    r3 = W.ingest_warc_incremental(spark, store, glob_)
    assert r3["snapshot"] == 1 and len(r3["new_files"]) == 1
    assert r3["new_files"][0].endswith("part-late.warc")
    assert r3["rows"] == 40

    # full table = both ingests; lineage column traces every row's archive
    tbl = store.read(spark, "warc_pages")
    assert tbl.count() == 120
    assert tbl.where(F.col("warc_file").like("%part-late.warc")).count() == 40
    # exact-resume contract: time travel to snapshot 0 sees only run 1
    assert store.read(spark, "warc_pages", as_of=0).count() == 80


def test_write_wet_conversion_records(spark, sf_dir, tmp_path):
    from crawler_spark.sources.pages import build_pages

    pages = build_pages(spark, sf_dir, include_photos=False,
                        include_fixtures=False).limit(50)
    W.write_wet(pages, str(tmp_path), shards=2).collect()

    files = sorted(tmp_path.glob("*.warc.wet"))
    assert len(files) == 2
    recs = [r for f in files for r in W.parse_warc(f.read_bytes())]
    assert len(recs) == 50
    assert {r["rec_type"] for r in recs} == {"conversion"}
    assert {r["content_type"] for r in recs} == {"text/plain; charset=utf-8"}
    exp = {(r["url"], r["text"]) for r in pages.select("url", "text").collect()}
    got = {(r["url"], r["payload"].decode()) for r in recs}
    assert got == exp

    # and the Spark reader sees them as a normal pages-shaped frame
    back = W.read_warc(spark, str(tmp_path) + "/*.warc.wet")
    assert back.count() == 50


def test_read_warc_skips_warcinfo_and_filters_rec_types(spark, tmp_path):
    # real CC archives open with a warcinfo record: no Target-URI, no
    # addressable payload — the reader must skip it, not die
    info_body = b"software: test\r\nformat: WARC File Format 1.0\r\n"
    warcinfo = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-000000000000>\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: " + str(len(info_body)).encode() + b"\r\n\r\n"
        + info_body + b"\r\n\r\n"
    )
    date = "2024-01-01T00:00:07Z"
    resp = W.warc_record_bytes("https://a/x", date, b"<p>hi</p>")
    conv = W.warc_record_bytes("https://a/y", date, b"text",
                               rec_type="conversion",
                               content_type="text/plain")
    bad_date = W.warc_record_bytes("https://a/z", "not-a-date", b"zz")
    (tmp_path / "mixed.warc").write_bytes(warcinfo + resp + conv + bad_date)

    got = W.read_warc(spark, str(tmp_path / "mixed.warc")).collect()
    assert sorted(r["url"] for r in got) == ["https://a/x", "https://a/y"]

    only_resp = W.read_warc(spark, str(tmp_path / "mixed.warc"),
                            rec_types=("response",)).collect()
    assert [r["url"] for r in only_resp] == ["https://a/x"]


# ------------------------------------------------- review-finding regressions

def test_parse_rejects_negative_content_length():
    # a corrupt/malicious negative length must not loop forever
    date = "2024-01-01T00:00:07Z"
    good = W.warc_record_bytes("https://a/ok", date, b"fine")
    evil = (b"WARC/1.0\r\nWARC-Target-URI: https://a/evil\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Length: -67\r\n\r\n")
    got = W.parse_warc(good + evil)
    assert [r["url"] for r in got] == ["https://a/ok"]


def test_whole_file_gzip_offsets_are_the_member_region():
    date = "2024-01-01T00:00:07Z"
    r1 = W.warc_record_bytes("https://a/1", date, b"one")
    r2 = W.warc_record_bytes("https://a/2", date, b"two")
    data = gzip.compress(r1 + r2, mtime=0)
    got = W.parse_warc(data)
    # both records report the single member's compressed region — the unit
    # a ranged read can actually fetch and decompress
    assert [(r["offset"], r["length"]) for r in got] == [(0, len(data))] * 2


def test_write_warc_index_mode_gzip_ranged_reads(spark, sf_dir, tmp_path):
    src = _docs_df(spark, sf_dir, n=40)
    out = str(tmp_path / "fresh" / "nested")  # dir does not exist: writer mkdirs
    idx = W.write_warc(src, out, shards=2, gzip_records=True,
                       index=True).collect()
    assert len(idx) == 40
    for row in idx[:8]:
        with open(f"{out}/{row['warc_file']}", "rb") as f:
            f.seek(row["warc_offset"])
            blob = f.read(row["warc_length"])
        (rec,) = W.parse_warc(blob)  # compressed member decompresses alone
        assert rec["url"] == row["url"]
        assert hashlib.md5(rec["payload"]).hexdigest() == row["digest"]
        assert row["urlkey"].startswith("example,corpus)/")


def test_duplicate_urls_write_deterministically(spark, tmp_path):
    import pyspark.sql.functions as SF

    rows = [("https://h/x", 1704067200, b"payload-A"),
            ("https://h/x", 1704067200, b"payload-B"),
            ("https://h/y", 1704067300, b"other")]
    df = spark.createDataFrame(
        [(u, SFts, bytearray(p)) for u, SFts, p in rows],
        "url string, ts long, html binary",
    ).select("url", SF.timestamp_seconds("ts").alias("warc_ts"), "html")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    # repartition differently so shuffle arrival order differs between runs
    W.write_warc(df.repartition(1), d1, shards=1).collect()
    W.write_warc(df.repartition(3), d2, shards=1).collect()
    b1 = (tmp_path / "a" / "part-00000.warc").read_bytes()
    b2 = (tmp_path / "b" / "part-00000.warc").read_bytes()
    assert b1 == b2  # content-deterministic order, duplicate urls included
    # and the dry-run index agrees with the written bytes
    idx = W.cdx_index(df, shards=1).collect()
    for row in idx:
        (rec,) = W.parse_warc(
            b1[row["warc_offset"]:row["warc_offset"] + row["warc_length"]])
        assert hashlib.md5(rec["payload"]).hexdigest() == row["digest"]


def test_write_warc_warcinfo_header_record(spark, tmp_path):
    src = _docs_df(spark, "/root/testdata/sf0.001", n=12)
    out = str(tmp_path / "wi")
    idx = W.write_warc(src, out, shards=1, gzip_records=True,
                       warcinfo=True, index=True).collect()
    data = (tmp_path / "wi" / "part-00000.warc.gz").read_bytes()
    recs = W.parse_warc(data)
    assert recs[0]["rec_type"] == "warcinfo" and recs[0]["url"] is None
    # warcinfo is dated from the shard's earliest capture (deterministic)
    assert recs[0]["warc_date"] == min(r["warc_date"] for r in recs[1:])
    # reader skips it; index offsets (measured after it) still ranged-read
    assert W.read_warc(spark, f"{out}/*.warc.gz").count() == 12
    for row in idx[:3]:
        (rec,) = W.parse_warc(
            data[row["warc_offset"]:row["warc_offset"] + row["warc_length"]])
        assert rec["url"] == row["url"]


# ------------------------------------------------- revisit dedup + WAT

def _captures_df(spark):
    """A recrawl corpus: /x captured 3× (unchanged bytes), /y twice with a
    change in between, /z once."""
    rows = [
        ("https://h/x", 100, b"same-x"), ("https://h/x", 200, b"same-x"),
        ("https://h/x", 300, b"same-x"),
        ("https://h/y", 100, b"old-y"), ("https://h/y", 400, b"new-y"),
        ("https://h/z", 250, b"only-z"),
    ]
    return spark.createDataFrame(
        [(u, t, bytearray(p)) for u, t, p in rows],
        "url string, t long, html binary",
    ).select("url", F.timestamp_seconds(F.lit(1704067200) + F.col("t"))
             .alias("warc_ts"), "html")


def test_mark_revisits_semantics(spark):
    got = {(r["url"], r["warc_ts"].second if False else str(r["warc_ts"])):
           (r["rec_type"], r["refers_to_url"])
           for r in W.mark_revisits(_captures_df(spark)).collect()}
    by_url = [(u.rsplit("/", 1)[1], rt, ref and ref.rsplit("/", 1)[1])
              for (u, _), (rt, ref) in sorted(got.items())]
    assert by_url == [
        ("x", "response", None), ("x", "revisit", "x"), ("x", "revisit", "x"),
        ("y", "response", None), ("y", "response", None),  # y changed: 2 payloads
        ("z", "response", None),
    ]


def test_write_warc_deduped_lossless_roundtrip(spark, tmp_path):
    caps = _captures_df(spark)
    out = str(tmp_path / "dedup")
    manifest = W.write_warc_deduped(caps, out, shards=2).collect()
    assert sum(m["revisits"] for m in manifest) == 2
    assert sum(m["payload_bytes_saved"] for m in manifest) == 2 * len(b"same-x")
    recs = W.read_warc(spark, f"{out}/*.warc", revisits=True)
    # revisit records are payload-free on disk and carry the digest header
    revs = recs.where(F.col("rec_type") == "revisit").collect()
    assert len(revs) == 2
    for r in revs:
        assert bytes(r["html"]) == b""
        assert r["payload_digest"] == "md5:" + hashlib.md5(b"same-x").hexdigest()
        assert r["refers_to_uri"] == "https://h/x"
    # resolve restores every capture byte-for-byte
    restored = {(r["url"], str(r["warc_ts"]), bytes(r["html"]))
                for r in W.resolve_revisits(recs).collect()}
    original = {(r["url"], str(r["warc_ts"]), bytes(r["html"]))
                for r in caps.collect()}
    assert restored == original


def test_wat_metadata_and_write(spark, tmp_path):
    import json

    html = (b'<p><a href="https://b/1">one</a> text '
            b'<a href="https://a/2" class="x">two</a></p>')
    pages = spark.createDataFrame(
        [("https://h/p", 0, bytearray(html)),
         ("https://h/empty", 1, bytearray(b"<p>no links</p>"))],
        "url string, t long, html binary",
    ).select("url", F.timestamp_seconds(F.lit(1704067200) + F.col("t"))
             .alias("warc_ts"), "html")
    meta = {r["url"]: r for r in W.wat_metadata(pages).collect()}
    assert meta["https://h/p"]["links"] == ["https://b/1", "https://a/2"]
    assert meta["https://h/empty"]["links"] == []
    assert meta["https://h/p"]["digest"] == hashlib.md5(html).hexdigest()
    j = json.loads(meta["https://h/p"]["wat_json"])
    assert j["payload_len"] == len(html) and j["links"] == ["https://b/1",
                                                            "https://a/2"]
    # through the shared writer: metadata records, JSON payload survives
    out = str(tmp_path / "wat")
    W.write_wat(pages, out, shards=1).collect()
    got = W.read_warc(spark, f"{out}/*.warc.wat", revisits=True).collect()
    assert {r["rec_type"] for r in got} == {"metadata"}
    assert {r["content_type"] for r in got} == {"application/json"}
    back = {r["url"]: json.loads(bytes(r["html"]).decode())
            for r in got}
    assert back["https://h/p"]["digest"] == meta["https://h/p"]["digest"]
    assert back["https://h/empty"]["links"] == []


def test_store_commit_rejects_reserved_extra_keys(spark, tmp_path):
    from crawler_spark.sources.store import SnapshotStore

    store = SnapshotStore(str(tmp_path))
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match="reserved"):
        store.commit("t", df, extra={"dirs": ["evil"]})
    assert store.commit("t", df, extra={"watermark": [1]}) == 0
