"""WARC (ISO 28500) source/sink — the on-ramp from Common-Crawl-style
archives into the engine's ``pages`` table shape.

The north star describes "an Iceberg table of Common-Crawl-style pages";
Common Crawl itself ships as WARC files (WARC/1.0, one ~1 GB gzip file per
crawl segment).  This module makes that ingestion path concrete:

* :func:`read_warc` — ``spark.read.format("binaryFile")`` over a WARC glob,
  one task per archive file (CC files are ~1 GB, so a 100 TB crawl is
  ~100k files = ~100k tasks: ideal parallelism with zero small-file
  pressure), then an Arrow-batched ``mapInPandas`` kernel that walks each
  archive's records and emits the ``pages``-shaped rows
  ``(url, warc_ts, html, …)`` plus exact ``(warc_file, warc_offset,
  warc_length)`` lineage — enough to re-read any single record with one
  ranged read, which is how CDX-indexed random access works at CC.
* :func:`write_warc` — a distributed sink: one WARC file per hash shard of
  the url space, written executor-side inside ``applyInPandas``; returns a
  manifest DataFrame (file, records, bytes) the caller commits alongside
  the data (same idiom as the SnapshotStore manifests).
* :func:`write_warc` with ``index=True`` / :func:`cdx_index` — the CDX
  index projection (SURT urlkey, timestamp, digest, offset, length, file)
  over the writer's record layout; offsets come from the actual
  serialized bytes, not arithmetic.

Record serialization is canonical and deterministic (fixed header order,
CRLF discipline, uuid5 record ids), so byte offsets are reproducible
cross-run — the property the ``warc_cdx`` oracle checks in SQL by
re-deriving every record's byte length from first principles.

Parsing notes: the reader handles plain archives, whole-file gzip, and
CC-style per-record gzip members (each record its own gzip member,
concatenated); ``application/http; msgtype=response`` payloads have their
HTTP envelope stripped (status captured) so ``html`` is always the raw
body bytes.  Malformed trailing garbage ends the walk rather than raising:
a 100 TB ingest must skip a truncated archive, not die.

Python-per-record cost sits at the I/O boundary (same class as the file
read itself), mirroring the multimodal kernels; everything downstream of
the source is native Spark expressions.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
import uuid
import zlib
from datetime import datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = "\r\n"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"  # WARC-Date, always 20 bytes
_HTML_CT = "text/html; charset=utf-8"
_HTTP_CT = "application/http; msgtype=response"

# Serialized record size = _HEADER_CONST + len(url) + len(str(len(payload)))
# + len(payload).  Asserted against a real record in tests and re-derived
# in SQL by the warc_cdx oracle.
_HEADER_CONST = (
    len("WARC/1.0\r\n")
    + len("WARC-Type: response\r\n")
    + len("WARC-Record-ID: <urn:uuid:>\r\n") + 36
    + len("WARC-Date: \r\n") + 20
    + len("WARC-Target-URI: \r\n")
    + len("Content-Type: text/html; charset=utf-8\r\n")
    + len("Content-Length: \r\n")
    + len("\r\n")           # header/payload separator
    + len("\r\n\r\n")       # record trailer
)


def record_id(url: str, date: str) -> str:
    """Deterministic WARC-Record-ID (uuid5 over url+date) — reruns of the
    writer produce byte-identical archives, which is what makes WARC
    offsets a stable join key for the CDX index."""
    return str(uuid.uuid5(uuid.NAMESPACE_URL, f"{url} {date}"))


def warc_record_bytes(url: str, date: str, payload: bytes,
                      rec_type: str = "response",
                      http_envelope: bool = False,
                      content_type: str | None = None,
                      extra_headers: list[tuple[str, str]] | None = None,
                      ) -> bytes:
    """One canonical WARC/1.0 record.  ``date`` is the 20-byte
    ``YYYY-MM-DDTHH:MM:SSZ`` form.  With ``http_envelope`` the payload is
    wrapped in a minimal HTTP/1.1 response (Common Crawl's actual layout
    for response records) and Content-Type switches to msgtype=response.
    ``content_type`` overrides the payload mime (default text/html) — the
    size formula's ``_HEADER_CONST`` describes the default; other types
    shift it by the length difference, which :func:`cdx_index` measures
    from the real bytes anyway.  ``extra_headers`` are emitted verbatim in
    the given order between WARC-Target-URI and Content-Type (the revisit
    writer's WARC-Refers-To-* / WARC-Payload-Digest fields); callers must
    pass a deterministic sequence to keep archives byte-reproducible."""
    mime = content_type or _HTML_CT
    if http_envelope:
        body = (
            f"HTTP/1.1 200 OK{_CRLF}Content-Type: {mime}{_CRLF}"
            f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
        ).encode("utf-8") + payload
        ctype = _HTTP_CT
    else:
        body = payload
        ctype = mime
    extras = "".join(
        f"{k}: {v}{_CRLF}" for k, v in (extra_headers or [])
    )
    header = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: {rec_type}{_CRLF}"
        f"WARC-Record-ID: <urn:uuid:{record_id(url, date)}>{_CRLF}"
        f"WARC-Date: {date}{_CRLF}"
        f"WARC-Target-URI: {url}{_CRLF}"
        f"{extras}"
        f"Content-Type: {ctype}{_CRLF}"
        f"Content-Length: {len(body)}{_CRLF}"
        f"{_CRLF}"
    ).encode("utf-8")
    return header + body + b"\r\n\r\n"


def _gunzip_members(data: bytes) -> Iterator[tuple[bytes, int, int]]:
    """Yield (decompressed, member_offset, member_length) per gzip member —
    CC archives are per-record members, so member offsets ARE record
    offsets (what the CDX index stores for ranged reads)."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        try:
            out = d.decompress(data[pos:])
        except zlib.error:
            break  # corrupt member: stop the walk, keep prior members
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        yield out + d.flush(), pos, consumed
        pos += consumed


def parse_warc(data: bytes, offset_base: int = 0) -> list[dict]:
    """Parse an in-memory WARC archive (plain, whole-file gzip, or
    per-record gzip members) into record dicts with exact byte lineage.

    Each dict: ``url, warc_date (str), rec_type, rec_id, payload (bytes),
    http_status (int|None), offset, length``.  For compressed archives
    offset/length describe the COMPRESSED gzip-member region containing
    the record (the thing a ranged read fetches and can decompress —
    exact per record under CC's per-record-member layout, the whole file
    under single-member whole-file gzip); for plain archives, the
    record's own bytes.
    """
    if data[:2] == b"\x1f\x8b":
        # every record in a gzip member reports the MEMBER's compressed
        # region as its (offset, length): that is the unit a ranged read
        # can actually fetch and decompress.  CC's per-record-member
        # layout therefore gets exact per-record offsets; a whole-file
        # single-member archive gets (0, file length) on every record.
        out: list[dict] = []
        for blob, moff, mlen in _gunzip_members(data):
            for r in parse_warc(blob):
                r["offset"], r["length"] = offset_base + moff, mlen
                out.append(r)
        return out
    recs = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            break  # trailing garbage / truncation: stop, don't raise
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].decode("utf-8", "replace").split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            break
        if clen < 0:
            break  # malicious/corrupt length: rec_end would go backwards
            # and the walk would loop forever on the same record
        body_start = hdr_end + 4
        body = data[body_start:body_start + clen]
        if len(body) < clen:
            break  # truncated record
        status = None
        ctype = headers.get("content-type")
        if (headers.get("content-type", "").startswith("application/http")
                and body[:5] == b"HTTP/"):
            env_end = body.find(b"\r\n\r\n")
            if env_end >= 0:
                env_lines = body[:env_end].decode("utf-8", "replace").split(
                    _CRLF)
                parts = env_lines[0].split(" ")
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                for line in env_lines[1:]:
                    k, _, v = line.partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()  # payload mime, not the envelope's
                body = body[env_end + 4:]
        rec_end = body_start + clen + 4  # trailing CRLFCRLF
        recs.append({
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "rec_type": headers.get("warc-type"),
            "rec_id": headers.get("warc-record-id", "").strip("<>"),
            "payload": body,
            "http_status": status,
            "content_type": ctype,
            "offset": offset_base + pos,
            "length": rec_end - pos,
            "refers_to_uri": headers.get("warc-refers-to-target-uri"),
            "refers_to_date": headers.get("warc-refers-to-date"),
            "payload_digest": headers.get("warc-payload-digest"),
        })
        pos = rec_end
    return recs


READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, http_status int, "
    "content_type string, warc_file string, warc_offset long, "
    "warc_length long"
)


REVISIT_COLS = (
    "rec_type string, refers_to_uri string, refers_to_date string, "
    "payload_digest string"
)


def read_warc(spark: SparkSession, path_glob: str | list[str],
              rec_types: tuple[str, ...] | None = None,
              revisits: bool = False) -> DataFrame:
    """WARC archives → ``pages``-shaped DataFrame.

    ``binaryFile`` gives (path, content) with no decode and one partition
    per file — at CC's ~1 GB/file a 100 TB crawl is ~100k even tasks.  The
    kernel is Arrow-batched; per-record Python is the I/O boundary cost
    (see module docstring).  ``path_glob`` may be a glob or an explicit
    path list (the incremental ingest passes only the unseen archives).

    Records without a WARC-Target-URI or a parseable WARC-Date are skipped
    — real CC archives open with a ``warcinfo`` record that has neither,
    and one housekeeping record must not kill a task.  ``rec_types``
    optionally restricts to specific WARC-Types (e.g. ``("response",)``;
    default keeps every addressed record).  ``revisits=True`` appends the
    :data:`REVISIT_COLS` (rec_type + WARC-Refers-To-*/payload digest) for
    deduped archives — feed that shape to :func:`resolve_revisits`.
    """
    paths = path_glob if isinstance(path_glob, list) else [path_glob]
    files = spark.read.format("binaryFile").load(paths).select(
        "path", "content"
    )
    base_cols = [
        "url", "warc_ts", "html", "http_status", "content_type",
        "warc_file", "warc_offset", "warc_length",
    ]
    cols = base_cols + (
        ["rec_type", "refers_to_uri", "refers_to_date", "payload_digest"]
        if revisits else [])
    schema = READ_SCHEMA + (", " + REVISIT_COLS if revisits else "")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc(bytes(content)):
                    if not r["url"] or not r["warc_date"]:
                        continue  # warcinfo / metadata housekeeping record
                    if rec_types and r["rec_type"] not in rec_types:
                        continue
                    try:
                        ts = datetime.strptime(r["warc_date"], _DATE_FMT)
                    except ValueError:
                        continue  # unparseable date: skip, don't die
                    row = (
                        r["url"], ts,
                        r["payload"], r["http_status"], r["content_type"],
                        path, r["offset"], r["length"],
                    )
                    if revisits:
                        row += (r["rec_type"], r["refers_to_uri"],
                                r["refers_to_date"], r["payload_digest"])
                    rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(kernel, schema)


MANIFEST_SCHEMA = "warc_file string, shard int, records long, bytes long"


def _writer_src(df: DataFrame, shards: int, shard) -> DataFrame:
    """Common writer/indexer prep: render the date, carry an optional
    ``mime`` column (→ per-record Content-Type; default text/html when
    absent), assign the bucket."""
    shard_col = (shard if shard is not None
                 else F.pmod(F.xxhash64("url"), F.lit(shards)))
    mime = (F.col("mime") if "mime" in df.columns
            else F.lit(None).cast("string"))
    return df.select(
        "url",
        F.date_format(F.col("warc_ts"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("wdate"),
        F.col("html"),
        mime.alias("mime"),
        shard_col.cast("int").alias("shard"),
    )


def _sort_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Content-deterministic total order within a shard: (url, date,
    payload bytes).  Sorting by url alone left intra-url order to the
    shuffle, so a recrawl corpus with the same url at two timestamps could
    serialize in different orders across runs (and between a write job and
    an index job) — breaking reproducible offsets."""
    return pdf.sort_values(["url", "wdate", "html"], kind="mergesort")


def warcinfo_record_bytes(filename: str, date: str) -> bytes:
    """The housekeeping record real CC archives open with: WARC-Type
    warcinfo, no Target-URI, application/warc-fields body naming the
    writer and format.  Deterministic (uuid5 over filename+date, fixed
    body) so archives stay byte-reproducible."""
    body = (
        f"software: crawler-spark/1.0{_CRLF}"
        f"format: WARC File Format 1.0{_CRLF}"
        f"isPartOf: {filename}{_CRLF}"
    ).encode("utf-8")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"warcinfo {filename} {date}")
    header = (
        f"WARC/1.0{_CRLF}"
        f"WARC-Type: warcinfo{_CRLF}"
        f"WARC-Record-ID: <urn:uuid:{rid}>{_CRLF}"
        f"WARC-Date: {date}{_CRLF}"
        f"WARC-Filename: {filename}{_CRLF}"
        f"Content-Type: application/warc-fields{_CRLF}"
        f"Content-Length: {len(body)}{_CRLF}"
        f"{_CRLF}"
    ).encode("utf-8")
    return header + body + b"\r\n\r\n"


def write_warc(df: DataFrame, out_dir: str, shards: int = 8,
               gzip_records: bool = False,
               http_envelope: bool = False,
               rec_type: str = "response",
               ext: str | None = None,
               index: bool = False,
               warcinfo: bool = False) -> DataFrame:
    """Distributed WARC sink: shard rows by ``pmod(xxhash64(url), shards)``,
    one archive file per shard written executor-side, records in a
    content-deterministic order within the shard (reproducible bytes →
    reproducible offsets, duplicate urls included).  Input needs
    (url, warc_ts, html); returns the manifest DataFrame — or, with
    ``index=True``, the CDX index rows (:data:`CDX_SCHEMA`) measured from
    the bytes AS WRITTEN, which makes the index correct by construction
    for every option combination (gzip members → compressed member
    offsets, envelopes, alternate rec_type/ext) with no second
    serialization pass over the payloads.

    Scale: ``shards`` plays the role of Iceberg's bucket count — size it so
    each shard lands near CC's ~1 GB/file.  Each shard is one task; skewed
    url spaces spread by the hash.  With ``gzip_records`` each record is
    its own gzip member (CC layout, ranged reads stay possible).  A
    ``mime`` column, when present, becomes each record's Content-Type and
    survives the round trip (``read_warc`` exposes ``content_type``).
    Digests (index mode) are md5-hex of the pre-envelope payload.
    ``warcinfo=True`` opens each archive with the CC-style housekeeping
    record (dated from the shard's earliest capture — content-derived, so
    bytes stay reproducible); ``read_warc`` skips it, and index-mode
    offsets are measured after it, so both stay exact.
    """
    src = _writer_src(df, shards, None)

    suffix = ext or (".warc.gz" if gzip_records else ".warc")

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = _sort_shard(pdf)
        os.makedirs(out_dir, exist_ok=True)
        fname = f"part-{shard:05d}{suffix}"
        path = f"{out_dir}/{fname}"
        total = 0
        idx_rows = []
        with open(path, "wb") as f:
            if warcinfo:
                info = warcinfo_record_bytes(fname, min(pdf["wdate"]))
                if gzip_records:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                        g.write(info)
                    info = buf.getvalue()
                f.write(info)
                total += len(info)
            for url, wdate, html, mime in zip(
                    pdf["url"], pdf["wdate"], pdf["html"], pdf["mime"]):
                payload = bytes(html)
                rec = warc_record_bytes(url, wdate, payload,
                                        rec_type=rec_type,
                                        http_envelope=http_envelope,
                                        content_type=mime)
                if gzip_records:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                        g.write(rec)
                    rec = buf.getvalue()
                if index:
                    idx_rows.append((
                        None,
                        wdate.replace("-", "").replace(":", "")
                        .replace("T", "").replace("Z", ""),
                        url, hashlib.md5(payload).hexdigest(),
                        total, len(rec), fname,
                    ))
                f.write(rec)
                total += len(rec)
        if index:
            return pd.DataFrame(idx_rows, columns=[
                "urlkey", "cdx_ts", "url", "digest",
                "warc_offset", "warc_length", "warc_file",
            ])
        return pd.DataFrame(
            [(path, shard, len(pdf), total)],
            columns=["warc_file", "shard", "records", "bytes"],
        )

    out_schema = CDX_SCHEMA if index else MANIFEST_SCHEMA
    out = src.groupBy("shard").applyInPandas(write_shard, out_schema)
    if index:
        # urlkey is a pure column function — fill it JVM-side, post-kernel
        out = out.withColumn("urlkey", surt_urlkey(F.col("url")))
    return out


CDX_SCHEMA = (
    "urlkey string, cdx_ts string, url string, digest string, "
    "warc_offset long, warc_length long, warc_file string"
)


def surt_urlkey(url):
    """SURT-style sort key: reversed host labels + path —
    ``https://sub.example.com/a/b`` → ``com,example,sub)/a/b``.  Native
    expressions only (parse_url + reverse/array_join)."""
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    return F.concat(
        F.array_join(F.reverse(F.split(host, "\\.")), ","),
        F.lit(")"), path,
    )


def cdx_index(df: DataFrame, shards: int = 8, shard=None) -> DataFrame:
    """CDX index rows for the CANONICAL layout only (plain ``.warc``,
    response records, no envelope) — the dry-run twin of
    ``write_warc(index=True)``, which is the production path: when the
    archives are actually written, pass ``index=True`` there and get
    offsets measured from the bytes as written for ANY option combination.
    This function exists for the byte-accounting oracle (``warc_cdx``) and
    for indexing a corpus without writing it; it re-serializes every
    record, so it costs a full second pass over the payloads.

    ``shard`` overrides the default ``pmod(xxhash64(url), shards)`` bucket
    expression (the Iceberg bucket transform is likewise pluggable); pass a
    portable expression when a second engine must reproduce the layout.

    Digest is md5-hex of the payload (CC uses sha1-base32; md5 keeps the
    digest recomputable by any SQL engine — divergence documented here).
    """
    src = _writer_src(df, shards, shard)

    def index_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = _sort_shard(pdf)
        fname = f"part-{shard:05d}.warc"
        rows, off = [], 0
        for url, wdate, html, mime in zip(
                pdf["url"], pdf["wdate"], pdf["html"], pdf["mime"]):
            payload = bytes(html)
            rec = warc_record_bytes(url, wdate, payload, content_type=mime)
            rows.append((
                None, wdate.replace("-", "").replace(":", "")
                .replace("T", "").replace("Z", ""),
                url, hashlib.md5(payload).hexdigest(),
                off, len(rec), fname,
            ))
            off += len(rec)
        out = pd.DataFrame(rows, columns=[
            "urlkey", "cdx_ts", "url", "digest",
            "warc_offset", "warc_length", "warc_file",
        ])
        return out

    idx = src.groupBy("shard").applyInPandas(index_shard, CDX_SCHEMA)
    # urlkey is a pure column function — fill it JVM-side, post-kernel
    return idx.withColumn("urlkey", surt_urlkey(F.col("url")))


def write_wet(pages: DataFrame, out_dir: str, shards: int = 8,
              gzip_records: bool = False) -> DataFrame:
    """WET companion archives (Common Crawl's extracted-text format):
    ``conversion`` records whose payload is the page's ``text`` column as
    UTF-8, Content-Type text/plain — what the training-data tier consumes
    when raw HTML isn't needed.  Same sharding/manifest as
    :func:`write_warc`; readable back with :func:`read_warc` (the
    ``rec_type`` is in each record, the payload lands in ``html``)."""
    src = pages.select(
        "url", "warc_ts",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8")
        .alias("html"),
        F.lit("text/plain; charset=utf-8").alias("mime"),
    )
    suffix = ".warc.wet.gz" if gzip_records else ".warc.wet"
    return write_warc(src, out_dir, shards=shards,
                      gzip_records=gzip_records, rec_type="conversion",
                      ext=suffix)


# ------------------------------------------------------------ revisit dedup

DEDUP_MANIFEST_SCHEMA = (
    "warc_file string, shard int, records long, revisits long, "
    "bytes long, payload_bytes_saved long"
)

_REVISIT_PROFILE = (
    "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
)


def mark_revisits(captures: DataFrame) -> DataFrame:
    """Digest-based capture dedup — the Common Crawl ``revisit`` semantics:
    the FIRST capture of each distinct payload (by (warc_ts, url)) is the
    ``response`` record; every later capture of the same bytes becomes a
    ``revisit`` that references the original instead of storing the payload
    again.  Input ``(url, warc_ts, html)``; output adds ``digest``,
    ``rec_type`` and, on revisit rows only, ``refers_to_url`` /
    ``refers_to_ts``.

    Relational shape chosen for scale: a ``groupBy(digest)`` +
    ``min(struct(ts, url))`` (full map-side combine — a boilerplate page
    duplicated 10^6 times still sends ONE partial row per map task) and a
    join back on digest, instead of a per-digest sort window (which would
    funnel each hot digest through a single task's sort).  Digest is
    md5-hex of the raw payload bytes — the same digest the CDX index
    records, so the two layers join.  Exact duplicate captures (same url,
    ts AND bytes) are the same logical record (their uuid5 record ids
    collide too) and both rank as the response row.
    """
    d = captures.withColumn("digest", F.md5("html"))
    firsts = d.groupBy("digest").agg(
        F.min(F.struct(F.col("warc_ts").alias("ts"),
                       F.col("url").alias("u"))).alias("__f")
    )
    joined = d.join(firsts, "digest")
    is_first = (F.col("warc_ts") == F.col("__f.ts")) & \
               (F.col("url") == F.col("__f.u"))
    extra = [c for c in captures.columns
             if c not in ("url", "warc_ts", "html")]  # e.g. mime: passthrough
    return joined.select(
        "url", "warc_ts", "html", *extra, "digest",
        F.when(is_first, F.lit("response"))
        .otherwise(F.lit("revisit")).alias("rec_type"),
        F.when(~is_first, F.col("__f.u")).alias("refers_to_url"),
        F.when(~is_first, F.col("__f.ts")).alias("refers_to_ts"),
    )


def write_warc_deduped(captures: DataFrame, out_dir: str, shards: int = 8,
                       gzip_records: bool = False) -> DataFrame:
    """WARC sink with identical-payload-digest dedup: responses store the
    payload once; revisits are payload-free records carrying
    ``WARC-Refers-To-Target-URI`` / ``WARC-Refers-To-Date`` /
    ``WARC-Payload-Digest`` and the netpreserve revisit profile header.
    (Divergence from CC: digests are md5-hex, matching this module's CDX
    digests, not sha1-base32.)  Returns a manifest with the per-shard
    revisit count and payload bytes saved.  Same determinism contract as
    :func:`write_warc`; a ``mime`` column, when present, becomes the
    response records' Content-Type (revisits carry no payload, so none).
    Read back with ``read_warc(..., revisits=True)`` and rejoin payloads
    with :func:`resolve_revisits`."""
    marked = mark_revisits(captures)
    date_fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    mime = (F.col("mime") if "mime" in marked.columns
            else F.lit(None).cast("string"))
    src = marked.select(
        "url",
        F.date_format("warc_ts", date_fmt).alias("wdate"),
        "html", mime.alias("mime"), "digest", "rec_type",
        F.col("refers_to_url").alias("rurl"),
        F.date_format("refers_to_ts", date_fmt).alias("rdate"),
        F.pmod(F.xxhash64("url"), F.lit(shards)).cast("int").alias("shard"),
    )
    suffix = ".warc.gz" if gzip_records else ".warc"

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        pdf = _sort_shard(pdf)
        os.makedirs(out_dir, exist_ok=True)
        path = f"{out_dir}/part-{shard:05d}{suffix}"
        total = revisits = saved = 0
        with open(path, "wb") as f:
            for url, wdate, html, mime, digest, rtype, rurl, rdate in zip(
                    pdf["url"], pdf["wdate"], pdf["html"], pdf["mime"],
                    pdf["digest"], pdf["rec_type"], pdf["rurl"],
                    pdf["rdate"]):
                if rtype == "revisit":
                    rec = warc_record_bytes(
                        url, wdate, b"", rec_type="revisit",
                        extra_headers=[
                            ("WARC-Refers-To-Target-URI", rurl),
                            ("WARC-Refers-To-Date", rdate),
                            ("WARC-Payload-Digest", f"md5:{digest}"),
                            ("WARC-Profile", _REVISIT_PROFILE),
                        ])
                    revisits += 1
                    saved += len(bytes(html))
                else:
                    rec = warc_record_bytes(
                        url, wdate, bytes(html), content_type=mime,
                        extra_headers=[
                            ("WARC-Payload-Digest", f"md5:{digest}"),
                        ])
                if gzip_records:
                    buf = io.BytesIO()
                    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                        g.write(rec)
                    rec = buf.getvalue()
                f.write(rec)
                total += len(rec)
        return pd.DataFrame(
            [(path, shard, len(pdf), revisits, total, saved)],
            columns=["warc_file", "shard", "records", "revisits",
                     "bytes", "payload_bytes_saved"],
        )

    return src.groupBy("shard").applyInPandas(write_shard,
                                              DEDUP_MANIFEST_SCHEMA)


def resolve_revisits(recs: DataFrame) -> DataFrame:
    """Inverse of the dedup: rows from ``read_warc(..., revisits=True)``
    → every capture with its payload restored.  Responses pass through;
    each revisit joins its original response on
    (``refers_to_uri``, ``refers_to_date``) and takes that payload (and
    its ``content_type``, when the column is present — a revisit record
    describes no payload of its own).  Every other column (http_status,
    warc_file/offset/length lineage, …) stays the ROW's own — a revisit's
    lineage points at the revisit record, which is where that capture
    lives in the archive.  Relational (one equi-join on the refers key);
    at scale the join shuffles on (url, ts) — the same key the archives
    are sharded by, so a bucketed layout makes it exchange-free on the
    big side.  Output is losslessly equal to the pre-dedup captures.
    """
    meta = ("rec_type", "refers_to_uri", "refers_to_date", "payload_digest")
    payload = ["html"] + (["content_type"]
                          if "content_type" in recs.columns else [])
    own = [c for c in recs.columns if c not in meta and c not in payload]
    resp = recs.where(F.col("rec_type") == "response").select(*own, *payload)
    revs = recs.where(F.col("rec_type") == "revisit").select(
        *own,
        F.col("refers_to_uri").alias("__ru"),
        F.to_timestamp(F.col("refers_to_date"),
                       "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("__rt"),
    )
    lookup = recs.where(F.col("rec_type") == "response").select(
        F.col("url").alias("__ru"), F.col("warc_ts").alias("__rt"), *payload)
    restored = revs.join(lookup, ["__ru", "__rt"]).select(*own, *payload)
    return resp.unionByName(restored)


# ----------------------------------------------------------------- WAT export

def wat_metadata(pages: DataFrame) -> DataFrame:
    """The WAT projection (CC's metadata sidecar, simplified to its
    load-bearing fields): per response record — payload digest + length and
    the out-link list, serialized as one deterministic compact JSON per
    url.  Everything is native Catalyst: md5/length on the binary column,
    the codegen regexp link scan (:func:`operators.web.extract_links`),
    ``collect_list(struct(pos, href))`` + ``array_sort`` to restore
    document order under the shuffle, ``to_json`` with a fixed struct
    field order.  Output ``(url, warc_ts, wat_json)`` plus the unserialized
    ``digest`` / ``payload_len`` / ``links`` columns.

    Scale: one groupBy(url) with map-side combine over the link edges and
    one join back; the page payload column is read once (digest and length
    come from the same scan) and never shuffled — only urls and hrefs move.
    """
    from ..functions.parse_udfs import decode_text
    from ..operators.web import extract_links

    links_src = extract_links(
        pages.select("url", decode_text(F.col("html")).alias("html")),
        "html", ("url",))
    per_url = links_src.groupBy("url").agg(
        F.array_sort(F.collect_list(F.struct("pos", "href"))).alias("__lp"))
    base = pages.select(
        "url", "warc_ts",
        F.md5("html").alias("digest"),
        F.length("html").cast("long").alias("payload_len"),
    )
    date_fmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    joined = base.join(per_url, "url", "left").withColumn(
        "links",
        F.coalesce(F.transform(F.col("__lp"), lambda x: x["href"]),
                   F.array().cast("array<string>")),
    )
    return joined.select(
        "url", "warc_ts", "digest", "payload_len", "links",
        F.to_json(F.struct(
            F.col("url"),
            F.date_format("warc_ts", date_fmt).alias("ts"),
            F.col("digest"), F.col("payload_len"), F.col("links"),
        )).alias("wat_json"),
    )


def write_wat(pages: DataFrame, out_dir: str, shards: int = 8,
              gzip_records: bool = False) -> DataFrame:
    """WAT companion archives: ``metadata`` records (application/json)
    produced by :func:`wat_metadata`, one per response record, through the
    shared deterministic writer — CC's WARC/WAT/WET triple is complete.
    Readable back with :func:`read_warc` (payload = the JSON)."""
    src = wat_metadata(pages).select(
        "url", "warc_ts",
        F.encode("wat_json", "utf-8").alias("html"),
        F.lit("application/json").alias("mime"),
    )
    suffix = ".warc.wat.gz" if gzip_records else ".warc.wat"
    return write_warc(src, out_dir, shards=shards,
                      gzip_records=gzip_records, rec_type="metadata",
                      ext=suffix)


def pages_from_warc(spark: SparkSession, path_glob: str | list[str],
                    lineage: bool = False, mime: bool = False,
                    text_mode: str = "decode",
                    dedup: bool = False) -> DataFrame:
    """The ingestion composition: WARC glob → the exact BASELINE input_hint
    shape ``(url, warc_ts, html, text, lang)``; lang via the n-gram
    heuristic, all native expressions.

    ``text_mode``: ``"decode"`` (default) defines ``text`` as the UTF-8
    decode of the payload — the reference's ``downloadedFileToText``
    contract (Downloader.fs:27-30) the crawl's parse path consumes, which
    makes a crawl over WARC-ingested pages byte-identical to one over the
    original table; ``"visible"`` runs the codegen visible-text extractor
    instead (the WET-style corpus column for the training-data tier).
    ``lineage=True`` appends ``(warc_file, warc_offset, warc_length)`` so
    every stored page can be traced to (and re-read from) its archive
    bytes — the per-partition lineage the snapshot ingest persists.
    ``mime=True`` appends the record Content-Type as ``mime`` — the column
    the crawl's photo pipeline consumes, preserved through the archive.
    ``dedup=True`` ingests archives written by :func:`write_warc_deduped`:
    revisit records are resolved back to their original payloads
    (:func:`resolve_revisits`) before the projection, so the crawl sees
    every capture whole."""
    from ..functions.parse_udfs import decode_text
    from ..functions.text import lang_id
    from ..operators.web import html_visible_text

    raw = read_warc(spark, path_glob, revisits=dedup)
    if dedup:
        raw = resolve_revisits(raw)
    text_col = (decode_text(F.col("html")) if text_mode == "decode"
                else html_visible_text(F.col("html").cast("string")))
    with_text = raw.withColumn("text", text_col)
    cols = ["url", "warc_ts", "html", "text",
            lang_id(F.col("text")).alias("lang")]
    if mime:
        cols.append(F.col("content_type").alias("mime"))
    if lineage:
        cols += ["warc_file", "warc_offset", "warc_length"]
    return with_text.select(*cols)


def ingest_warc_incremental(spark: SparkSession, store, path_glob: str,
                            table: str = "warc_pages") -> dict:
    """Resumable, exactly-once WARC ingestion into a SnapshotStore table.

    Each run lists the glob, subtracts the archives already consumed, and
    commits ONLY the new ones as one snapshot whose manifest line also
    records the consumed file list (``SnapshotStore.commit(extra=...)``).
    The manifest rename is the single atomic commit point, so data and
    watermark cannot disagree: a crash before it re-ingests nothing extra,
    a rerun after it sees the files as consumed.  This is Iceberg's
    ``add_files``/streaming-file-source pattern on the sandbox shim.

    Scale: the listing is metadata-only (paths come from the file index;
    ``content`` is never projected), the seen set lives in the manifest
    (~100k path strings at 100 TB — kilobytes of JSON per snapshot), and
    the data pass reads each new archive exactly once.

    Returns ``{"snapshot": id|None, "new_files": [...], "rows": n}``.
    """
    listing = sorted(
        r["path"]
        for r in spark.read.format("binaryFile").load(path_glob)
        .select("path").collect()
    )
    seen: set[str] = set()
    for snap in store.snapshots(table):
        seen.update(snap.get("warc_files", []))
    new_files = [p for p in listing if p not in seen]
    if not new_files:
        return {"snapshot": None, "new_files": [], "rows": 0}
    pages = pages_from_warc(spark, new_files, lineage=True)
    snap_id = store.commit(table, pages, extra={"warc_files": new_files})
    # row count from the one dir this commit wrote — never a table rescan
    (new_dir,) = store.data_dirs_between(table, snap_id - 1, snap_id)
    rows = spark.read.parquet(new_dir).count()
    return {"snapshot": snap_id, "new_files": new_files, "rows": rows}
