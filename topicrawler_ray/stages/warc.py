"""WARC/1.0 writer + reader (ISO 28500): the crawl archive format.

The reference's Heritrix runtime persists fetches as WARC response
records (lt.ltbot rides Heritrix's WARCWriterProcessor); this is the
Ray-Data-native analog and the archive leg of the export surface next
to the plaintext/sentence sinks (stages/sinks.py): ``write_warc``
streams page blocks into per-task ``.warc.gz`` members, and
``read_warc_records`` turns the archive directory back into a Dataset
— so a crawl's output can round-trip without the parquet store.

Format notes (public spec, ISO 28500 / WARC 1.0):
- record = header lines, CRLF CRLF, payload, CRLF CRLF
- ``Content-Length`` counts payload bytes only
- ``WARC-Record-ID`` is a ``urn:uuid``; we derive it from the md5 of
  the target URI so runs are deterministic (no wall clock, no random)
- one gzip member per RECORD (the Common-Crawl convention) so readers
  can seek to member boundaries; ``mtime=0`` keeps bytes deterministic

Scale shape: the writer is an embarrassingly-parallel ``map_batches``
(one archive file per task — the resumable partitioned-output rule;
a failed run re-derives only missing files), the reader is
``read_binary_files`` over the archive dir + a per-file record scan
(payload slicing is O(bytes), headers are a dozen small lines).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os

import pyarrow as pa

_CRLF = b"\r\n"


def _record_id(url: str) -> str:
    d = hashlib.md5(url.encode("utf-8")).hexdigest()
    return "<urn:uuid:%s-%s-%s-%s-%s>" % (d[:8], d[8:12], d[12:16], d[16:20], d[20:])


def _warc_date(ts_us: int) -> str:
    """ISO-8601 Zulu from an epoch-microseconds timestamp, stdlib only."""
    import datetime

    dt = datetime.datetime.fromtimestamp(ts_us / 1e6, tz=datetime.timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def build_record(url: str, ts_us: int, payload: bytes) -> bytes:
    """One WARC/1.0 response record, deterministic bytes."""
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Record-ID: " + _record_id(url).encode("ascii"),
        b"WARC-Date: " + _warc_date(ts_us).encode("ascii"),
        b"WARC-Target-URI: " + url.encode("utf-8"),
        b"Content-Type: application/octet-stream",
        b"Content-Length: " + str(len(payload)).encode("ascii"),
    ]
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def _gzip_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(raw)
    return buf.getvalue()


def write_warc(pages_ds, out_dir: str):
    """Stream page blocks into ``<out_dir>/<digest>.warc.gz`` (one file
    per task, one gzip member per record; the file name is the md5 of
    the member URL list, so re-runs overwrite identical content instead
    of duplicating).  Returns the manifest Dataset
    (path, n_records, n_payload_bytes)."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        if not urls:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_payload_bytes": pa.array([], pa.int64()),
                }
            )
        tss = batch.column("warc_ts").cast(pa.int64()).to_pylist()
        htmls = batch.column("html").to_pylist()
        name = hashlib.md5("\n".join(urls).encode("utf-8")).hexdigest()
        path = os.path.join(out_dir, name + ".warc.gz")
        tmp = path + ".tmp"
        total = 0
        with open(tmp, "wb") as f:
            for u, ts, h in zip(urls, tss, htmls):
                payload = h or b""
                f.write(_gzip_member(build_record(u, ts, payload)))
                total += len(payload)
        os.replace(tmp, path)
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(urls)], pa.int64()),
                "n_payload_bytes": pa.array([total], pa.int64()),
            }
        )

    return pages_ds.map_batches(write_block, batch_format="pyarrow")


def parse_warc_bytes(blob: bytes) -> list[tuple[str, int, bytes]]:
    """Scan one .warc.gz file's bytes into (target_uri, ts_us-less)
    records: returns [(url, content_length, payload)].  Concatenated
    gzip members decompress as one stream under ``gzip.decompress``."""
    raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
    out: list[tuple[str, int, bytes]] = []
    pos = 0
    n = len(raw)
    while pos < n:
        head_end = raw.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            break
        header = raw[pos:head_end].decode("utf-8")
        lines = header.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            raise ValueError("bad WARC header at byte %d" % pos)
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields["content-length"])
        body_start = head_end + 4
        payload = raw[body_start : body_start + clen]
        out.append((fields["warc-target-uri"], clen, payload))
        pos = body_start + clen + 4  # trailing CRLF CRLF
    return out


def read_warc_records(archive_dir: str):
    """Dataset of (url, payload_len, payload_md5hex) parsed back out of
    every ``.warc.gz`` under ``archive_dir``.  The md5 is over the
    uppercase-hex encoding of the payload so a SQL oracle can recompute
    it as ``md5(to_hex(blob))``."""
    import ray.data

    files = ray.data.read_binary_files(archive_dir)

    def parse(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        lens: list[int] = []
        digs: list[str] = []
        for blob in batch.column("bytes").to_pylist():
            for url, clen, payload in parse_warc_bytes(blob):
                urls.append(url)
                lens.append(clen)
                digs.append(
                    hashlib.md5(payload.hex().upper().encode("ascii")).hexdigest()
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "payload_len": pa.array(lens, pa.int64()),
                "payload_md5": pa.array(digs, pa.string()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
