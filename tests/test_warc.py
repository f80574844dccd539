"""WARC/1.0 writer + reader (ISO 28500) — record bytes, roundtrip."""

import gzip

import pyarrow as pa
import pytest
import ray.data


class TestRecordFormat:
    def test_record_bytes_golden(self):
        from topicrawler_ray.stages.warc import build_record

        rec = build_record("http://a.example/x", 1_300_000_000_000_000, b"hi")
        text = rec.decode("utf-8")
        assert text.startswith("WARC/1.0\r\n")
        assert "WARC-Type: response\r\n" in text
        assert "WARC-Target-URI: http://a.example/x\r\n" in text
        # 1.3e15 us = 2011-03-13T07:06:40Z
        assert "WARC-Date: 2011-03-13T07:06:40Z\r\n" in text
        assert "Content-Length: 2\r\n" in text
        assert rec.endswith(b"\r\n\r\nhi\r\n\r\n")
        # record id derives from the URI only -> deterministic
        rec2 = build_record("http://a.example/x", 99, b"other")
        id1 = [l for l in text.split("\r\n") if l.startswith("WARC-Record-ID")]
        id2 = [
            l
            for l in rec2.decode("utf-8").split("\r\n")
            if l.startswith("WARC-Record-ID")
        ]
        assert id1 == id2

    def test_parse_concatenated_gzip_members(self):
        from topicrawler_ray.stages.warc import (
            _gzip_member,
            build_record,
            parse_warc_bytes,
        )

        blob = _gzip_member(
            build_record("http://a/1", 0, b"\x00\xffbin")
        ) + _gzip_member(build_record("http://a/2", 0, b""))
        recs = parse_warc_bytes(blob)
        assert [(u, n) for u, n, _ in recs] == [("http://a/1", 5), ("http://a/2", 0)]
        assert recs[0][2] == b"\x00\xffbin"

    def test_payload_containing_crlf_crlf_survives(self):
        from topicrawler_ray.stages.warc import build_record, parse_warc_bytes

        payload = b"x\r\n\r\ny" * 3
        recs = parse_warc_bytes(build_record("http://a/p", 0, payload))
        assert recs == [("http://a/p", len(payload), payload)]

    def test_bad_magic_raises(self):
        from topicrawler_ray.stages.warc import parse_warc_bytes

        with pytest.raises(ValueError):
            parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n\r\n\r\n")


class TestRoundtrip:
    def test_dataset_roundtrip(self, ray_session, tmp_path):
        from topicrawler_ray.stages.warc import read_warc_records, write_warc

        rows = [
            {
                "url": "http://h%d.example/p%d" % (i % 3, i),
                "warc_ts": 1_300_000_000_000_000 + i,
                "html": ("<html>%d</html>" % i).encode() * (i + 1),
            }
            for i in range(17)
        ]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array([r["url"] for r in rows]),
                    "warc_ts": pa.array(
                        [r["warc_ts"] for r in rows], pa.int64()
                    ),
                    "html": pa.array([r["html"] for r in rows], pa.binary()),
                }
            )
        ).repartition(4)
        out = str(tmp_path / "warc")
        manifest = write_warc(ds, out).take_all()
        assert sum(m["n_records"] for m in manifest) == 17
        back = read_warc_records(out).take_all()
        got = {r["url"]: r["payload_len"] for r in back}
        assert got == {r["url"]: len(r["html"]) for r in rows}
