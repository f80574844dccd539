"""SURT canonicalization + CDX capture index (stages/cdx.py)."""

import pyarrow as pa
import pytest
import ray.data

from topicrawler_ray.stages.cdx import add_surt, surt, surt_index

CASES = [
    ("http://host0.example/robots.txt", "example,host0", "example,host0)/robots.txt"),
    ("http://WWW.Example.COM:80/Path?Q=1#Frag", "com,example,www", "com,example,www)/path?q=1#frag"),
    # non-default port stays attached to its label (and so leads after
    # the reversal) - same on both the engine and the SQL oracle side
    ("https://a.b.c.example:8080/x", "example:8080,c,b,a", "example:8080,c,b,a)/x"),
    ("http://example.org", "org,example", "org,example)/"),
    ("ftp+x://h/y", "h", "h)/y"),
    ("not a url", "", ")/"),
]


class TestSurtScalar:
    @pytest.mark.parametrize("url,host_key,expected", CASES)
    def test_cases(self, url, host_key, expected):
        hk, s = surt(url)
        assert (hk, s) == (host_key, expected)

    @pytest.mark.parametrize("url,host_key,expected", CASES)
    def test_sql_parity(self, url, host_key, expected):
        """The scalar transform and the DuckDB oracle expression agree
        on every adversarial shape, not just fixture URLs."""
        import duckdb

        sql = (
            "WITH p AS (SELECT ? AS url), "
            "e AS (SELECT lower(regexp_extract(url, "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS hostport, "
            "lower(regexp_extract(url, "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$', 1)) AS rest FROM p), "
            "h AS (SELECT regexp_replace(hostport, ':80$', '') AS host, "
            "CASE WHEN rest = '' THEN '/' ELSE rest END AS path FROM e) "
            "SELECT array_to_string(list_reverse(string_split(host, '.')), ','), "
            "array_to_string(list_reverse(string_split(host, '.')), ',') "
            "|| ')' || path FROM h"
        )
        got = duckdb.sql(sql, params=[url]).fetchone()
        # DuckDB's regexp_extract of a non-matching url yields '' which
        # splits to [''] -> host_key '' - same fallback as the scalar.
        if url == "not a url":
            assert got == ("", ")/")
        else:
            assert got == (host_key, expected)


class TestSurtBatch:
    def test_batch_matches_scalar(self, ray_session):
        urls = [u for u, _, _ in CASES]
        out = add_surt(pa.table({"url": pa.array(urls, pa.string())}))
        for i, (u, hk, s) in enumerate(CASES):
            assert out.column("host_key")[i].as_py() == hk
            assert out.column("surt")[i].as_py() == s

    def test_index_positions(self, ray_session):
        rows = [
            {"url": "http://b.example/2"},
            {"url": "http://b.example/1"},
            {"url": "http://a.example/only"},
        ]
        df = surt_index(ray.data.from_items(rows)).to_pandas()
        by_url = {r.url: (r.host_key, r.pos) for r in df.itertuples()}
        assert by_url["http://b.example/1"] == ("example,b", 0)
        assert by_url["http://b.example/2"] == ("example,b", 1)
        assert by_url["http://a.example/only"] == ("example,a", 0)
