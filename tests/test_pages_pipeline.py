"""Pages source + flagship pipeline tests (Ray, sf0.001)."""

import pyarrow.parquet as pq
import pytest

from topicrawler_ray.functions.cleaners import clean_min
from topicrawler_ray.functions.htmltext import get_plaintext
from topicrawler_ray.functions.strings import java_trim
from topicrawler_ray.sources import pages as pages_mod


@pytest.fixture(scope="module")
def pages_table(sf_dir):
    return pq.read_table(pages_mod.pages_path(sf_dir))


class TestPagesSource:
    def test_schema_matches_input_hint(self, pages_table):
        names = pages_table.schema.names
        assert names == ["url", "warc_ts", "html", "text", "lang"]
        assert str(pages_table.schema.field("warc_ts").type) == "timestamp[us]"
        assert str(pages_table.schema.field("html").type) == "binary"

    def test_deterministic(self, sf_dir):
        t1 = pages_mod.build_pages_table(sf_dir)
        t2 = pages_mod.build_pages_table(sf_dir)
        assert t1.equals(t2)

    def test_extraction_byte_identical(self, pages_table):
        """Per-URL invariant: our extractor output == the analytically
        derived oracle `text`, char for char, on every page (incl. the
        ISO-8859-1 and unresolvable-charset variants)."""
        from topicrawler_ray.stages.extract import decode_page_bytes

        for i in range(pages_table.num_rows):
            url = pages_table["url"][i].as_py()
            if url.endswith("robots.txt"):
                continue
            html = decode_page_bytes(url, pages_table["html"][i].as_py())
            expected = pages_table["text"][i].as_py()
            got = java_trim(clean_min(get_plaintext(clean_min(html))))
            assert got == expected, url

    def test_charset_variants_present(self, pages_table):
        """The fixture carries real ISO-8859-1 pages (mojibake under a
        UTF-8 decode) and unresolvable-charset pages (error-string text,
        TextExtractor.java:57-66)."""
        from topicrawler_ray.stages.extract import decode_page_bytes, sniff_charset

        n_latin = n_bad = 0
        for i in range(pages_table.num_rows):
            html = pages_table["html"][i].as_py()
            cs = sniff_charset(html)
            if cs is None:
                continue
            url = pages_table["url"][i].as_py()
            if cs.lower() == "iso-8859-1":
                n_latin += 1
                good = decode_page_bytes(url, html)
                assert "café entrée." in good
                # a UTF-8 decode of the same bytes is mojibake
                assert "café" not in html.decode("utf-8", "replace")
            else:
                n_bad += 1
                text = decode_page_bytes(url, html)
                assert text == (
                    "Failed to get content of URI: '%s'. "
                    "(1 UnsupportedCharsetException:x-no-such-charset-1)\n" % url
                )
        assert n_latin > 0 and n_bad > 0

    def test_mega_host_skew(self, pages_table):
        hosts = [u.split("/")[2] for u in pages_table["url"].to_pylist()]
        from collections import Counter

        c = Counter(hosts)
        total = sum(v for k, v in c.items())
        assert c["host0.example"] / total > 0.3  # mega-host ~40%

    def test_robots_pages_present(self, pages_table):
        robots = [u for u in pages_table["url"].to_pylist() if u.endswith("robots.txt")]
        assert len(robots) >= 3

    def test_dirty_pages_cleaned_in_oracle(self, pages_table):
        texts = pages_table["text"].to_pylist()
        assert any("¿" in t for t in texts)
        assert not any("﻿" in t or "�" in t for t in texts)


class TestFlagshipPipeline:
    def test_scored_pages_end_to_end(self, ray_session, sf_dir):
        from topicrawler_ray.pipelines.flagship import scored_pages

        df = scored_pages(sf_dir, concurrency=2).to_pandas()
        assert len(df) == 510
        body = df[~df.url.str.endswith("robots.txt")]
        # empty pages -> perp -1 (reject); buckets all populated
        assert (body.perp == -1).sum() > 0
        assert ((body.perp > 1) & (body.perp <= 500)).sum() > 0
        assert ((body.perp > 500) & (body.perp <= 5000)).sum() > 0
        assert (body.perp > 5000).sum() > 0
        # %012g round trip: the string the prioritizer parses
        for p, s in zip(body.perp, body.perp_str):
            assert len(s) == 12 or p in (-1.0,)
