"""Page-metadata operators: <title> extraction (charset-aware decode +
vectorized RE2) and the per-host robots.txt policy table."""

import pyarrow as pa


def _pages_ds(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array([u for u, _ in rows], pa.string()),
                "html": pa.array([h for _, h in rows], pa.binary()),
            }
        )
    )


class TestTitlesBatch:
    def test_extracts_and_handles_edge_cases(self):
        from topicrawler_ray.stages.extract import titles_batch

        batch = pa.table(
            {
                "url": pa.array(
                    [
                        "http://a.example/p1",
                        "http://a.example/robots.txt",
                        "http://a.example/p2",  # no <title>
                        "http://a.example/p3",  # bad charset -> error text
                        "http://b.example/p4",  # latin-1 declared
                    ],
                    pa.string(),
                ),
                "html": pa.array(
                    [
                        b"<html><head><title>Hello World</title></head></html>",
                        b"User-agent: *\nDisallow:",
                        b"<html><head></head><body>x</body></html>",
                        b'<html><head><meta charset="x-no-such-charset-1">'
                        b"<title>hidden</title></head></html>",
                        '<html><head><meta charset="ISO-8859-1">'
                        "<title>caf\xe9</title></head></html>".encode("iso-8859-1"),
                    ],
                    pa.binary(),
                ),
            }
        )
        out = titles_batch(batch)
        assert out.column("url").to_pylist() == [
            "http://a.example/p1",
            "http://a.example/p2",
            "http://a.example/p3",
            "http://b.example/p4",
        ]
        # the unresolvable-charset page decodes to the reference error
        # string (no <title>); the latin-1 page must decode per its
        # declaration (é survives)
        assert out.column("title").to_pylist() == [
            "Hello World",
            "",
            "",
            "caf\xe9",
        ]


class TestRobotsRules:
    def test_policy_table(self, ray_session):
        from topicrawler_ray.stages.politeness import robots_rules

        ds = _pages_ds(
            [
                ("http://a.example/p1", b"<html></html>"),  # dropped
                (
                    "http://a.example/robots.txt",
                    b"User-agent: *\nDisallow: /priv/\nDisallow: /tmp/\n"
                    b"Crawl-delay: 0.3\n# comment\n",
                ),
                ("http://b.example/robots.txt", b"User-agent: *\nDisallow:\n"),
                (
                    "http://c.example/robots.txt",
                    # rules under a non-* agent must be ignored
                    b"User-agent: other\nDisallow: /x/\nCrawl-delay: 9\n",
                ),
            ]
        )
        rows = {r["host"]: r for r in robots_rules(ds).take_all()}
        assert rows["a.example"] == {
            "host": "a.example",
            "n_disallow": 2,
            "disallow_prefixes": "/priv/,/tmp/",
            "crawl_delay_ms": 300,
            "period_waves": 3,
        }
        assert rows["b.example"]["n_disallow"] == 0
        assert rows["b.example"]["crawl_delay_ms"] == -1
        assert rows["b.example"]["period_waves"] == 1
        assert rows["c.example"]["n_disallow"] == 0
        assert rows["c.example"]["crawl_delay_ms"] == -1
