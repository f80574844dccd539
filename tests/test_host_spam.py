"""Per-host link-density spam signal (stages/politeness.py::host_link_spam)."""

import pytest
import ray.data

from topicrawler_ray.stages.politeness import host_link_spam


def _page(url, hrefs):
    body = "".join('<a href="%s">x</a>' % h for h in hrefs)
    return {"url": url, "html": ("<html><body>%s</body></html>" % body).encode()}


class TestHostLinkSpam:
    def test_counts_ratios_and_flag(self, ray_session):
        rows = [
            # farm.example: 2 pages, 10 links, all offsite -> 5 links/page
            _page("http://farm.example/a", ["http://t%d.example/" % i for i in range(6)]),
            _page("http://farm.example/b", ["http://t%d.example/" % i for i in range(4)]),
            # clean.example: 2 pages, 2 links, 1 offsite
            _page("http://clean.example/a", ["http://clean.example/b"]),
            _page("http://clean.example/b", ["http://farm.example/a"]),
            # robots + empty html never count
            {"url": "http://farm.example/robots.txt", "html": b"User-agent: *"},
            {"url": "http://empty.example/x", "html": b""},
        ]
        out = host_link_spam(
            ray.data.from_items(rows), spam_links_per_page_e4=30000
        ).to_pandas()
        by = {r.host: r for r in out.itertuples()}
        assert set(by) == {"farm.example", "clean.example"}
        farm = by["farm.example"]
        assert (farm.n_pages, farm.n_links, farm.n_offsite) == (2, 10, 10)
        assert farm.links_per_page_e4 == 50000
        assert farm.offsite_ratio_e4 == 10000
        assert bool(farm.spam)
        clean = by["clean.example"]
        assert (clean.n_pages, clean.n_links, clean.n_offsite) == (2, 2, 1)
        assert clean.links_per_page_e4 == 10000
        assert clean.offsite_ratio_e4 == 5000
        assert not bool(clean.spam)


class TestRobotsBlocked:
    def test_prefix_audit(self, ray_session):
        """Outlink candidates audited against TARGET-host Disallow
        prefixes; hosts without rules count but never block."""
        from topicrawler_ray.stages.politeness import robots_blocked

        robots = (
            b"User-agent: *\nDisallow: /private/\nDisallow: /tmp\n"
        )
        rows = [
            {"url": "http://a.example/robots.txt", "html": robots},
            # b.example has no Disallow rules
            {"url": "http://b.example/robots.txt",
             "html": b"User-agent: *\nDisallow:\n"},
            _page(
                "http://b.example/p1",
                [
                    "http://a.example/private/x",  # blocked
                    "http://a.example/tmpfile",    # blocked (prefix /tmp)
                    "http://a.example/public",     # allowed
                    "http://b.example/private/y",  # no rules on b -> allowed
                ],
            ),
            _page(
                "http://a.example/p1",
                [
                    "http://a.example/private/x",  # blocked (dup target ok)
                    "http://c.example/anything",   # host with no robots row
                ],
            ),
        ]
        for blocks in (1, 4):
            out = robots_blocked(
                ray.data.from_items(rows).repartition(blocks)
            ).to_pandas()
            by = {r.host: r for r in out.itertuples()}
            assert set(by) == {"a.example", "b.example", "c.example"}
            a = by["a.example"]
            assert (a.n_links, a.n_blocked) == (4, 3)
            assert a.blocked_ratio_e4 == 7500
            assert (by["b.example"].n_links, by["b.example"].n_blocked) == (1, 0)
            assert (by["c.example"].n_links, by["c.example"].n_blocked) == (1, 0)
