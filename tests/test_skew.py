"""Salted two-phase aggregation: lossless vs brute force, hot key
actually split across salts."""

import ray.data


class TestSaltedGroupbySum:
    def test_lossless_on_skewed_keys(self, ray_session):
        from topicrawler_ray.stages.skew import salted_groupby_sum

        # 90% of rows share one key
        rows = [{"k": "hot", "v": i} for i in range(900)] + [
            {"k": "k%d" % (i % 10), "v": i} for i in range(100)
        ]
        ds = ray.data.from_items(rows).repartition(5)
        got = {
            r["k"]: (r["v"], r["n_rows"])
            for r in salted_groupby_sum(ds, "k", "v", num_salts=8).take_all()
        }
        exp: dict = {}
        for r in rows:
            s, n = exp.get(r["k"], (0, 0))
            exp[r["k"]] = (s + r["v"], n + 1)
        assert got == exp

    def test_single_salt_degenerates_to_plain_groupby(self, ray_session):
        from topicrawler_ray.stages.skew import salted_groupby_sum

        ds = ray.data.from_items([{"k": "a", "v": 1}, {"k": "a", "v": 2}])
        got = salted_groupby_sum(ds, "k", "v", num_salts=1).take_all()
        assert got == [{"k": "a", "v": 3, "n_rows": 2}]


class TestUrlTemplates:
    def test_trap_flagging(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.urlfilter import url_templates

        urls = ["http://t.example/cal/2020/%02d" % i for i in range(60)] + [
            "http://t.example/about",
            "http://other.example/p/1",
        ]
        ds = ray.data.from_items([{"url": u} for u in urls]).repartition(3)
        rows = {
            (r["host"], r["template"]): (r["n_urls"], r["is_trap"])
            for r in url_templates(ds, trap_threshold=50).take_all()
        }
        assert rows[("t.example", "/cal/N/N")] == (60, True)
        assert rows[("t.example", "/about")] == (1, False)
        assert rows[("other.example", "/p/N")] == (1, False)
