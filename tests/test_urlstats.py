"""URL-structure analytics: depth histogram + tracking-param audit."""

import pyarrow as pa
import ray.data


URLS = [
    "http://a.example/x",                      # depth 1, no query
    "http://a.example/x/y/z",                  # depth 3
    "http://a.example/x/y/z?sid=1",            # depth 3, sid=1
    "http://a.example/x/y/z?sid=2&utm=u",      # depth 3, sid=2 utm=u
    "http://B.example/p?sid=3",                # host lowercased
    "http://b.example/p?utm=u&utm=u",          # repeated key, same val
    "http://b.example/q?flag",                 # bare key, empty value
]


def _ds():
    return ray.data.from_arrow(
        pa.table({"url": pa.array(URLS, pa.string())})
    ).repartition(3)


class TestUrlDepthHistogram:
    def test_hand_counts(self, ray_session):
        from topicrawler_ray.stages.urlstats import url_depth_histogram

        rows = {
            (r["host"], r["depth"]): r["n_urls"]
            for r in url_depth_histogram(_ds()).take_all()
        }
        assert rows == {
            ("a.example", 1): 1,
            ("a.example", 3): 3,
            ("b.example", 1): 3,
        }


class TestUrlParamAudit:
    def test_hand_counts_and_flags(self, ray_session):
        from topicrawler_ray.stages.urlstats import url_param_audit

        rows = {
            (r["host"], r["key"]): (
                r["n_urls"],
                r["n_distinct_vals"],
                r["is_tracking"],
            )
            for r in url_param_audit(_ds()).take_all()
        }
        assert rows == {
            # sid: 2 urls on a, both distinct -> tracking
            ("a.example", "sid"): (2, 2, True),
            ("a.example", "utm"): (1, 1, True),
            ("b.example", "sid"): (1, 1, True),
            # utm twice with ONE distinct value -> 2*1 >= 2 -> True
            ("b.example", "utm"): (2, 1, True),
            # bare key parses to empty value
            ("b.example", "flag"): (1, 1, True),
        }

    def test_low_cardinality_key_not_flagged(self, ray_session):
        from topicrawler_ray.stages.urlstats import url_param_audit

        urls = ["http://h.example/p%d?cat=c%d" % (i, i % 2) for i in range(20)]
        ds = ray.data.from_arrow(pa.table({"url": pa.array(urls)}))
        (row,) = url_param_audit(ds).take_all()
        assert (row["n_urls"], row["n_distinct_vals"], row["is_tracking"]) == (
            20,
            2,
            False,
        )
