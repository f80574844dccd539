"""Ordered funnel levels: strict ordering, ties don't progress."""

import pyarrow as pa
import ray.data


def _ev(rows):
    return ray.data.from_items(
        [{"user_id": u, "event_type": t, "ts_us": ts} for u, t, ts in rows]
    ).repartition(3)


class TestFunnel:
    def test_levels(self, ray_session):
        from topicrawler_ray.stages.funnel import funnel_levels

        rows = [
            # full funnel in order
            (1, "view", 10), (1, "click", 20), (1, "purchase", 30),
            # click BEFORE view: purchase never follows a post-view click
            (2, "click", 5), (2, "view", 10), (2, "purchase", 15),
            # only view
            (3, "view", 1),
            # never views (absent from output)
            (4, "purchase", 1),
            # tie: click at the same instant as view - strict > fails
            (5, "view", 7), (5, "click", 7),
        ]
        got = {
            r["user_id"]: r["funnel_level"]
            for r in funnel_levels(_ev(rows), ["view", "click", "purchase"])
            .take_all()
        }
        assert got == {1: 3, 2: 1, 3: 1, 5: 1}

    def test_later_click_still_counts(self, ray_session):
        from topicrawler_ray.stages.funnel import funnel_levels

        rows = [(9, "view", 10), (9, "click", 8), (9, "click", 12)]
        got = funnel_levels(_ev(rows), ["view", "click"]).take_all()
        assert got == [{"user_id": 9, "funnel_level": 2}]
