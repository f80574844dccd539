"""Standalone robots.txt cache actors (T3).

The crawl engine colocates robots rules inside frontier shards (rules
are consulted at pop time, which is shard-local - see
``state/frontier.py``).  This module additionally exposes the cache as
its own host-sharded actor pool for pipelines that need robots decisions
outside the crawl loop (e.g. filtering a URL list before scheduling).
"""

from __future__ import annotations

from .frontier import RobotsCache, parse_robots, shard_of_host


def make_robots_actors(num_shards: int):
    import ray

    @ray.remote(num_cpus=0.25)
    class RobotsShard:
        def __init__(self):
            self.cache = RobotsCache()

        def set_rules(self, host: str, rules: list[str]) -> None:
            self.cache.set_rules(host, rules)

        def set_from_body(self, host: str, body: str) -> None:
            rules, delay = parse_robots(body)
            self.cache.set_rules(host, rules, delay)

        def known(self, host: str) -> bool:
            return self.cache.known(host)

        def allowed_many(self, items: list[tuple[str, str]]) -> list[bool]:
            """items: (host, path) pairs -> allow mask (unknown hosts
            default to allowed, like Heritrix before robots fetch)."""
            return [self.cache.allowed(h, p) for h, p in items]

    return [RobotsShard.remote() for _ in range(num_shards)]


def filter_allowed(urls: list[str], robots_actors) -> list[str]:
    """Batched robots filtering of a URL list via the shard pool."""
    import ray

    from ..functions.urls import host_of_url, path_of_url

    byshard: dict[int, list[int]] = {}
    items: dict[int, list[tuple[str, str]]] = {}
    for i, u in enumerate(urls):
        h = host_of_url(u)
        s = shard_of_host(h, len(robots_actors))
        byshard.setdefault(s, []).append(i)
        items.setdefault(s, []).append((h, path_of_url(u)))
    masks = ray.get(
        [robots_actors[s].allowed_many.remote(its) for s, its in items.items()]
    )
    keep = [True] * len(urls)
    for (s, idxs), mask in zip(byshard.items(), masks):
        for i, ok in zip(idxs, mask):
            keep[i] = ok
    return [u for u, ok in zip(urls, keep) if ok]
