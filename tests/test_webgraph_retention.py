"""Round-5 batch-5 operators: host reciprocity, k-core peel, cohort
retention, character diversity."""

import pyarrow as pa


def _edges(pairs):
    import ray

    src, dst = zip(*pairs)
    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(src), pa.string()),
                "dst": pa.array(list(dst), pa.string()),
            }
        )
    )


class TestHostReciprocity:
    def test_hand_graph(self, ray_session):
        from topicrawler_ray.stages.graph import host_reciprocity

        # a<->b mutual, a->c one-way, c->b one-way
        pairs = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "b")]
        rows = {r["host"]: r for r in host_reciprocity(_edges(pairs)).take_all()}
        assert (rows["a"]["n_out"], rows["a"]["n_recip"]) == (2, 1)
        assert rows["a"]["recip_e6"] == 500000
        assert (rows["b"]["n_out"], rows["b"]["n_recip"]) == (1, 1)
        assert rows["b"]["recip_e6"] == 1000000
        assert (rows["c"]["n_out"], rows["c"]["n_recip"]) == (1, 0)
        assert rows["c"]["recip_e6"] == 0

    def test_sink_host_has_zero_out(self, ray_session):
        from topicrawler_ray.stages.graph import host_reciprocity

        rows = {
            r["host"]: r
            for r in host_reciprocity(_edges([("a", "b")])).take_all()
        }
        assert (rows["b"]["n_out"], rows["b"]["recip_e6"]) == (0, 0)


class TestHostKcore:
    def test_cascade_peel(self, ray_session):
        from topicrawler_ray.stages.graph import host_kcore

        # K4 on {a,b,c,d} plus a chain e-f hanging off a: 2-core keeps
        # only the clique (e and f peel in cascade: f first via deg 1,
        # then e)
        k4 = [
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        ]
        chain = [("a", "e"), ("e", "f")]
        rows = host_kcore(_edges(k4 + chain), k=2).take_all()
        hosts = sorted(r["host"] for r in rows)
        assert hosts == ["a", "b", "c", "d"]
        assert all(r["core_degree"] == 3 for r in rows)

    def test_no_kcore_is_empty(self, ray_session):
        from topicrawler_ray.stages.graph import host_kcore

        rows = host_kcore(_edges([("a", "b"), ("b", "c")]), k=3).take_all()
        assert rows == []

    def test_reversed_duplicate_edges_collapse(self, ray_session):
        from topicrawler_ray.stages.graph import host_kcore

        # triangle listed in both directions: still degree 2 each
        tri = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
               ("a", "c"), ("c", "a")]
        rows = host_kcore(_edges(tri), k=2).take_all()
        assert sorted(r["host"] for r in rows) == ["a", "b", "c"]
        assert all(r["core_degree"] == 2 for r in rows)


class TestCohortRetention:
    def test_hand_events(self, ray_session):
        import ray

        from topicrawler_ray.stages.timeseries import cohort_retention

        US = 86_400_000_000
        # user 1: days 0, 1, 3 (two events day 0 -> still one row)
        # user 2: days 0, 1;  user 3: day 1 only
        rows_in = [
            (1, 0), (1, 0), (1, US), (1, 3 * US),
            (2, 10), (2, US + 5),
            (3, US),
        ]
        ev = ray.data.from_arrow(
            pa.table(
                {
                    "user_id": pa.array([r[0] for r in rows_in], pa.int64()),
                    "ts": pa.array(
                        [r[1] for r in rows_in], pa.timestamp("us")
                    ),
                }
            )
        )
        got = {
            (r["cohort_day"], r["day_offset"]): r["n_users"]
            for r in cohort_retention(ev).take_all()
        }
        assert got == {
            (0, 0): 2,  # users 1, 2 start day 0
            (0, 1): 2,  # both return day 1
            (0, 3): 1,  # user 1 returns day 3
            (1, 0): 1,  # user 3 starts day 1
        }


class TestCharDiversity:
    def test_exact_counts(self, ray_session):
        import ray
        from collections import Counter

        from topicrawler_ray.stages.textstats import char_diversity_batch

        texts = ["aabb", "abcd", "aaaa", "", "a b"]
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )
        rows = {
            r["doc_id"]: r
            for r in ds.map_batches(
                char_diversity_batch, batch_format="pyarrow"
            ).take_all()
        }
        for i, t in enumerate(texts):
            n = len(t)
            m = sum(v * v for v in Counter(t).values())
            r = rows[i]
            assert r["n_cp"] == n
            assert r["n_distinct_cp"] == len(set(t))
            assert r["collision_mass"] == m
            assert r["simpson_e6"] == ((n * n - m) * 10**6 // (n * n) if n else 0)
        assert rows[2]["simpson_e6"] == 0  # aaaa: zero diversity
        assert rows[1]["simpson_e6"] == 750000  # abcd: 1 - 4/16


class TestRandomizedGraphParity:
    """Seeded random digraphs: the distributed triangle / k-core /
    reciprocity kernels must agree exactly with plain dict/set loops
    computed right here (independent of both the engine and the
    oracles module)."""

    def _random_pairs(self, seed, n_nodes=14, n_edges=60):
        import random

        rng = random.Random(seed)
        pairs = set()
        while len(pairs) < n_edges:
            a = "n%02d" % rng.randrange(n_nodes)
            b = "n%02d" % rng.randrange(n_nodes)
            if a != b:
                pairs.add((a, b))
        return sorted(pairs)

    def test_triangles_parity(self, ray_session):
        from topicrawler_ray.stages.graph import host_triangles

        for seed in (1, 7, 42):
            pairs = self._random_pairs(seed)
            und = {(min(a, b), max(a, b)) for a, b in pairs}
            adj = {}
            for a, b in und:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            tri = dict.fromkeys(adj, 0)
            for a, b in und:
                for c in adj[a] & adj[b]:
                    if c > b:
                        tri[a] += 1
                        tri[b] += 1
                        tri[c] += 1
            rows = {r["host"]: r for r in host_triangles(_edges(pairs)).take_all()}
            assert set(rows) == set(adj)
            for h in adj:
                assert rows[h]["degree"] == len(adj[h]), (seed, h)
                assert rows[h]["triangles"] == tri[h], (seed, h)

    def test_kcore_parity(self, ray_session):
        from topicrawler_ray.stages.graph import host_kcore

        for seed, k in ((3, 3), (11, 4), (23, 5)):
            pairs = self._random_pairs(seed)
            adj = {}
            for a, b in {(min(a, b), max(a, b)) for a, b in pairs}:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            changed = True
            while changed:
                changed = False
                for h in list(adj):
                    if h in adj and len(adj[h]) < k:
                        for nb in adj.pop(h):
                            if nb in adj:
                                adj[nb].discard(h)
                        changed = True
            rows = {
                r["host"]: r["core_degree"]
                for r in host_kcore(_edges(pairs), k=k).take_all()
            }
            assert rows == {h: len(adj[h]) for h in adj}, (seed, k)

    def test_reciprocity_parity(self, ray_session):
        from topicrawler_ray.stages.graph import host_reciprocity

        for seed in (5, 19):
            pairs = self._random_pairs(seed)
            eset = set(pairs)
            nodes = {a for a, _ in pairs} | {b for _, b in pairs}
            rows = {
                r["host"]: r for r in host_reciprocity(_edges(pairs)).take_all()
            }
            assert set(rows) == nodes
            for h in nodes:
                out = [(a, b) for a, b in pairs if a == h]
                rec = [e for e in out if (e[1], e[0]) in eset]
                assert rows[h]["n_out"] == len(out), (seed, h)
                assert rows[h]["n_recip"] == len(rec), (seed, h)
