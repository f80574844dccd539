"""Link-graph PageRank (stages/graph.py): integer iteration semantics,
join/broadcast mode equality, edge extraction from the pages fixture."""

import pyarrow as pa
import pytest

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),
    ("e", "f"),  # f dangles: no outlinks
]


def seq_pagerank(edges, iterations=5, alpha_num=85, alpha_den=100, scale=10**12):
    """Independent dict-loop reference (mirrors the documented integer
    semantics; deliberately NOT imported from the module under test)."""
    edges = sorted(set(edges))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    n = len(nodes)
    init = scale // n
    base = ((alpha_den - alpha_num) * init) // alpha_den
    rank = {u: init for u in nodes}
    for _ in range(iterations):
        share = sum(r for u, r in rank.items() if outdeg.get(u, 0) == 0) // n
        ins = dict.fromkeys(nodes, 0)
        for s, d in edges:
            ins[d] += rank[s] // outdeg[s]
        rank = {u: base + (alpha_num * (ins[u] + share)) // alpha_den for u in nodes}
    return rank


def _edges_ds(edges):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"src": [e[0] for e in edges], "dst": [e[1] for e in edges]})
    ).repartition(4)


class TestPagerank:
    @pytest.mark.parametrize("mode", ["join", "broadcast"])
    def test_matches_sequential_reference(self, ray_session, mode):
        from topicrawler_ray.stages.graph import pagerank

        out = pagerank(_edges_ds(EDGES), iterations=5, mode=mode)
        got = {r["node"]: r["rank"] for r in out.take_all()}
        assert got == seq_pagerank(EDGES)

    def test_mass_roughly_conserved(self, ray_session):
        from topicrawler_ray.stages.graph import pagerank

        out = pagerank(_edges_ds(EDGES), iterations=3)
        total = sum(r["rank"] for r in out.take_all())
        # floor-division drops at most a few units per node per step
        assert abs(total - 10**12) < 10**7

    def test_duplicate_input_edges_are_deduped_upstream(self, ray_session):
        # pagerank assumes distinct edges (page_edges guarantees it);
        # feeding the distinct list twice through page_edges-style
        # dedup must not change ranks
        import ray.data

        from topicrawler_ray.stages.graph import pagerank

        dup = _edges_ds(EDGES + EDGES)
        deduped = (
            dup.groupby(["src", "dst"]).count().select_columns(["src", "dst"])
        ).repartition(4)
        got = {
            r["node"]: r["rank"]
            for r in pagerank(deduped, iterations=4).take_all()
        }
        assert got == seq_pagerank(EDGES, iterations=4)


class TestPageEdges:
    def test_fixture_edges_match_sequential_extraction(self, ray_session, sf_dir):
        from topicrawler_ray.functions.urls import extract_outlinks
        from topicrawler_ray.sources.pages import read_pages
        from topicrawler_ray.stages.extract import decode_page_bytes, is_robots_url
        from topicrawler_ray.stages.graph import page_edges

        got = {
            (r["src"], r["dst"])
            for r in page_edges(read_pages(sf_dir, num_blocks=8)).take_all()
        }

        import pyarrow.parquet as pq

        from topicrawler_ray.sources.pages import pages_path

        t = pq.read_table(pages_path(sf_dir), columns=["url", "html"])
        exp = set()
        for url, html in zip(
            t.column("url").to_pylist(), t.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            for dst in extract_outlinks(decode_page_bytes(url, html), url):
                exp.add((url, dst))
        assert got == exp
        assert len(got) > 0


class TestHostEdges:
    def test_offsite_host_pairs_match_sequential_extraction(
        self, ray_session, sf_dir
    ):
        from topicrawler_ray.functions.urls import extract_outlinks, host_of_url
        from topicrawler_ray.sources.pages import read_pages
        from topicrawler_ray.stages.extract import decode_page_bytes, is_robots_url
        from topicrawler_ray.stages.graph import host_edges

        got = {
            (r["src"], r["dst"])
            for r in host_edges(read_pages(sf_dir, num_blocks=8)).take_all()
        }

        import pyarrow.parquet as pq

        from topicrawler_ray.sources.pages import pages_path

        t = pq.read_table(pages_path(sf_dir), columns=["url", "html"])
        exp = set()
        for url, html in zip(
            t.column("url").to_pylist(), t.column("html").to_pylist()
        ):
            if is_robots_url(url) or not html:
                continue
            src_host = host_of_url(url)
            for dst in extract_outlinks(decode_page_bytes(url, html), url):
                dst_host = host_of_url(dst)
                if dst_host != src_host:
                    exp.add((src_host, dst_host))
        assert got == exp
        assert len(got) > 0
        assert all(s != d for s, d in got)

    def test_host_pagerank_matches_sequential_on_host_graph(
        self, ray_session, sf_dir
    ):
        from topicrawler_ray.oracles import _b_host_pagerank
        from topicrawler_ray.sources.pages import read_pages
        from topicrawler_ray.stages.graph import host_edges, pagerank

        out = pagerank(
            host_edges(read_pages(sf_dir, num_blocks=8)), iterations=5
        )
        got = {r["node"]: r["rank"] for r in out.take_all()}
        exp_t = _b_host_pagerank(sf_dir)
        exp = dict(
            zip(
                exp_t.column("node").to_pylist(),
                exp_t.column("rank").to_pylist(),
            )
        )
        assert got == exp


class TestHits:
    def test_matches_sequential_reference(self, ray_session):
        from topicrawler_ray.stages.graph import hits

        def seq_hits(edges, iterations=4, scale=10**6):
            edges = sorted(set(edges))
            nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
            n = len(nodes)
            init = scale // n
            hub = {u: init for u in nodes}
            auth = {u: 0 for u in nodes}
            for _ in range(iterations):
                raw = dict.fromkeys(nodes, 0)
                for s, d in edges:
                    raw[d] += hub[s]
                tot = sum(raw.values())
                auth = {
                    u: (raw[u] * scale // tot if tot > 0 else raw[u])
                    for u in nodes
                }
                raw = dict.fromkeys(nodes, 0)
                for s, d in edges:
                    raw[s] += auth[d]
                tot = sum(raw.values())
                hub = {
                    u: (raw[u] * scale // tot if tot > 0 else raw[u])
                    for u in nodes
                }
            return {u: (hub[u], auth[u]) for u in nodes}

        out = hits(_edges_ds(EDGES), iterations=4)
        got = {r["node"]: (r["hub"], r["auth"]) for r in out.take_all()}
        assert got == seq_hits(EDGES)
        # structural sanity: 'c' has 3 in-links -> top authority
        assert max(got, key=lambda u: got[u][1]) == "c"


class TestEmptyGraph:
    def test_pagerank_and_hits_empty_edges(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.graph import hits, pagerank

        empty = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([], pa.string()),
                    "dst": pa.array([], pa.string()),
                }
            )
        )
        assert pagerank(empty, iterations=2).count() == 0
        assert hits(empty, iterations=2).count() == 0


class TestBfsDepths:
    def test_depths_match_hand_bfs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from topicrawler_ray.stages.graph import bfs_depths

        # a -> b -> c -> d, a -> c (shortcut), e -> f (unreachable),
        # g isolated seed
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(["a", "b", "c", "a", "e"], pa.string()),
                    "dst": pa.array(["b", "c", "d", "c", "f"], pa.string()),
                }
            )
        )
        out = {
            r["node"]: r["depth"]
            for r in bfs_depths(edges, ["a", "g"]).take_all()
        }
        assert out == {"a": 0, "g": 0, "b": 1, "c": 1, "d": 2}

    def test_cycle_terminates(self, ray_session):
        import pyarrow as pa
        import ray.data

        from topicrawler_ray.stages.graph import bfs_depths

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(["x", "y", "z"], pa.string()),
                    "dst": pa.array(["y", "z", "x"], pa.string()),
                }
            )
        )
        out = {
            r["node"]: r["depth"]
            for r in bfs_depths(edges, ["x"]).take_all()
        }
        assert out == {"x": 0, "y": 1, "z": 2}


class TestPersonalizedPagerank:
    def test_mass_concentrates_near_seeds(self, ray_session):
        import pyarrow as pa
        import ray.data

        from topicrawler_ray.stages.graph import personalized_pagerank

        # seed s links into a chain; x/y form a far component
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array(["s", "a", "x"], pa.string()),
                    "dst": pa.array(["a", "b", "y"], pa.string()),
                }
            )
        )
        out = {
            r["node"]: r["rank"]
            for r in personalized_pagerank(edges, ["s"], iterations=4).take_all()
        }
        assert set(out) == {"s", "a", "b", "x", "y"}
        # all teleport mass re-enters at s; the seed component holds
        # positive mass while the unreachable component decays to 0
        assert out["s"] > 0 and out["a"] > 0 and out["b"] > 0
        assert out["x"] == 0 and out["y"] == 0

    def test_matches_sequential_semantics(self, ray_session):
        import pyarrow as pa
        import ray.data

        from topicrawler_ray.stages.graph import personalized_pagerank

        E = [("s", "a"), ("a", "b"), ("b", "s"), ("a", "c"), ("c", "b")]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "src": pa.array([e[0] for e in E], pa.string()),
                    "dst": pa.array([e[1] for e in E], pa.string()),
                }
            )
        )
        got = {
            r["node"]: r["rank"]
            for r in personalized_pagerank(
                edges, ["s", "c"], iterations=3
            ).take_all()
        }
        # hand-rolled dict replica of the documented integer semantics
        nodes = sorted({x for e in E for x in e} | {"s", "c"})
        outdeg: dict = {}
        for s, _ in E:
            outdeg[s] = outdeg.get(s, 0) + 1
        sset = {"s", "c"}
        scale, an, ad = 10**12, 85, 100
        init = scale // 2
        base = ((ad - an) * init) // ad
        rank = {u: (init if u in sset else 0) for u in nodes}
        for _ in range(3):
            share = sum(
                r for u, r in rank.items() if outdeg.get(u, 0) == 0
            ) // 2
            ins = dict.fromkeys(nodes, 0)
            for s, d in E:
                ins[d] += rank[s] // outdeg[s]
            rank = {
                u: (base if u in sset else 0)
                + (an * (ins[u] + (share if u in sset else 0))) // ad
                for u in nodes
            }
        assert got == rank


class TestHarmonicCentrality:
    def _engine_est(self, regs):
        # the ACTUAL engine kernel — any estimator drift in
        # stages/graph.py is caught here against the scalar oracle
        from topicrawler_ray.stages.graph import hll_estimate_batch

        return hll_estimate_batch(regs)

    def test_estimator_lockstep_with_oracle(self):
        """The oracle's scalar estimator and the engine's vectorized
        one must floor to the same int64 on random register arrays."""
        import math

        import numpy as np

        m = 16
        rng = np.random.RandomState(7)
        regs = rng.randint(0, 61, size=(500, m)).astype(np.int64)
        regs[:50] = 0  # all-zero rows (fresh counters)
        regs[50:100, : m - 1] = 0  # nearly-empty (LC branch)

        def oracle_est(reg):
            den = np.float64(0.0)
            for j in range(m):
                den += np.exp2(np.float64(-reg[j]))
            alpha = 0.7213 / (1.0 + 1.079 / m)
            e = alpha * m * m / den
            v = sum(1 for r in reg if r == 0)
            if e <= 2.5 * m and v > 0:
                e = m * np.log(m / np.float64(v))
            return int(np.floor(e))

        got = self._engine_est(regs)
        exp = [oracle_est(list(r)) for r in regs]
        assert got.tolist() == exp

    def test_path_graph_harmonic_close_to_exact(self, ray_session):
        """On a 6-node path a->b->...->f the TRUE harmonic centrality
        of node k is sum(1/d for d in 1..k).  The HLL balls are tiny
        (<= 6 nodes), where the estimator's relative error can reach
        ~35% at m=16 — assert ordering + coarse value agreement."""
        import ray.data

        from topicrawler_ray.stages.graph import harmonic_centrality

        names = ["a", "b", "c", "d", "e", "f"]
        edges = ray.data.from_items(
            [
                {"src": s, "dst": d}
                for s, d in zip(names, names[1:])
            ]
        )
        out = {
            r["node"]: r["harmonic_e6"] / 1e6
            for r in harmonic_centrality(edges, p=4, max_iters=8).take_all()
        }
        exact = {
            n: sum(1.0 / d for d in range(1, k + 1))
            for k, n in enumerate(names)
        }
        assert out["a"] == 0.0
        # strict monotonicity is NOT guaranteed (the estimator's
        # discrete jumps at tiny ball sizes) — assert coarse value
        # agreement per node and that the head is clearly separated
        # from the tail
        for n in names[1:]:
            assert abs(out[n] - exact[n]) / exact[n] < 0.4
        assert out["f"] > out["b"] > out["a"]

    def test_partitioning_invariance(self, ray_session, sf_dir):
        from topicrawler_ray.sources.pages import read_pages
        from topicrawler_ray.stages.graph import harmonic_centrality, host_edges

        def run(nparts, nblocks):
            edges = host_edges(
                read_pages(sf_dir, num_blocks=nblocks, columns=["url", "html"])
            )
            return sorted(
                (r["node"], r["reach"], r["harmonic_e6"])
                for r in harmonic_centrality(
                    edges, p=4, max_iters=8, num_partitions=nparts
                ).take_all()
            )

        a = run(2, 3)
        b = run(7, 16)
        assert a == b
        assert len(a) > 0

    def test_matches_sequential_oracle(self, ray_session, sf_dir):
        from topicrawler_ray.oracles import _b_host_harmonic

        import __ray_entry__ as e

        got = (
            e.queries()["host_harmonic"](sf_dir)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        exp = (
            _b_host_harmonic(sf_dir)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert got.equals(exp)


class TestDegrees:
    def test_hand_graph(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.graph import degrees

        edges = ray.data.from_items(
            [
                {"src": "a", "dst": "b"},
                {"src": "a", "dst": "c"},
                {"src": "b", "dst": "c"},
                {"src": "c", "dst": "a"},
            ]
        )
        out = (
            degrees(edges)
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        assert out.node.tolist() == ["a", "b", "c"]
        assert out.outdeg.tolist() == [2, 1, 1]
        assert out.indeg.tolist() == [1, 1, 2]


def _random_edges(seed: int, n_hosts: int = 14, p_keep: int = 55):
    """Deterministic random directed host edge set (no self-loops)."""
    import random

    rng = random.Random(seed)
    edges = [
        ("h%d" % i, "h%d" % j)
        for i in range(n_hosts)
        for j in range(n_hosts)
        if i != j and rng.randrange(100) < p_keep
    ]
    return edges


def _edges_ds(edges):
    import pyarrow as pa
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array([s for s, _ in edges], pa.string()),
                "dst": pa.array([d for _, d in edges], pa.string()),
            }
        )
    ).repartition(4)


class TestAssortativity:
    def test_matches_sequential_moments(self, ray_session):
        from topicrawler_ray.stages.graph import host_assortativity

        for seed in (3, 11):
            edges = _random_edges(seed)
            und = {(min(s, d), max(s, d)) for s, d in edges}
            deg = {}
            for a, b in und:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            m = len(und)
            s1 = sum(deg[a] * deg[b] for a, b in und)
            s2 = sum(deg[a] + deg[b] for a, b in und)
            s3 = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in und)
            num = 4 * m * s1 - s2 * s2
            den = 2 * m * s3 - s2 * s2
            df = host_assortativity(_edges_ds(edges))
            row = df.iloc[0]
            assert (
                row["n_edges"],
                row["sum_jk"],
                row["sum_j_plus_k"],
                row["sum_j2_plus_k2"],
                row["r_e9"],
            ) == (m, s1, s2, s3, (num * 10**9) // den if den else 0)

    def test_star_graph_is_perfectly_disassortative(self, ray_session):
        from topicrawler_ray.stages.graph import host_assortativity

        edges = [("hub", "leaf%d" % i) for i in range(6)]
        df = host_assortativity(_edges_ds(edges))
        assert df.iloc[0]["r_e9"] == -(10**9)


class TestGlobalClustering:
    def test_matches_sequential_transitivity(self, ray_session):
        from topicrawler_ray.stages.graph import host_clustering

        edges = _random_edges(7)
        und = {(min(s, d), max(s, d)) for s, d in edges}
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        closed = sum(len(adj[a] & adj[b]) for a, b in und)
        wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
        df = host_clustering(_edges_ds(edges))
        row = df.iloc[0]
        assert (row["n_hosts"], row["sum_closed"], row["sum_wedges"]) == (
            len(adj),
            closed,
            wedges,
        )
        assert row["gcc_e6"] == (closed * 10**6) // wedges

    def test_triangle_graph_gcc_is_one(self, ray_session):
        from topicrawler_ray.stages.graph import host_clustering

        edges = [("a", "b"), ("b", "c"), ("c", "a")]
        assert host_clustering(_edges_ds(edges)).iloc[0]["gcc_e6"] == 10**6


class TestMirrorPairs:
    def _sequential(self, edges):
        outs = {}
        for s, d in set(edges):
            outs.setdefault(s, set()).add(d)
        hosts = sorted(outs)
        exp = {}
        for i, a in enumerate(hosts):
            for b in hosts[i + 1 :]:
                c = len(outs[a] & outs[b])
                if c:
                    u = len(outs[a]) + len(outs[b]) - c
                    exp[(a, b)] = (c, len(outs[a]), len(outs[b]), c * 10**6 // u)
        return exp

    def test_matches_sequential_jaccard(self, ray_session):
        from topicrawler_ray.stages.graph import host_mirror_pairs

        edges = _random_edges(19, n_hosts=10, p_keep=40)
        # duplicate some edges: the kernel must dedup before counting
        edges = edges + edges[::3]
        exp = self._sequential(edges)
        got = {
            (r["a"], r["b"]): (
                r["n_common"],
                r["outdeg_a"],
                r["outdeg_b"],
                r["jaccard_e6"],
            )
            for r in host_mirror_pairs(_edges_ds(edges)).take_all()
        }
        assert got == exp

    def test_max_fan_drops_mega_target_pairs(self, ray_session):
        from topicrawler_ray.stages.graph import host_mirror_pairs

        # every host links to 'mega'; a/b also share a private target
        edges = [("s%d" % i, "mega") for i in range(8)]
        edges += [("s0", "t"), ("s1", "t")]
        got = {
            (r["a"], r["b"]): r["n_common"]
            for r in host_mirror_pairs(_edges_ds(edges), max_fan=4).take_all()
        }
        # the mega-target group (fan 8 > 4) contributes no pairs; only
        # the private shared target survives
        assert got == {("s0", "s1"): 1}


class TestAnchorTitleMatch:
    def test_synthetic_pages_counts_and_matches(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.graph import anchor_title_match

        def page(url, title, links):
            body = "".join(
                '<a href="%s">%s</a>' % (h, t) for h, t in links
            )
            html = (
                "<html><head><title>%s</title></head><body>%s</body></html>"
                % (title, body)
            )
            return {"url": url, "html": html.encode("utf-8")}

        pages = [
            page(
                "http://a.example/",
                "Alpha Home",
                [
                    ("http://b.example/", "Beta page"),   # match
                    ("http://b.example/", "nope"),        # no match
                    ("http://c.example/", "anything"),    # target not crawled
                ],
            ),
            page(
                "http://b.example/",
                "The Beta Page of record",
                [("http://a.example/", "alpha HOME")],    # case-insensitive
            ),
        ]
        out = {
            r["dst"]: (r["n_anchors"], r["n_match"])
            for r in anchor_title_match(
                ray.data.from_items(pages).repartition(2)
            ).take_all()
        }
        assert out == {
            "http://a.example/": (1, 1),
            "http://b.example/": (2, 1),
        }


class TestLinkLangMatrix:
    def test_hand_graph(self, ray_session):
        """Inner-join semantics (unknown targets dropped), counts per
        (src_lang, dst_lang), partition-invariant."""
        import ray.data

        from topicrawler_ray.stages.graph import link_lang_matrix

        def page(url, lang, hrefs):
            body = "".join('<a href="%s">x</a>' % h for h in hrefs)
            return {
                "url": url,
                "lang": lang,
                "html": ("<html><body>%s</body></html>" % body).encode(),
            }

        rows = [
            page("http://a.example/p1", "en",
                 ["http://a.example/p2", "http://b.example/p1",
                  "http://gone.example/x"]),  # unknown target dropped
            page("http://a.example/p2", "en", ["http://a.example/p1"]),
            page("http://b.example/p1", "de",
                 ["http://a.example/p1", "http://a.example/p1"]),  # x2
            {"url": "http://a.example/robots.txt", "lang": "xx",
             "html": b"User-agent: *"},
        ]
        for blocks in (1, 4):
            out = (
                link_lang_matrix(ray.data.from_items(rows).repartition(blocks))
                .to_pandas()
                .sort_values(["src_lang", "dst_lang"])
                .reset_index(drop=True)
            )
            assert out.to_dict("records") == [
                {"src_lang": "de", "dst_lang": "en", "n_links": 2},
                {"src_lang": "en", "dst_lang": "de", "n_links": 1},
                {"src_lang": "en", "dst_lang": "en", "n_links": 2},
            ]


class TestLabelPropagation:
    def test_two_cliques_bridge_matches_sequential_spec(self, ray_session):
        """Two 3-cliques + a bridge: the engine lands exactly on the
        synchronous-LPA spec (simultaneous majority, smallest-label
        ties, 4 rounds), verified against an inline sequential
        reference — note the min-tie-break legitimately PULLS labels
        across the bridge, so the expectation is the spec's output,
        not 'two neat cliques'."""
        import ray.data

        from topicrawler_ray.stages.graph import label_propagation_communities

        pairs = [
            ("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
            ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
            ("a3", "b1"),
        ]
        adj: dict[str, list[str]] = {}
        for s, d in pairs:
            adj.setdefault(s, []).append(d)
            adj.setdefault(d, []).append(s)
        labels = {v: v for v in adj}
        for _ in range(4):
            labels = {
                v: sorted(
                    __import__("collections").Counter(
                        labels[u] for u in neigh
                    ).items(),
                    key=lambda t: (-t[1], t[0]),
                )[0][0]
                for v, neigh in adj.items()
            }

        edges = ray.data.from_items(
            [{"src": s, "dst": d} for s, d in pairs]
        ).repartition(3)
        out = {
            r["host"]: r["community"]
            for r in label_propagation_communities(edges, rounds=4).take_all()
        }
        assert out == labels
        # the a-clique keeps its own smallest label
        assert out["a1"] == out["a2"] == "a1"

    def test_partition_invariance(self, ray_session, sf_dir):
        """The deterministic sync schedule gives identical labels under
        any repartitioning, and equals the sequential oracle."""
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e
        from topicrawler_ray.oracles import _b_host_communities
        from topicrawler_ray.stages.graph import label_propagation_communities

        edges = e._sparse_host_edges(sf_dir)
        a = (
            label_propagation_communities(edges, rounds=4)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        b = (
            label_propagation_communities(edges.repartition(5), rounds=4)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert a.equals(b)
        exp = (
            _b_host_communities(sf_dir)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert a.equals(exp[a.columns])
