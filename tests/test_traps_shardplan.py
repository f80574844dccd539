"""Round-5 batch-4 operators: crawl-trap signals, hybrid shard
planning, host-graph triangles, BPE fertility."""

import hashlib

import pyarrow as pa
import pytest


def _url_ds(urls):
    import ray

    return ray.data.from_arrow(pa.table({"url": pa.array(urls, pa.string())}))


class TestTrapSignals:
    def test_split_parts(self):
        from topicrawler_ray.stages.traps import _split_parts

        assert _split_parts("http://A.example/x/y?sid=1") == (
            "a.example",
            "/x/y",
            "sid=1",
        )
        assert _split_parts("http://a.example") == ("a.example", "/", None)
        assert _split_parts("http://a.example/") == ("a.example", "/", None)

    def test_adjacent_repeat(self):
        from topicrawler_ray.stages.traps import _has_adjacent_repeat

        assert _has_adjacent_repeat(["page", "page", "x"])
        assert not _has_adjacent_repeat(["page", "x", "page"])
        assert not _has_adjacent_repeat(["page"])
        assert not _has_adjacent_repeat([])

    def test_signals_hand_computed(self, ray_session):
        from topicrawler_ray.stages.traps import host_trap_signals

        urls = (
            # cal.example: 2/3 calendar URLs -> cal_trap
            ["http://cal.example/cal/2019/5/17", "http://cal.example/cal/2020/1/1"]
            + ["http://cal.example/about"]
            # sess.example: all query URLs, all distinct -> sess_trap
            + ["http://sess.example/item?sid=%d" % i for i in range(4)]
            # loop.example: 1/2 repeated-segment URLs -> rep_trap
            + ["http://loop.example/a/a/b", "http://loop.example/a/b"]
            # ok.example: nothing trips; one shared query value
            + ["http://ok.example/p1", "http://ok.example/p2",
               "http://ok.example/p3", "http://ok.example/p4?q=1"]
        )
        rows = {r["host"]: r for r in host_trap_signals(_url_ds(urls)).take_all()}
        cal = rows["cal.example"]
        assert (cal["n_urls"], cal["n_cal"], cal["cal_trap"]) == (3, 2, True)
        assert not cal["rep_trap"] and not cal["sess_trap"]
        sess = rows["sess.example"]
        assert (sess["n_query"], sess["n_qvals"], sess["sess_trap"]) == (4, 4, True)
        loop = rows["loop.example"]
        assert (loop["n_rep"], loop["rep_trap"]) == (1, True)
        assert loop["max_depth"] == 3
        ok = rows["ok.example"]
        assert not ok["is_trap"]
        assert (ok["n_query"], ok["n_qvals"]) == (1, 1)
        assert all(
            rows[h]["is_trap"]
            == (rows[h]["cal_trap"] or rows[h]["rep_trap"] or rows[h]["sess_trap"])
            for h in rows
        )

    def test_year_inside_word_not_calendar(self, ray_session):
        from topicrawler_ray.stages.traps import host_trap_signals

        urls = ["http://x.example/a1999", "http://x.example/b19/c5"]
        (row,) = host_trap_signals(_url_ds(urls)).take_all()
        assert row["n_cal"] == 0


class TestShardPlan:
    def _pages(self, sizes):
        import ray

        return ray.data.from_arrow(
            pa.table(
                {
                    "url": pa.array(
                        ["http://%s/p" % h for h in sizes], pa.string()
                    ),
                    "html": pa.array(
                        [b"x" * n for n in sizes.values()], pa.binary()
                    ),
                }
            )
        )

    def test_lpt_packs_heavy_head(self, ray_session):
        from topicrawler_ray.stages.shardplan import plan_shards

        sizes = {"a.example": 100, "b.example": 60, "c.example": 50,
                 "d.example": 40}
        rows = {
            r["host"]: r
            for r in plan_shards(
                self._pages(sizes), n_shards=2, top_hosts=10
            ).take_all()
        }
        assert all(r["method"] == "lpt" for r in rows.values())
        # LPT: 100->s0, 60->s1, 50->s1(110? no: loads 100 vs 60, 50->s1=110),
        # 40 -> s0=140?  loads after 50: s0=100, s1=110 -> 40->s0
        assert rows["a.example"]["shard"] == 0
        assert rows["b.example"]["shard"] == 1
        assert rows["c.example"]["shard"] == 1
        assert rows["d.example"]["shard"] == 0
        loads = [0, 0]
        for r in rows.values():
            loads[r["shard"]] += r["host_bytes"]
        assert max(loads) - min(loads) <= 100

    def test_tail_hashes_deterministically(self, ray_session):
        from topicrawler_ray.stages.shardplan import plan_shards

        sizes = {"h%d.example" % i: 10 + i for i in range(8)}
        rows = plan_shards(self._pages(sizes), n_shards=4, top_hosts=3).take_all()
        methods = {r["host"]: r["method"] for r in rows}
        assert sum(1 for m in methods.values() if m == "lpt") == 3
        for r in rows:
            if r["method"] == "hash":
                expect = (
                    int(
                        hashlib.md5(r["host"].encode()).hexdigest()[:8], 16
                    )
                    % 4
                )
                assert r["shard"] == expect


class TestHostTriangles:
    def _edges(self, pairs):
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

    def test_known_graph(self, ray_session):
        from topicrawler_ray.stages.graph import host_triangles

        # triangle a-b-c plus pendant d on a; the b->a duplicate must
        # collapse in canonicalization
        pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"), ("a", "d")]
        rows = {r["host"]: r for r in host_triangles(self._edges(pairs)).take_all()}
        assert rows["a"]["degree"] == 3 and rows["a"]["triangles"] == 1
        assert rows["b"]["degree"] == 2 and rows["b"]["triangles"] == 1
        assert rows["c"]["triangles"] == 1
        assert rows["d"]["degree"] == 1 and rows["d"]["triangles"] == 0
        assert rows["a"]["wedges"] == 3 and rows["a"]["cc_e6"] == 333333
        assert rows["b"]["cc_e6"] == 1000000
        assert rows["d"]["cc_e6"] == 0

    def test_square_has_no_triangles(self, ray_session):
        from topicrawler_ray.stages.graph import host_triangles

        pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        rows = host_triangles(self._edges(pairs)).take_all()
        assert all(r["triangles"] == 0 for r in rows)
        assert all(r["degree"] == 2 for r in rows)


class TestBpeFertility:
    def test_matches_direct_fold(self, ray_session):
        import ray

        from topicrawler_ray.stages.bpe import (
            _encode_word,
            bpe_fertility,
            train_bpe,
        )

        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        "the cat sat on the mat",
                        "the dog sat on the log",
                        "le chat et le chien",
                        "le chien et le chat",
                    ],
                    pa.string(),
                ),
                "lang": pa.array(["en", "en", "fr", "fr"], pa.string()),
            }
        )
        ds = ray.data.from_arrow(docs)
        merges = train_bpe(ds, num_merges=20, min_count=2)
        rows = {r["lang"]: r for r in bpe_fertility(ds, merges).take_all()}

        ranks = {p: i for i, p in enumerate(merges)}
        expect: dict[str, list[int]] = {}
        for t, lang in zip(docs.column("text").to_pylist(),
                           docs.column("lang").to_pylist()):
            words = t.split(" ")
            c = expect.setdefault(lang, [0, 0, 0, 0])
            c[0] += 1
            c[1] += len(words)
            c[2] += sum(len(_encode_word(w, ranks)) for w in words)
            c[3] += len(t.encode("utf-8"))
        for lang, (nd, nw, nt, nb) in expect.items():
            r = rows[lang]
            assert (r["n_docs"], r["n_words"], r["n_tokens"], r["n_bytes"]) == (
                nd,
                nw,
                nt,
                nb,
            )
            assert r["tokens_per_100w"] == nt * 100 // nw
            assert r["bytes_per_token_e2"] == nb * 100 // nt
