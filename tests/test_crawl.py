"""Crawl-engine conformance tests: the distributed Ray engine must match
the independent pure-python oracle simulator exactly (ordering + seen
set), and resume from checkpoint must be lossless."""

import shutil
import tempfile

import pytest

from topicrawler_ray.config import CrawlConfig

_LOG_FIELDS = (
    "fetch_seq",
    "wave",
    "url",
    "host",
    "directive",
    "cost",
    "seq",
    "status",
    "is_robots",
    "perp_str",
    "n_outlinks",
    "via",
    "perp_via_str",
    "retries",
)

_SMALL = dict(
    num_frontier_shards=2,
    num_seen_shards=2,
    num_page_stores=2,
    num_workers=3,
    worker_num_cpus=0.5,
)


@pytest.fixture(scope="module")
def sim_result(sf_dir):
    from topicrawler_ray.pipelines.simulate import simulate_crawl

    return simulate_crawl(sf_dir)


def _assert_log_matches(log_table, sim_rows):
    log = log_table.to_pylist()
    assert len(log) == len(sim_rows)
    for a, b in zip(log, sim_rows):
        for k in _LOG_FIELDS:
            assert a[k] == b[k], (a["fetch_seq"], k, a[k], b[k])


class TestOracle:
    def test_oracle_covers_graph(self, sim_result):
        rows = sim_result.rows
        assert len(rows) > 500
        assert sum(1 for r in rows if r["is_robots"]) >= 10
        assert sum(1 for r in rows if r["status"] == 404) > 0
        assert sim_result.n_rejected > 0
        assert sim_result.n_dup > 0
        assert sim_result.n_robots_rejected > 0

    def test_priority_orders_within_wave(self, sim_result):
        prev = None
        for r in sim_result.rows:
            key = (r["wave"], r["directive"], r["cost"], r["seq"])
            if prev is not None and prev[0] == key[0]:
                assert prev[1:] <= key[1:]
            prev = key

    def test_one_fetch_per_host_per_wave(self, sim_result):
        seen = set()
        for r in sim_result.rows:
            k = (r["wave"], r["host"])
            assert k not in seen
            seen.add(k)


class TestEngineConformance:
    def test_matches_oracle_exactly(self, ray_session, sf_dir, sim_result):
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        eng = RayCrawlEngine(sf_dir, CrawlConfig(**_SMALL))
        res = eng.run()
        _assert_log_matches(res.log, sim_result.rows)
        assert res.seen_keys == sim_result.seen_keys
        assert res.stats["rejected"] == sim_result.n_rejected
        assert res.stats["duplicates"] == sim_result.n_dup

    def test_checkpoint_resume_lossless(self, ray_session, sf_dir, sim_result):
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        ckpt = tempfile.mkdtemp(prefix="topicrawler_ckpt_")
        try:
            cfg = CrawlConfig(
                checkpoint_dir=ckpt, checkpoint_every_waves=20, **_SMALL
            )
            eng = RayCrawlEngine(sf_dir, cfg)
            eng.bootstrap()
            # run past at least two checkpoints, then abandon mid-crawl
            while eng.wave < 45:
                if eng.run_wave() == 0:
                    break
            del eng

            eng2 = RayCrawlEngine(sf_dir, cfg)
            res = eng2.resume_run()
            assert res.stats["waves"] > 45
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)


class TestHopLimit:
    def test_hop_limit_conformance(self, ray_session, sf_dir):
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        cfg = CrawlConfig(max_hops=2, **_SMALL)
        res = RayCrawlEngine(sf_dir, cfg).run()
        sim = simulate_crawl(sf_dir, config=cfg)
        assert res.stats["hops_rejected"] == sim.n_hops_rejected > 0
        _assert_log_matches(res.log, sim.rows)
        assert res.seen_keys == sim.seen_keys


class TestTransientRetries:
    """Transient-failure retry/re-queue semantics (cxml:66-67): a 50x
    fetch consumes its politeness slot, re-queues with retries+1 and
    snoozes the host; after max_retries total attempts it quarantines
    with a log row.  Conformance: engine vs the simulator's independent
    implementation of the same spec, exact ordering parity."""

    def test_fault_retry_conformance_exact(self, ray_session, sf_dir):
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        # every 4th doc 503s on its first fetch, succeeds on retry;
        # short retry delay keeps the test fast
        cfg = CrawlConfig(fault_mod=4, fault_attempts=1, retry_delay_waves=7, **_SMALL)
        res = RayCrawlEngine(sf_dir, cfg).run()
        sim = simulate_crawl(sf_dir, config=cfg)
        _assert_log_matches(res.log, sim.rows)
        assert res.seen_keys == sim.seen_keys
        retried = [r for r in res.log.to_pylist() if r["retries"] > 0]
        assert retried, "fault injection produced no retried fetches"
        # retried docs eventually succeeded (status 200 after 1 retry)
        assert all(r["status"] == 200 for r in retried if not r["is_robots"])

    def test_fault_exhausts_to_quarantine(self, ray_session, sf_dir):
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        # faults outlast max_retries: doc quarantined with a 503 log row
        cfg = CrawlConfig(
            fault_mod=4, fault_attempts=5, max_retries=3, retry_delay_waves=5,
            **_SMALL,
        )
        res = RayCrawlEngine(sf_dir, cfg).run()
        sim = simulate_crawl(sf_dir, config=cfg)
        _assert_log_matches(res.log, sim.rows)
        assert res.seen_keys == sim.seen_keys
        quarantined = [r for r in res.log.to_pylist() if r["status"] == 503]
        assert quarantined, "no quarantined rows despite persistent faults"
        assert all(r["retries"] == cfg.max_retries - 1 for r in quarantined)
        assert all(r["n_outlinks"] == 0 for r in quarantined)


class TestHeadBudgetSpill:
    def test_spill_preserves_exact_order(self, ray_session, sf_dir, sim_result):
        """queueTotalBudget analog: per-host heaps capped at 4 entries,
        overflow spilled to disk - pop order (and therefore the whole
        crawl log) must be bit-identical to the unbounded oracle."""
        import tempfile

        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        spill = tempfile.mkdtemp(prefix="topicrawler_spill_")
        try:
            cfg = CrawlConfig(
                frontier_head_budget=4, frontier_spill_dir=spill, **_SMALL
            )
            res = RayCrawlEngine(sf_dir, cfg).run()
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
            assert sum(f["spilled"] for f in res.stats["frontier"]) > 0
        finally:
            shutil.rmtree(spill, ignore_errors=True)


class TestDrainModeResume:
    """VERDICT r4 item 7: kill the crawl around the in-actor drain mode
    (the single-active-shard politeness tail, state/frontier.py drain)
    and resume - log + seen set must still match the simulator exactly."""

    def test_kill_after_drain_segment_and_resume(self, ray_session, sf_dir, sim_result):
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        ckpt = tempfile.mkdtemp(prefix="topicrawler_ckpt_drain_")
        try:
            cfg = CrawlConfig(
                checkpoint_dir=ckpt, checkpoint_every_waves=20, **_SMALL
            )
            eng = RayCrawlEngine(sf_dir, cfg)
            eng.bootstrap()
            drained = False
            while True:
                w0 = eng.wave
                n = eng.run_wave()
                if eng.wave - w0 > 1:
                    drained = True  # a drain segment advanced many waves
                    break
                if n == 0:
                    break
            assert drained, "politeness tail never entered drain mode"
            del eng  # abandon mid-tail, between checkpoints

            eng2 = RayCrawlEngine(sf_dir, cfg)
            res = eng2.resume_run()
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)

    def test_kill_with_spill_and_checkpoint_resume(
        self, ray_session, sf_dir, sim_result
    ):
        """Spill x checkpoint intersection: overflow rows live in
        per-host spill FILES; the checkpoint must capture their content
        (snapshot copies the files; restore resets the live dir), else
        post-checkpoint appends/reloads corrupt the replay."""
        import glob
        import os

        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        ckpt = tempfile.mkdtemp(prefix="topicrawler_ckpt_sp_")
        spill = tempfile.mkdtemp(prefix="topicrawler_spill_ck_")
        try:
            cfg = CrawlConfig(
                checkpoint_dir=ckpt,
                checkpoint_every_waves=10,
                frontier_head_budget=4,
                frontier_spill_dir=spill,
                **_SMALL,
            )
            eng = RayCrawlEngine(sf_dir, cfg)
            eng.bootstrap()
            while eng.wave < 35:
                if eng.run_wave() == 0:
                    break
            assert any(
                f["spilled"] > 0
                for f in eng.ray.get([s.stats.remote() for s in eng.frontier])
            ), "head budget never spilled - test fixture too small"
            # the checkpoint carries the spill files themselves
            copied = glob.glob(os.path.join(ckpt, "wave=*", "spill_*", "*"))
            assert copied, "checkpoint captured no spill files"
            del eng  # abandon mid-crawl

            eng2 = RayCrawlEngine(sf_dir, cfg)
            res = eng2.resume_run()
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)
            shutil.rmtree(spill, ignore_errors=True)


class TestCuckooOnlyMode:
    def test_scale_mode_without_exact_set(self, ray_session, sf_dir, sim_result):
        """seen_keep_exact=False (the 10^10 memory-bounded mode): dedup
        runs on the cuckoo filter alone. False positives may drop a few
        duplicate-looking candidates, so we assert near-equality of
        coverage rather than bit-equality (which keep_exact provides)."""
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        cfg = CrawlConfig(seen_keep_exact=False, **_SMALL)
        res = RayCrawlEngine(sf_dir, cfg).run()
        assert res.log.num_rows >= 0.95 * len(sim_result.rows)
        # no exact set -> no conformance artifact in this mode
        assert res.seen_keys == set()


class TestBloomSeenMode:
    def test_bloom_conformance_exact_with_exact_set(
        self, ray_session, sf_dir, sim_result
    ):
        """seen_filter_kind='bloom' + keep_exact: the probabilistic
        structure changes, the crawl must not (exact set arbitrates)."""
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        cfg = CrawlConfig(seen_filter_kind="bloom", **_SMALL)
        res = RayCrawlEngine(sf_dir, cfg).run()
        _assert_log_matches(res.log, sim_result.rows)
        assert res.seen_keys == sim_result.seen_keys

    def test_bloom_scale_mode_without_exact_set(
        self, ray_session, sf_dir, sim_result
    ):
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        cfg = CrawlConfig(
            seen_filter_kind="bloom", seen_keep_exact=False, **_SMALL
        )
        res = RayCrawlEngine(sf_dir, cfg).run()
        assert res.log.num_rows >= 0.95 * len(sim_result.rows)


class TestLogSpool:
    def test_spill_keeps_conformance_exact(self, ray_session, sf_dir, sim_result):
        """With a tiny spill threshold the log lives almost entirely in
        parquet spool parts; content must still equal the oracle's
        exactly and driver RAM holds only the tail."""
        import os

        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        spool = tempfile.mkdtemp(prefix="topicrawler_spool_")
        try:
            cfg = CrawlConfig(log_spill_rows=25, log_spool_dir=spool, **_SMALL)
            eng = RayCrawlEngine(sf_dir, cfg)
            res = eng.run()
            assert len(eng._log_parts) > 3  # really spooled
            assert sum(b.num_rows for b in eng.log_batches) < 25  # bounded tail
            assert all(os.path.exists(p) for p in eng._log_parts)
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
            # lazy Dataset over the spool == the materialized table
            lazy = eng.log_dataset().to_pandas().sort_values("fetch_seq")
            assert len(lazy) == len(sim_result.rows)
        finally:
            shutil.rmtree(spool, ignore_errors=True)

    def test_checkpoint_resume_with_spool(self, ray_session, sf_dir, sim_result):
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        ckpt = tempfile.mkdtemp(prefix="topicrawler_ckpt_spool_")
        try:
            cfg = CrawlConfig(
                checkpoint_dir=ckpt,
                checkpoint_every_waves=20,
                log_spill_rows=25,
                **_SMALL,
            )
            eng = RayCrawlEngine(sf_dir, cfg)
            eng.bootstrap()
            while eng.wave < 45:
                if eng.run_wave() == 0:
                    break
            del eng
            eng2 = RayCrawlEngine(sf_dir, cfg)
            res = eng2.resume_run()
            _assert_log_matches(res.log, sim_result.rows)
            assert res.seen_keys == sim_result.seen_keys
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)


class TestPageStorePointReads:
    def test_point_reads_match_and_memory_bounded(self, sf_dir):
        """The row-group LRU path returns exactly the rows a full scan
        would, while keeping at most max_cached_row_groups decoded."""
        import pyarrow.parquet as pq

        from topicrawler_ray.sources.pages import pages_bucketed_dir, pages_path
        from topicrawler_ray.state.pagestore import PageStoreState, shard_of_url

        world = 2
        stores = [
            PageStoreState(pages_bucketed_dir(sf_dir), r, world, max_cached_row_groups=4)
            for r in range(world)
        ]
        t = pq.read_table(pages_path(sf_dir), columns=["url", "warc_ts", "html", "lang"])
        urls = t.column("url").to_pylist()
        expect = {
            u: (h, s, l)
            for u, s, h, l in zip(
                urls,
                t.column("warc_ts").cast("int64").to_pylist(),
                t.column("html").to_pylist(),
                t.column("lang").to_pylist(),
            )
        }
        # fetch every url through its owning shard, plus misses
        for u in urls:
            s = shard_of_url(u, world)
            got = stores[s].fetch([u, u + "/missing"])
            assert got == {u: expect[u]}, u
            assert len(stores[s]._rg_cache) <= 4
        # the other shard does not own it -> 404
        for u in urls[:20]:
            s = 1 - shard_of_url(u, world)
            assert stores[s].fetch([u]) == {}

    def test_index_is_url_column_only(self, sf_dir):
        """Warm-up builds the int->int index without decoding html."""
        from topicrawler_ray.sources.pages import pages_bucketed_dir
        from topicrawler_ray.state.pagestore import PageStoreState

        st = PageStoreState(pages_bucketed_dir(sf_dir), 0, 2)
        st._load()
        assert len(st._rg_cache) == 0  # nothing decoded yet
        assert all(isinstance(k, int) and isinstance(v, int) for k, v in st._index.items())


class TestArpaScorer:
    def test_arpa_scorer_conformance(self, ray_session, sf_dir):
        """Crawl with the ARPA-loaded LM (scorer='arpa') matches the
        sequential simulator using the same scorer - the reference's
        readFromArpa disk-artifact path driven end-to-end."""
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        cfg = CrawlConfig(scorer="arpa", max_waves=40, **_SMALL)
        res = RayCrawlEngine(sf_dir, cfg).run()
        sim = simulate_crawl(sf_dir, config=cfg)
        _assert_log_matches(res.log, sim.rows)
        assert res.seen_keys == sim.seen_keys


class TestDiskLMScorer:
    def test_disk_lm_crawl_matches_in_memory_kn(self, ray_session, sf_dir):
        """Crawl scored through the DISK-BACKED KN artifact
        (scorer='kneser_ney_disk': actors hold only the artifact path +
        a bounded bucket LRU) is log-identical to the in-memory KN
        crawl - the CountingStringLM Lucene-serving analog driven
        through the full engine."""
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        kw = dict(max_waves=40, **_SMALL)
        mem = RayCrawlEngine(sf_dir, CrawlConfig(scorer="kneser_ney", **kw)).run()
        disk = RayCrawlEngine(
            sf_dir, CrawlConfig(scorer="kneser_ney_disk", **kw)
        ).run()
        # field-wise compare (the raw float perp column is NaN for
        # robots/404 rows and NaN != NaN; perp_str carries the value)
        am, ad = mem.log.to_pylist(), disk.log.to_pylist()
        assert len(am) == len(ad)
        for x, y in zip(am, ad):
            for k in _LOG_FIELDS:
                assert x[k] == y[k], (x["fetch_seq"], k, x[k], y[k])
        assert disk.seen_keys == mem.seen_keys
        # and both match the sequential simulator on the same scorer
        sim = simulate_crawl(
            sf_dir, config=CrawlConfig(scorer="kneser_ney", **kw)
        )
        _assert_log_matches(disk.log, sim.rows)


class TestCrawlDelay:
    def test_parse_and_period(self):
        from topicrawler_ray.state.frontier import crawl_delay_period, parse_robots

        rules, delay = parse_robots(
            "User-agent: *\nDisallow: /x/\nCrawl-delay: 0.3\n"
        )
        assert rules == ["/x/"] and delay == 0.3
        assert crawl_delay_period(0.3) == 3
        assert crawl_delay_period(None) == 1
        assert crawl_delay_period(0) == 1
        # respectCrawlDelayUpToSeconds=180 clamp (cxml:31)
        assert crawl_delay_period(10_000) == 1800
        # other agents' delay ignored
        _, d2 = parse_robots("User-agent: bot\nCrawl-delay: 9\n")
        assert d2 is None

    def test_delayed_hosts_fetch_every_third_wave(self, ray_session, sf_dir, sim_result):
        """Fixture hosts with Crawl-delay 0.3 must show inter-fetch wave
        gaps >= 3 in BOTH the engine log and the oracle's."""
        from collections import defaultdict

        from topicrawler_ray.sources.pages import CRAWL_DELAY_HOST_MOD

        waves_by_host = defaultdict(list)
        for r in sim_result.rows:
            if not r["is_robots"]:
                waves_by_host[r["host"]].append(r["wave"])
        checked = 0
        for host, waves in waves_by_host.items():
            h = int(host.split("host")[1].split(".")[0])
            gaps = [b - a for a, b in zip(waves, waves[1:])]
            if h % CRAWL_DELAY_HOST_MOD == 2:
                if gaps:
                    checked += 1
                    assert min(gaps) >= 3, (host, gaps[:5])
        assert checked > 0, "no delayed host fetched twice - fixture too small"


class TestReleaseActors:
    def test_results_survive_actor_release(self, ray_session, sf_dir, sim_result):
        """release_actors (pipelines/crawl.py) kills the actor plane a
        cached engine would otherwise pin (4.0 reserved CPUs at the
        defaults, enough to deadlock a later near-full-width actor
        pool's read tasks); the materialized CrawlResult and the
        parquet-spool log_dataset() must keep working afterwards."""
        import ray

        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        eng = RayCrawlEngine(sf_dir, CrawlConfig(**_SMALL))
        res = eng.run()
        workers = list(eng.workers)
        eng.release_actors()
        assert eng.workers == [] and eng.frontier == [] and eng.stores == []
        # the killed actors are really gone (RayActorError on any call).
        # ray.kill is async - under load a probe dispatched immediately
        # after release can still be served, so poll until the kill
        # lands instead of asserting on the first call.
        import time

        deadline = time.monotonic() + 30
        while True:
            try:
                ray.get(workers[0].ping.remote())
            except Exception:
                break  # dead, as required
            assert time.monotonic() < deadline, "actor still alive 30s after release"
            time.sleep(0.2)
        # materialized results and the spool dataset still serve
        _assert_log_matches(res.log, sim_result.rows)
        assert res.seen_keys == sim_result.seen_keys
        n = eng.log_dataset().count()
        assert n == len(res.log)


class TestFrontierResidue:
    def test_capped_run_residue_matches_simulator(self, ray_session, sf_dir):
        """A wave-capped run's leftover frontier (dump_entries across
        shards) must hold exactly the simulator's residual entries —
        the frontier OBJECT itself certified, not just the fetch log."""
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        cfg = CrawlConfig(max_waves=40, **_SMALL)
        sim = simulate_crawl(sf_dir, config=cfg)
        assert sim.frontier_residue, "cap must leave residue for the test"
        eng = RayCrawlEngine(sf_dir, cfg)
        eng.run()
        got = [tuple(r.values()) for r in eng.dump_frontier().to_pylist()]
        eng.release_actors()
        assert got == sim.frontier_residue

    def test_residue_identical_under_disk_spill(self, ray_session, sf_dir):
        """dump_entries must read spilled overflow non-destructively:
        with a 4-entry head budget + disk spill the residue is the
        same set, and dumping twice gives the same answer (the spill
        files survive the first read)."""
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        spill = tempfile.mkdtemp(prefix="topicrawler_residue_spill_")
        try:
            cfg = CrawlConfig(
                max_waves=40,
                frontier_head_budget=4,
                frontier_spill_dir=spill,
                **_SMALL,
            )
            sim = simulate_crawl(sf_dir, config=cfg)
            eng = RayCrawlEngine(sf_dir, cfg)
            res = eng.run()
            assert sum(f["spilled"] for f in res.stats["frontier"]) > 0
            first = [tuple(r.values()) for r in eng.dump_frontier().to_pylist()]
            second = [tuple(r.values()) for r in eng.dump_frontier().to_pylist()]
            eng.release_actors()
            assert first == sim.frontier_residue
            assert second == first
        finally:
            shutil.rmtree(spill, ignore_errors=True)


class TestBreadthPolicy:
    def test_bfs_log_conforms_and_diverges(self, ray_session, sf_dir):
        """The breadth-policy engine crawl equals the breadth-policy
        simulator exactly AND genuinely differs from the decesive
        ordering (the policy switch has effect)."""
        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.oracles import _b_crawl_log_bfs
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine

        eng = RayCrawlEngine(sf_dir, CrawlConfig(policy="breadth"))
        res = eng.run()
        eng.release_actors()
        got = res.log.drop_columns(["perp"]).to_pandas()
        exp = _b_crawl_log_bfs(sf_dir).to_pandas()
        assert got.equals(exp)
        assert set(got["cost"].unique()) <= {1, 4, 64}

        eng2 = RayCrawlEngine(sf_dir, CrawlConfig())
        res2 = eng2.run()
        eng2.release_actors()
        dec = res2.log.drop_columns(["perp"]).to_pandas()
        assert len(dec) == len(got)
        assert (dec["url"] != got["url"]).any()


class TestPolicyGain:
    def test_two_policies_k_bounded(self, ray_session, sf_dir):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
        import __ray_entry__ as e

        t = {r["policy"]: r for r in e.queries()["policy_gain"](sf_dir).to_pylist()}
        assert set(t) == {"decesive", "breadth"}
        for r in t.values():
            assert 0 < r["n_fetches"] <= 100
            assert r["sum_perp_e6"] > 0
