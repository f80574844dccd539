"""Data-plane fault injection: SIGKILL a scorer actor mid-run and
assert the pipeline still produces exactly the baseline output.

Ray Data actor pools restart failed workers and retry their in-flight
tasks; this pins that property for the flagship extract->score stage
(the 256-node story: worker processes WILL die mid-crawl)."""

import os
import signal
import threading
import time

import pytest


def _pipeline(sf_dir, lm_ref, rep=6):
    import ray.data

    from topicrawler_ray.sources.pages import pages_path
    from topicrawler_ray.stages.extract import extract_batch
    from topicrawler_ray.stages.score import PerplexityScorer

    ds = ray.data.read_parquet(
        [pages_path(sf_dir)] * rep,
        columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=24,
    )
    ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"lm_ref": lm_ref},
        batch_format="pyarrow",
        batch_size=32,
        concurrency=2,
    )
    return ds.select_columns(["url", "perp_str"])


def _scorer_actors():
    import ray

    out = {}
    for aid, info in ray._private.state.actors().items():
        if "PerplexityScorer" in info.get("ActorClassName", "") and info.get(
            "State"
        ) == "ALIVE":
            out[aid] = info.get("Pid")
    return out


class TestFrontierShardDeath:
    def test_sigkill_shard_then_checkpoint_resume_exact(self, ray_session, sf_dir):
        """Node-loss drill for the STATEFUL plane: SIGKILL a frontier
        shard's worker process mid-crawl. The shard state dies with the
        process (by design - state is checkpointed, not replicated); a
        fresh engine resuming from the last checkpoint must reproduce
        the oracle crawl exactly."""
        import shutil
        import tempfile

        import ray as _ray

        from topicrawler_ray.config import CrawlConfig
        from topicrawler_ray.pipelines.crawl import RayCrawlEngine
        from topicrawler_ray.pipelines.simulate import simulate_crawl

        sim = simulate_crawl(sf_dir)
        ckpt = tempfile.mkdtemp(prefix="topicrawler_ckpt_kill_")
        try:
            cfg = CrawlConfig(
                checkpoint_dir=ckpt,
                checkpoint_every_waves=10,
                num_frontier_shards=2,
                num_seen_shards=2,
                num_page_stores=2,
                num_workers=3,
                worker_num_cpus=0.5,
            )
            eng = RayCrawlEngine(sf_dir, cfg)
            eng.bootstrap()
            while eng.wave < 25:
                if eng.run_wave() == 0:
                    break
            # SIGKILL one shard's process: harsher than del (no clean
            # teardown; in-memory frontier/seen state is simply gone)
            victim = eng.frontier[0]
            pid = None
            for _aid, info in _ray._private.state.actors().items():
                if info.get("ActorID") == victim._actor_id.hex() and info.get(
                    "State"
                ) == "ALIVE":
                    pid = info.get("Pid")
            if pid:
                os.kill(pid, signal.SIGKILL)
                time.sleep(0.5)
            del eng

            eng2 = RayCrawlEngine(sf_dir, cfg)
            res = eng2.resume_run()
            assert res.log.num_rows == len(sim.rows)
            got = res.log.to_pylist()
            for a, b in zip(got, sim.rows):
                assert a["url"] == b["url"] and a["fetch_seq"] == b["fetch_seq"]
            assert res.seen_keys == sim.seen_keys
        finally:
            shutil.rmtree(ckpt, ignore_errors=True)


class TestScorerActorDeath:
    def test_sigkill_mid_run_output_identical(self, ray_session, sf_dir):
        from topicrawler_ray.lm.train import topic_lm_ref

        lm_ref = topic_lm_ref(sf_dir)
        baseline = sorted(
            (r["url"], r["perp_str"]) for r in _pipeline(sf_dir, lm_ref).take_all()
        )
        assert baseline

        pre_existing = set(_scorer_actors())
        killed = []

        def killer():
            deadline = time.time() + 30
            while time.time() < deadline and not killed:
                for aid, pid in _scorer_actors().items():
                    if aid not in pre_existing and pid:
                        try:
                            os.kill(pid, signal.SIGKILL)
                        except ProcessLookupError:
                            continue
                        killed.append((aid, pid))
                        return
                time.sleep(0.02)

        th = threading.Thread(target=killer)
        th.start()
        got = sorted(
            (r["url"], r["perp_str"]) for r in _pipeline(sf_dir, lm_ref).take_all()
        )
        th.join(timeout=5)
        if not killed:
            pytest.skip("run finished before a fresh scorer actor could be killed")
        assert got == baseline
