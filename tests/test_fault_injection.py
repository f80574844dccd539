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
