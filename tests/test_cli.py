"""CLI surface tests (subprocess - the ray-job-submit entry points)."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "topicrawler_ray.cli"] + args,
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )


class TestCli:
    def test_crawl_subcommand(self):
        out_dir = tempfile.mkdtemp(prefix="cli_crawl_")
        try:
            r = _run(
                [
                    "crawl",
                    "--sf-dir",
                    "/root/testdata/sf0.001",
                    "--max-waves",
                    "15",
                    "--num-cpus",
                    "4",
                    "--out",
                    out_dir,
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            stats = json.loads(r.stdout.strip().splitlines()[-1])
            assert stats["fetches"] > 0
            assert os.path.exists(os.path.join(out_dir, "crawl_log.parquet"))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    def test_segment_subcommand(self):
        with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
            f.write("One two three. Four five six.\n")
            path = f.name
        try:
            r = _run(["segment", "--input", path, "--num-cpus", "4"])
            assert r.returncode == 0, r.stderr[-2000:]
            out = json.loads(r.stdout.strip().splitlines()[-1])
            assert out["sentences"] == 2
        finally:
            os.unlink(path)

    def test_lm_subcommand(self):
        r = _run(
            [
                "lm",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--text",
                "the fast key order sort.",
            ]
        )
        assert r.returncode == 0, r.stderr[-2000:]
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["perplexity"] > 1
        assert len(out["ngrams"]) > 0
        assert all(n["log10p"] <= 0 for n in out["ngrams"])
