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

    def test_lm_repl_subcommand(self):
        # StartLM.java:206-249 inspection loop: :i, :pn, :l, :q
        r = subprocess.run(
            [sys.executable, "-m", "topicrawler_ray.cli", "lm-repl",
             "--sf-dir", "/root/testdata/sf0.001", "--list-limit", "3"],
            input=":i\n:pn\nthe quick\n:q\n:l\n:q\n",
            capture_output=True,
            text=True,
            timeout=240,
            cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "Language Model Information" in r.stdout
        assert "1-grams:" in r.stdout
        assert "log10=" in r.stdout
        assert "truncated at 3" in r.stdout

    def test_predict_next_word(self):
        from topicrawler_ray.cli import predict_next_word
        from topicrawler_ray.lm.backoff import NgramCounts, StupidBackoffLM

        c = NgramCounts(2)
        c.add_sequence(["the", "cat", "sat"])
        c.add_sequence(["the", "cat", "ran"])
        c.add_sequence(["the", "dog", "sat"])
        lm = StupidBackoffLM(c)
        assert predict_next_word(lm, ["the"]) == "cat"

    def test_crawl_checkpoint_resume_cli(self):
        """Interrupted CLI crawl resumes from checkpoint to the same
        final log as an uninterrupted run."""
        import pyarrow.parquet as pq

        ck = tempfile.mkdtemp(prefix="cli_ck_")
        out1 = tempfile.mkdtemp(prefix="cli_out1_")
        out2 = tempfile.mkdtemp(prefix="cli_out2_")
        try:
            base = [
                "crawl", "--sf-dir", "/root/testdata/sf0.001",
                "--num-cpus", "4", "--checkpoint", ck,
            ]
            r1 = _run(base + ["--max-waves", "60"])  # partial (past ckpt 50)
            assert r1.returncode == 0, r1.stderr[-1500:]
            r2 = _run(base + ["--resume", "--out", out1], timeout=400)
            assert r2.returncode == 0, r2.stderr[-1500:]
            r3 = _run(
                [
                    "crawl", "--sf-dir", "/root/testdata/sf0.001",
                    "--num-cpus", "4", "--out", out2,
                ],
                timeout=400,
            )
            assert r3.returncode == 0, r3.stderr[-1500:]
            a = pq.read_table(out1 + "/crawl_log.parquet")
            b = pq.read_table(out2 + "/crawl_log.parquet")
            # Table.equals treats NaN != NaN (the perp column has NaNs for
            # robots/404 rows); compare serialized bytes instead
            import pyarrow.ipc as ipc

            def blob(t):
                import pyarrow as pa

                buf = pa.BufferOutputStream()
                w = ipc.new_stream(buf, t.schema)
                w.write_table(t)
                w.close()
                return buf.getvalue().to_pybytes()

            assert blob(a) == blob(b)
        finally:
            for d in (ck, out1, out2):
                shutil.rmtree(d, ignore_errors=True)


class TestDedupCli:
    def test_dedup_exact_cli(self):
        out_dir = tempfile.mkdtemp(prefix="cli_dedup_")
        try:
            r = _run(
                [
                    "dedup",
                    "--input", "/root/testdata/sf0.001/documents.parquet",
                    "--method", "exact",
                    "--out", os.path.join(out_dir, "o"),
                    "--num-cpus", "4",
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            import glob

            import pyarrow.parquet as pq

            files = glob.glob(os.path.join(out_dir, "o", "*.parquet"))
            assert files
            n = sum(pq.read_metadata(f).num_rows for f in files)
            assert n == 500  # all fixture docs are distinct
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestNgramIndexCli:
    def test_ngram_index_cli(self):
        out_dir = tempfile.mkdtemp(prefix="cli_idx_")
        try:
            r = _run(
                [
                    "ngram-index",
                    "--input", "/root/testdata/sf0.001/documents.parquet",
                    "--out", out_dir,
                    "--order", "2",
                    "--num-cpus", "4",
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            from topicrawler_ray.lm.build import read_sum_ngrams

            stats = read_sum_ngrams(os.path.join(out_dir, "__sum_ngrams__"))
            assert stats["max_n"] == 2 and stats["S"][1] > 0
            import glob

            assert glob.glob(os.path.join(out_dir, "ngram_index", "*.parquet"))
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)


class TestCurateCLI:
    def test_curate_writes_parquet(self, sf_dir):
        import json
        import subprocess
        import sys
        import tempfile

        out = tempfile.mkdtemp(prefix="cli_curate_")
        r = subprocess.run(
            [
                sys.executable, "-m", "topicrawler_ray.cli", "curate",
                "--input", sf_dir + "/documents.parquet",
                "--out", out, "--num-cpus", "4", "--concurrency", "1",
            ],
            capture_output=True, text=True, timeout=280,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        summary = json.loads(r.stdout.strip().splitlines()[-1])
        assert summary["rows_curated"] > 0
        assert summary["rows_curated"] <= summary["rows_in"]


class TestSnapshotCli:
    def test_snapshot_diff_and_schedule(self):
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = tempfile.mkdtemp(prefix="cli_snap_")
        try:
            old = pa.table(
                {
                    "url": ["http://h.example/a", "http://h.example/b"],
                    "text": ["one", "two"],
                }
            )
            new = pa.table(
                {
                    "url": ["http://h.example/b", "http://h.example/c"],
                    "text": ["two CHANGED", "three"],
                }
            )
            pq.write_table(old, os.path.join(tmp, "old.parquet"))
            pq.write_table(new, os.path.join(tmp, "new.parquet"))
            r = _run(
                [
                    "snapshot",
                    "--old", os.path.join(tmp, "old.parquet"),
                    "--new", os.path.join(tmp, "new.parquet"),
                    "--num-cpus", "4",
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            res = json.loads(r.stdout.strip().splitlines()[-1])
            assert res["status"] == {"gone": 1, "changed": 1, "new": 1}

            out = os.path.join(tmp, "sched")
            r = _run(
                [
                    "snapshot",
                    "--old", os.path.join(tmp, "old.parquet"),
                    "--new", os.path.join(tmp, "new.parquet"),
                    "--schedule",
                    "--out", out,
                    "--num-cpus", "4",
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            import glob

            files = glob.glob(os.path.join(out, "*.parquet"))
            rows = pa.concat_tables([pq.read_table(f) for f in files]).to_pylist()
            assert len(rows) == 1
            row = rows[0]
            assert row["host"] == "h.example"
            # 1 changed / 0 same -> rate 1e6 -> fast tier
            assert row["change_rate_e6"] == 1000000
            assert row["revisit_tier"] == "fast"
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestGraphCommand:
    def test_graph_metrics_over_fixture_pages(self):
        import pyarrow.parquet as pq

        from topicrawler_ray.sources.pages import pages_path

        tmp = tempfile.mkdtemp(prefix="cli_graph_")
        try:
            src = pages_path("/root/testdata/sf0.001")
            out = os.path.join(tmp, "tri")
            r = _run(
                [
                    "graph",
                    "--input", src,
                    "--metric", "triangles",
                    "--out", out,
                    "--num-cpus", "4",
                ]
            )
            assert r.returncode == 0, r.stderr[-2000:]
            info = json.loads(r.stdout.strip().splitlines()[-1])
            assert info["hosts"] > 0
            t = pq.read_table(out)
            assert set(t.column_names) == {
                "host", "degree", "triangles", "wedges", "cc_e6"
            }
            assert t.num_rows == info["hosts"]

            r2 = _run(
                [
                    "graph",
                    "--input", src,
                    "--metric", "kcore",
                    "--k", "3",
                    "--num-cpus", "4",
                ]
            )
            assert r2.returncode == 0, r2.stderr[-2000:]
            info2 = json.loads(r2.stdout.strip().splitlines()[-1])
            assert info2["metric"] == "kcore" and info2["hosts"] > 0
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
