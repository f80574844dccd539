"""Resumable partitioned export + text-dir LM reader."""

import json
import os
import shutil
import tempfile

import pytest


class TestPartitionedExport:
    def test_write_read_roundtrip_and_resume(self, ray_session):
        import ray.data

        from topicrawler_ray.pipelines.export import (
            read_partitioned,
            write_partitioned,
        )

        out = tempfile.mkdtemp(prefix="topicrawler_export_")
        try:
            ds = ray.data.from_items(
                [{"url": "http://h%d/p%d" % (i % 5, i), "v": i} for i in range(200)]
            )
            manifest = write_partitioned(ds, out, num_partitions=8)
            assert sum(m["rows"] for m in manifest.values()) == 200
            back = read_partitioned(out).to_pandas()
            assert len(back) == 200
            assert sorted(back.v) == list(range(200))

            # resume: mark one partition missing, rerun -> only it rewrites
            with open(os.path.join(out, "_MANIFEST.json")) as f:
                m = json.load(f)
            victim = next(k for k, v in m.items() if v["rows"] > 0)
            m[victim]["done"] = False
            with open(os.path.join(out, "_MANIFEST.json"), "w") as f:
                json.dump(m, f)
            shutil.rmtree(os.path.join(out, victim))
            manifest2 = write_partitioned(ds, out, num_partitions=8)
            assert manifest2[victim]["done"]
            back2 = read_partitioned(out).to_pandas()
            assert sorted(back2.v) == list(range(200))
        finally:
            shutil.rmtree(out, ignore_errors=True)


class TestTextDirLM:
    def test_build_from_text_dir(self, ray_session):
        from topicrawler_ray.lm.train import build_lm_from_text_dir

        d = tempfile.mkdtemp(prefix="topicrawler_corpus_")
        try:
            with open(os.path.join(d, "a.txt"), "w") as f:
                f.write("the cat sat on the mat\nthe dog sat on the rug\n")
            with open(os.path.join(d, "b.txt"), "w") as f:
                f.write("a cat and a dog met\n")
            lm = build_lm_from_text_dir(d, order=2)
            assert lm.ngram_log10_prob(["the", "cat"]) > lm.ngram_log10_prob(
                ["the", "zzz"]
            )
        finally:
            shutil.rmtree(d, ignore_errors=True)
