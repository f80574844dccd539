"""Resumable partitioned Parquet export.

The reference writers roll 100MB files
(``SentenceWriter.java:109-115``); the Ray-native equivalent writes one
directory per key-range partition, atomically (tmp dir + rename), with a
manifest of completed partitions so a restarted run skips finished work
- the batch-pipeline meaning of "resumable from checkpoint with
per-partition lineage".

Layout::

    out_dir/
      part=0000/  *.parquet   (url-hash bucket 0)
      part=0001/  ...
      _MANIFEST.json          {partition: {"rows": n, "done": true}}
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pyarrow as pa

from ..functions.hashing import url_hash64


def _bucket_batch(batch: pa.Table, key_column: str, num_partitions: int) -> pa.Table:
    keys = batch.column(key_column).to_pylist()
    buckets = [url_hash64(str(k)) % num_partitions for k in keys]
    return batch.append_column("__part", pa.array(buckets, pa.int32()))


def write_partitioned(
    ds,
    out_dir: str,
    key_column: str = "url",
    num_partitions: int = 16,
) -> dict:
    """Write ``ds`` hash-partitioned by ``key_column``; skip partitions
    already marked done in the manifest. Returns the manifest."""
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    manifest: dict[str, dict] = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)

    todo = [
        p
        for p in range(num_partitions)
        if not manifest.get("part=%04d" % p, {}).get("done")
    ]
    if not todo:
        return manifest

    bucketed = ds.map_batches(
        lambda b: _bucket_batch(b, key_column, num_partitions), batch_format="pyarrow"
    )

    import pandas as pd

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["__part"].iloc[0])
        name = "part=%04d" % part
        if manifest.get(name, {}).get("done"):
            return pd.DataFrame({"part": [part], "rows": [0], "skipped": [True]})
        final = os.path.join(out_dir, name)
        tmp = tempfile.mkdtemp(dir=out_dir, prefix=".tmp_%s_" % name)
        try:
            out = group.drop(columns=["__part"])
            out.to_parquet(os.path.join(tmp, "data.parquet"), index=False)
            if os.path.isdir(final):
                shutil.rmtree(final)
            os.replace(tmp, final)
        except Exception:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        return pd.DataFrame({"part": [part], "rows": [len(group)], "skipped": [False]})

    results = bucketed.groupby("__part").map_groups(
        write_group, batch_format="pandas"
    ).take_all()
    for r in results:
        name = "part=%04d" % r["part"]
        if not r["skipped"]:
            manifest[name] = {"rows": int(r["rows"]), "done": True}
    # partitions with zero rows still count as done
    for p in range(num_partitions):
        manifest.setdefault("part=%04d" % p, {"rows": 0, "done": True})
    tmp_manifest = manifest_path + ".tmp"
    with open(tmp_manifest, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp_manifest, manifest_path)
    return manifest


def read_partitioned(out_dir: str):
    """Ray Dataset over the completed partitions of an export."""
    import ray.data

    import glob

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    paths = [
        f
        for name, meta in sorted(manifest.items())
        if meta.get("done") and meta.get("rows", 0) > 0
        for f in sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    ]
    from ..sources.pages import strip_schema_metadata

    return strip_schema_metadata(ray.data.read_parquet(paths))
