"""Curation-chain scaling probe: same job at two parallelism levels.

The headline ``bench.py --scaling`` times the whole suite at the
default bench volume (replicate=8, ~40k docs at sf0.1), where the
curation chain finishes in ~2.5 s and fixed setup (actor-pool spawn,
DHT shard spawn, input materialization) dominates — that measures
constants, not scaling.  This probe replicates the corpus further
(default x64, ~320k distinct-ish docs with the same 25% duplicate
rate) so the timed region is dominated by volume-linear work, then
runs fresh ``ray.init(num_cpus=L)`` subprocesses at L and 4L
(default 2 -> 8: both legs under this box's ~16-core memory-bandwidth
knee; see BASELINE.md) alternating ``--repeats`` times, and reports
best-per-level docs/s plus scaling efficiency.

Usage::

    python scripts/curation_scaling.py [--lo 2] [--repeats 3] [--replicate 64]

Prints one JSON line (the SCALING artifact row for the curation
chain).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
import ray

level = int(sys.argv[1])
replicate = int(sys.argv[2])
sf_dir = sys.argv[3]

ray.init(address="local", num_cpus=level, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, %(repo)r)
import bench

r = bench.bench_curation(sf_dir, level, replicate=replicate)
import pyarrow.parquet as pq
n_in = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
print(json.dumps({"cpus": level, "sec": r["sec"], "rows_out": r["rows"],
                  "docs_in": n_in * replicate,
                  "docs_per_s": r["docs_per_s"]}))
ray.shutdown()
"""


def run_level(level: int, replicate: int, sf_dir: str) -> dict:
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD % {"repo": REPO},
             str(level), str(replicate), sf_dir],
            capture_output=True, text=True, check=True, cwd=REPO,
        ).stdout
    except subprocess.CalledProcessError as e:
        sys.stderr.write(e.stderr or "")
        raise
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lo", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--replicate", type=int, default=64)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    hi = args.lo * 4
    runs_lo, runs_hi = [], []
    for _ in range(args.repeats):  # alternate: ambient noise hits both
        runs_lo.append(run_level(args.lo, args.replicate, args.sf_dir))
        runs_hi.append(run_level(hi, args.replicate, args.sf_dir))
    best_lo = max(r["docs_per_s"] for r in runs_lo)
    best_hi = max(r["docs_per_s"] for r in runs_hi)
    print(json.dumps({
        "metric": "curation chain scaling efficiency %d->%d cpus" % (args.lo, hi),
        "value": round((best_hi / best_lo) / (hi / args.lo), 3),
        "unit": "efficiency",
        "docs_per_s_%d" % args.lo: round(best_lo, 1),
        "docs_per_s_%d" % hi: round(best_hi, 1),
        "docs_in": runs_lo[0]["docs_in"],
        "replicate": args.replicate,
        "runs_%d" % args.lo: [round(r["docs_per_s"], 1) for r in runs_lo],
        "runs_%d" % hi: [round(r["docs_per_s"], 1) for r in runs_hi],
    }))


if __name__ == "__main__":
    main()
