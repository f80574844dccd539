"""Full-scale crawl conformance: run the distributed engine AND the
pure-python oracle to completion on a scale dir and diff every field.

Usage: python scripts/full_conformance.py [/root/testdata/sf0.1] [max_waves]
(~1min at sf0.1 uncapped on 32 cpus)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MAX_WAVES = int(sys.argv[2]) if len(sys.argv) > 2 else 100000

ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
         include_dashboard=False, logging_level="ERROR")

from topicrawler_ray.config import CrawlConfig
from topicrawler_ray.pipelines.crawl import RayCrawlEngine
from topicrawler_ray.pipelines.simulate import simulate_crawl

cfg = CrawlConfig.sized(int(os.environ.get("RAY_GRAFT_CPUS", "32")), max_waves=MAX_WAVES)
t0 = time.time()
res = RayCrawlEngine(SF, cfg).run()
t_eng = time.time() - t0
t0 = time.time()
sim = simulate_crawl(SF, config=cfg)
t_sim = time.time() - t0

FIELDS = (
    "fetch_seq", "wave", "url", "host", "directive", "cost", "seq",
    "status", "is_robots", "perp_str", "n_outlinks", "via", "perp_via_str",
)
log = res.log.to_pylist()
ok = len(log) == len(sim.rows)
first_diff = None
for i, (a, b) in enumerate(zip(log, sim.rows)):
    for k in FIELDS:
        if a[k] != b[k]:
            ok = False
            first_diff = (i, k, a[k], b[k])
            break
    if first_diff:
        break
print(
    "sf=%s fetches=%d waves=%d engine=%.1fs (%.0f pages/s) sim=%.1fs"
    % (SF, len(log), res.stats["waves"], t_eng, len(log) / t_eng, t_sim)
)
print("log equal:", ok, "seen equal:", res.seen_keys == sim.seen_keys)
if first_diff:
    print("FIRST DIFF:", first_diff)
ray.shutdown()
sys.exit(0 if ok and res.seen_keys == sim.seen_keys else 1)
