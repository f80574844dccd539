"""Frontier spill stress: N URLs over H hosts through the sharded actor
plane with a small head budget + disk spill; asserts exact politeness
ordering per host and full drainage, reports ops/s + spill counters."""
import json, os, sys, tempfile, time
import ray
N = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
H = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
BUDGET = int(sys.argv[3]) if len(sys.argv) > 3 else 32
ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
sys.path.insert(0, "/root/repo")
from topicrawler_ray.state.frontier import FrontierEntry, make_frontier_actors, shard_of_host

shards = 8
spill = tempfile.mkdtemp(prefix="frontier_stress_")
frontier = make_frontier_actors(shards, head_budget=BUDGET, spill_dir=spill)
ray.get([f.has_work.remote() for f in frontier])
hosts = ["h%d.ex" % h for h in range(H)]
t0 = time.time()
ray.get([frontier[s].set_robots_many.remote(
    [(h, [], None) for h in hosts if shard_of_host(h, shards) == s]) for s in range(shards)])
# push in chunks, round-robin over hosts so per-host arrival is interleaved
CH = 100_000
pushed = 0
for base in range(0, N, CH):
    by_shard = {}
    for i in range(base, min(base + CH, N)):
        h = hosts[i % H]
        e = FrontierEntry(i % 4, (i * 7) % 1000, i, "http://%s/p%d" % (h, i))
        by_shard.setdefault(shard_of_host(h, shards), []).append(e)
    ray.get([frontier[s].push.remote(es) for s, es in by_shard.items()])
    pushed += min(base + CH, N) - base
t_push = time.time() - t0
# drain with pop_wave politeness loop
t0 = time.time()
popped = 0
order_per_host = {hosts[0]: [], hosts[1]: [], hosts[H // 2]: []}
while True:
    waves = ray.get([f.pop_wave.remote() for f in frontier])
    got = 0
    for picks, _rej, _wake in waves:
        got += len(picks)
        for e in picks:
            hh = e.url.split("/")[2]
            if hh in order_per_host:
                order_per_host[hh].append((e.directive, e.cost, e.seq))
    if got == 0:
        break
    popped += got
t_pop = time.time() - t0
stats = ray.get([f.stats.remote() for f in frontier])
spilled = sum(s["spilled"] for s in stats)
reloaded = sum(s["reloaded"] for s in stats)
assert popped == pushed, (popped, pushed)
for h, seq in order_per_host.items():
    assert seq == sorted(seq), "politeness order violated on %s" % h
    assert len(seq) >= N // H - 1
assert spilled > 0 and reloaded > 0, (spilled, reloaded)
print(json.dumps({
    "urls": pushed, "hosts": H, "head_budget": BUDGET, "shards": shards,
    "push_sec": round(t_push, 2), "pop_sec": round(t_pop, 2),
    "push_ops_per_s": round(pushed / t_push, 1),
    "pop_ops_per_s": round(popped / t_pop, 1),
    "spilled": spilled, "reloaded": reloaded,
    "order_exact": True, "drained": True,
}))
import shutil; shutil.rmtree(spill, ignore_errors=True)
ray.shutdown()
