"""Engine configuration dataclasses (defaults mirror the reference).

Politeness budget per cxml:28-32, frontier limits per cxml:66-70; LM
defaults per ``lt.lm/.../util/Properties.java`` (order via README/eval
scripts; our fixtures default to order 3 for speed).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PolitenessConfig:
    delay_factor: float = 0.0  # cxml:29
    min_delay_ms: int = 100  # cxml:30
    max_delay_ms: int = 3000  # cxml:32
    respect_crawl_delay_up_to_seconds: int = 180  # cxml:31

    def delay_ms(self, fetch_duration_ms: float = 0.0) -> float:
        """Heritrix DispositionProcessor: delayFactor * duration clamped to
        [minDelay, maxDelay]; with delayFactor=0 this is min_delay_ms."""
        d = self.delay_factor * fetch_duration_ms
        return min(self.max_delay_ms, max(self.min_delay_ms, d))


@dataclass(frozen=True)
class CrawlConfig:
    order: int = 3
    scorer: str = "stupid_backoff"  # registry key: stupid_backoff | kneser_ney | laplace
    # frontier policy: "decesive" = reference DecesiveValuePrioritizer
    # semantics; "breadth" = accepted candidates flattened to
    # (NORMAL, 64) -> FIFO-within-politeness BFS baseline
    policy: str = "decesive"
    max_hops: int = 20  # cxml:26
    # transient-failure retry (cxml:66-67): a 50x fetch re-queues the
    # entry with retries+1 and snoozes its host queue retry_delay_waves
    # (retryDelaySeconds=90 -> 900 x 100ms wave slots); after
    # max_retries total attempts the entry is quarantined with a log row
    max_retries: int = 3  # cxml:66
    retry_delay_waves: int = 900  # cxml:67 (90s in 100ms politeness slots)
    # deterministic transient-fault injection for the fetch-sim: doc ids
    # divisible by fault_mod return 503 on their first fault_attempts
    # fetches (None = no faults - the default fetch-sim is fault-free)
    fault_mod: int | None = None
    fault_attempts: int = 1
    num_frontier_shards: int = 4
    num_seen_shards: int = 4  # standalone SeenShard pools (engine embeds seen in frontier)
    num_page_stores: int = 4
    num_workers: int = 4
    worker_num_cpus: float = 0.5
    seen_capacity_per_shard: int = 1 << 16
    seen_keep_exact: bool = True  # disable at 10^10 scale
    seen_filter_kind: str = "cuckoo"  # or "bloom" (north rule names both)
    frontier_head_budget: int | None = None  # queueTotalBudget analog (cxml:70)
    frontier_spill_dir: str | None = None  # overflow spills to disk when set
    max_waves: int = 100000
    max_domains: int | None = None  # TooManyDomainsDecideRule (off by default)
    # fused wave path: frontier shards fetch+process their own hosts'
    # pages inline (host-co-partitioned archive) when a wave picks at
    # most `inline_max` entries on that shard; wider waves fall back to
    # the worker pool.  Politeness waves are RPC-latency-bound, so this
    # collapses the wave critical path to one driver round trip.
    inline_process: bool = True
    inline_max: int = 64
    politeness: PolitenessConfig = field(default_factory=PolitenessConfig)
    checkpoint_dir: str | None = None
    checkpoint_every_waves: int = 50
    # crawl-log spooling: once this many rows accumulate in driver RAM
    # they are flushed to a parquet part file (the durable log); only
    # the current window stays in memory (VERDICT r1 item 6)
    log_spill_rows: int = 100_000
    log_spool_dir: str | None = None  # default: <checkpoint_dir>/log or a tmpdir

    @classmethod
    def sized(cls, num_cpus: int, **overrides) -> "CrawlConfig":
        """Scale shard/worker counts to the CPU budget (workers get ~60%
        of CPUs; state shards are cheap fractional actors)."""
        shards = max(2, min(16, num_cpus // 4))
        # inline mode fuses per-wave processing into the shards; the
        # worker pool only serves wide waves (seed floods), and every
        # extra actor process raises ambient RPC latency - keep it small
        workers = max(3, num_cpus // 4)
        base = dict(
            num_frontier_shards=shards,
            num_seen_shards=shards,
            num_page_stores=shards,
            num_workers=workers,
            worker_num_cpus=0.5,
        )
        base.update(overrides)
        return cls(**base)
