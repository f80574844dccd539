"""Sharded URL frontier with per-host priority queues, politeness waves
and a robots-rules cache.

Ray-native equivalent of Heritrix ``BdbFrontier`` + per-host queues with
``HighestUriQueuePrecedencePolicy`` (cxml:458-462) and
``PreconditionEnforcer`` robots handling (cxml:267).  The DETERMINISTIC
SCHEDULING SPEC this engine (and its pure-python conformance oracle)
implements:

* entries are per-host heaps ordered by ``(directive, cost, seq)`` -
  ``seq`` is the global candidate-insertion sequence (deterministic
  tiebreak; reference order emerges from 25 racing toe threads, our spec
  is the race-free reading of the same priorities);
* one *wave* == one politeness slot (delayFactor=0 -> min_delay_ms=100ms
  uniform for every host, cxml:28-32): in each wave every host with a
  non-empty queue yields exactly ONE fetch;
* before a host's first page fetch, the host's ``/robots.txt`` is fetched
  as a prerequisite occupying that host's wave slot (directive HIGHEST=0,
  cost 1 - ``getPrecedenceCost`` for HIGHEST);
* entries whose path is disallowed by the host's robots rules are
  discarded at pop time WITHOUT consuming the politeness slot (Heritrix
  never issues a network fetch for them);
* the global fetch order within a wave sorts the per-host picks by
  ``(directive, cost, seq)``.

Sharding: ``host_hash % num_shards``; a shard owns all state for its
hosts (queues + politeness + robots rules), so pops and robots checks
are shard-local.  Mega-host note: per-host politeness caps each host at
one fetch per wave regardless of queue size, so a skewed host bounds
crawl *length*, not shard *throughput*; host-salting would only spread
storage, and heaps are already O(log n) - documented tradeoff.
"""

from __future__ import annotations

import heapq
import pickle
from dataclasses import dataclass, field

from ..functions.hashing import url_hash64
from ..functions.urls import host_of_url, path_of_url
from .seen import SeenShardState


@dataclass(order=True)
class FrontierEntry:
    directive: int
    cost: int
    seq: int
    url: str = field(compare=False)
    via: str = field(compare=False, default="")
    perp_via_str: str = field(compare=False, default="")
    is_robots: bool = field(compare=False, default=False)
    is_seed: bool = field(compare=False, default=False)
    hops: int = field(compare=False, default=0)  # link hops from seed (cxml:26)
    retries: int = field(compare=False, default=0)  # transient attempts so far (cxml:66)


def parse_robots(body: str) -> tuple[list[str], float | None]:
    """Minimal robots.txt: collect ``Disallow:`` path prefixes and the
    ``Crawl-delay`` (seconds) under ``User-agent: *`` (empty Disallow ==
    allow all; missing/invalid Crawl-delay -> None)."""
    rules: list[str] = []
    delay: float | None = None
    active = False
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            active = val == "*"
        elif key == "disallow" and active and val:
            rules.append(val)
        elif key == "crawl-delay" and active:
            try:
                delay = float(val)
            except ValueError:
                pass
    return rules, delay


RESPECT_CRAWL_DELAY_UP_TO_S = 180  # cxml:31 respectCrawlDelayUpToSeconds
MIN_DELAY_MS = 100  # cxml:30 - one wave == one 100ms politeness slot


def crawl_delay_period(delay_s: float | None) -> int:
    """A host's politeness period in WAVES: the robots Crawl-delay
    (clamped to respectCrawlDelayUpToSeconds, cxml:31) expressed in
    100ms wave slots; no/zero delay -> 1 (every wave eligible)."""
    import math

    if not delay_s or delay_s <= 0:
        return 1
    return max(1, math.ceil(min(delay_s, RESPECT_CRAWL_DELAY_UP_TO_S) * 1000 / MIN_DELAY_MS))


class RobotsCache:
    """Per-host parsed robots rules (None = not fetched yet)."""

    def __init__(self):
        self._rules: dict[str, list[str] | None] = {}
        self._requested: set[str] = set()
        self._delays: dict[str, float | None] = {}

    def known(self, host: str) -> bool:
        return self._rules.get(host) is not None

    def request_once(self, host: str) -> bool:
        """True exactly once per host: caller should schedule the fetch."""
        if host in self._requested:
            return False
        self._requested.add(host)
        return True

    def set_rules(self, host: str, rules: list[str], delay: float | None = None) -> None:
        self._rules[host] = rules
        self._delays[host] = delay

    def period(self, host: str) -> int:
        """Politeness period in waves (robots Crawl-delay honored)."""
        return crawl_delay_period(self._delays.get(host))

    def allowed(self, host: str, path: str) -> bool:
        rules = self._rules.get(host)
        if not rules:
            return True
        return not any(path.startswith(prefix) for prefix in rules)


class FrontierShardState:
    """One shard: heaps + robots + URL-seen for its hosts.

    The seen set lives IN the frontier shard (keyed by the same host
    hash) so scheduling a wave's candidates is a single fire-and-forget
    actor call per shard: the driver never blocks on dedup (the per-actor
    call ordering guarantees the next ``pop_wave`` observes the pushes).
    """

    def __init__(
        self,
        seen_capacity: int = 1 << 16,
        seen_keep_exact: bool = True,
        head_budget: int | None = None,
        spill_dir: str | None = None,
        seen_filter_kind: str = "cuckoo",
    ):
        self.queues: dict[str, list[tuple]] = {}
        self.robots = RobotsCache()
        self.seen = SeenShardState(seen_capacity, seen_keep_exact, seen_filter_kind)
        self.n_pushed = 0
        self.n_popped = 0
        self.n_robots_rejected = 0
        self.n_dup = 0
        # Heritrix queueTotalBudget analog (cxml:70): keep only the best
        # `head_budget` entries per host in the heap; the overflow spills
        # (to disk when `spill_dir` is set, else an in-memory run).  Pop
        # order is EXACTLY preserved: the heap only holds entries strictly
        # below the host's spill floor; arrivals at/above the floor go to
        # the overflow, which is re-sorted and reloaded when the heap
        # drains.
        self.head_budget = head_budget
        self.spill_dir = spill_dir
        self._spill_floor: dict[str, tuple] = {}  # host -> min spilled key
        self._overflow_mem: dict[str, list[tuple]] = {}
        self._overflow_count: dict[str, int] = {}
        self.n_spilled = 0
        self.n_reloaded = 0
        # Crawl-delay politeness: host -> first wave it may fetch again
        self.next_allowed: dict[str, int] = {}
        self._auto_wave = 0  # fallback clock when pop_wave(None) is used
        # runtime attachments for the fused wave path (never snapshotted):
        # a CrawlProcessor + a host-co-partitioned PageStoreState let the
        # shard fetch-and-process its own hosts' pages INLINE, collapsing
        # the wave critical path to one driver round trip.  Politeness
        # waves are RPC-latency-bound (a handful of pages per wave), so
        # co-locating frontier state, robots rules and page point-reads
        # per host partition is the scale-correct design, not a shortcut.
        self.processor = None
        self.page_reader = None

    # -- spill helpers -----------------------------------------------------
    def _spill_path(self, host: str) -> str:
        import os

        os.makedirs(self.spill_dir, exist_ok=True)
        return "%s/%s.spill.pkl" % (self.spill_dir, url_hash64("spill:" + host))

    def _overflow_append(self, host: str, rows: list[tuple]) -> None:
        if not rows:
            return
        if self.spill_dir:
            # append-only: one pickle frame per spill event.  Rewriting
            # the whole file per append is O(spilled^2) per host - at a
            # 10^10-URL frontier the overflow runs are exactly the hot
            # files.  The reader consumes frames until EOF (and still
            # reads pre-round-5 single-frame files).
            with open(self._spill_path(host), "ab") as f:
                pickle.dump(rows, f)
        else:
            self._overflow_mem.setdefault(host, []).extend(rows)
        self._overflow_count[host] = self._overflow_count.get(host, 0) + len(rows)
        self.n_spilled += len(rows)

    def _overflow_take_all(self, host: str) -> list[tuple]:
        if self.spill_dir:
            import os

            path = self._spill_path(host)
            if os.path.exists(path):
                rows: list[tuple] = []
                with open(path, "rb") as f:
                    while True:
                        try:
                            rows.extend(pickle.load(f))
                        except EOFError:
                            break
                os.remove(path)
            else:
                # no file (e.g. restored from a checkpoint written before
                # spill-to-disk was configured): fall back to any
                # in-memory run and ALWAYS clear the count below, else
                # the phantom count keeps has_work() true forever
                rows = self._overflow_mem.pop(host, [])
        else:
            rows = self._overflow_mem.pop(host, [])
        self._overflow_count.pop(host, None)
        return rows

    def _maybe_spill(self, host: str) -> None:
        """Enforce the head budget after a push."""
        q = self.queues[host]
        b = self.head_budget
        if b is None or len(q) <= b:
            return
        q.sort()
        keep, spill = q[:b], q[b:]
        self.queues[host] = keep
        self._spill_floor[host] = spill[0][:3]
        self._overflow_append(host, spill)

    def _maybe_reload(self, host: str) -> None:
        """Refill an empty heap from the overflow run."""
        if self.queues.get(host) or not self._overflow_count.get(host):
            return
        rows = self._overflow_take_all(host)
        # overflow is empty either way now: clear the floor so new
        # arrivals enter the heap instead of spilling to a dead run
        self._spill_floor.pop(host, None)
        if not rows:
            return
        rows.sort()
        b = self.head_budget
        self.n_reloaded += len(rows)
        if b is not None and len(rows) > b:
            keep, spill = rows[:b], rows[b:]
            self.queues[host] = keep
            self._spill_floor[host] = spill[0][:3]
            self._overflow_append(host, spill)
            self.n_reloaded -= len(spill)  # those went straight back
            self.n_spilled -= len(spill)
        else:
            self.queues[host] = rows
        heapq.heapify(self.queues[host])

    # -- mutation ----------------------------------------------------------
    def push(self, entries: list[FrontierEntry]) -> None:
        for e in entries:
            host = host_of_url(e.url)
            row = (e.directive, e.cost, e.seq, e.url, e.via, e.perp_via_str, e.is_seed, e.hops, e.retries)
            floor = self._spill_floor.get(host)
            if floor is not None and row[:3] >= floor:
                # at/above the spill floor: must join the overflow so the
                # heap invariant (heap < floor <= overflow) holds
                self._overflow_append(host, [row])
            else:
                heapq.heappush(self.queues.setdefault(host, []), row)
                if self.head_budget is not None:
                    self._maybe_spill(host)
            self.n_pushed += 1

    def set_robots(self, host: str, rules: list[str], delay: float | None = None) -> None:
        self.robots.set_rules(host, rules, delay)

    def push_if_new(self, entries: list[FrontierEntry]) -> int:
        """URL-seen test-and-add then push, in the given (seq) order.
        Returns the number actually scheduled (duplicates dropped)."""
        fresh = 0
        for e in entries:
            if not self.seen.test_and_add([url_hash64(e.url)])[0]:
                self.n_dup += 1
                continue
            self.push([e])
            fresh += 1
        return fresh

    def exact_seen_keys(self) -> list[int]:
        return sorted(self.seen.exact)

    # -- transient-retry re-queue (cxml:66-67) -----------------------------
    def requeue_retry(self, e: FrontierEntry, wave_no: int,
                      retry_delay_waves: int) -> None:
        """Re-enqueue a transiently-failed entry with ``retries + 1``
        (same directive/cost/seq, so it stays at its heap position) and
        snooze its host queue to ``wave_no + retry_delay_waves`` - the
        Heritrix queue-snooze on retryable failures (maxRetries /
        retryDelaySeconds, cxml:66-67).  Bypasses the seen filter: the
        url was marked seen at its original push."""
        import dataclasses

        self.push([dataclasses.replace(e, retries=e.retries + 1)])
        self.next_allowed[host_of_url(e.url)] = wave_no + retry_delay_waves

    # -- fused pop+process (inline wave path) ------------------------------
    def _process_local(self, items: list[tuple[int, str, bool, int]]) -> list:
        """Fetch this shard's pages from its host-bucket partition and run
        the pure per-fetch processor - byte-identical to the worker path
        (same CrawlProcessor code), zero RPC."""
        pages = self.page_reader.fetch([item[1] for item in items])
        return [
            self.processor.process(pos, url, rob, pages.get(url), retries)
            for pos, url, rob, retries in items
        ]

    def pop_and_process(self, wave_no: int, inline_max: int,
                        max_retries: int = 3, retry_delay_waves: int = 900):
        """One politeness slot AND its processing in a single actor call.

        Returns ``(picked, results | None, rejected, wake)`` - results
        are positionally aligned with ``picked`` when the shard processed
        inline (pick count <= inline_max and a processor is attached);
        ``None`` means the caller must process the entries via the worker
        pool (wide waves keep their many-worker parallelism).  Robots
        responses for this shard's own hosts are applied locally - in the
        classic path the driver routes them back to this same shard
        anyway (a host is only ever popped by its owner).  Transiently
        failed picks (50x) are re-queued locally with ``retries + 1``
        and EXCLUDED from the returned wave (they emit no log row unless
        retries are exhausted); the returned wake is recomputed after
        any snooze."""
        from ..stages.crawlworker import is_transient_status

        picked, rejected, wake = self.pop_wave(wave_no)
        if not picked or self.processor is None or len(picked) > inline_max:
            return picked, None, rejected, wake
        items = [(i, e.url, e.is_robots, e.retries) for i, e in enumerate(picked)]
        results = self._process_local(items)
        keep_p: list[FrontierEntry] = []
        keep_r: list = []
        requeued = False
        for e, r in zip(picked, results):
            if r.is_robots:
                rules, delay = (
                    r.robots_rules if r.robots_rules is not None else ([], None)
                )
                self.set_robots(host_of_url(r.url), rules, delay)
            if (
                is_transient_status(r.status)
                and e.retries + 1 < max_retries
            ):
                self.requeue_retry(e, wave_no, retry_delay_waves)
                requeued = True
                continue  # no log row; slot was consumed
            keep_p.append(e)
            keep_r.append(r)
        if requeued:
            wake = self.wake_wave()
        return keep_p, keep_r, rejected, wake

    # -- shard-local drain (single-active-shard fast path) -----------------
    def drain(
        self,
        picked: list[FrontierEntry],
        worker,
        siblings: list,
        my_index: int,
        next_seq: int,
        wave_no: int,
        fetch_seq: int,
        max_hops: int,
        budget: int = 2000,
        first_results: list | None = None,
        max_retries: int = 3,
        retry_delay_waves: int = 900,
        policy: str = "decesive",
    ) -> dict:
        """Run the wave loop locally while this shard is the ONLY active
        one (the politeness tail: one mega-host fetching one page per
        slot would otherwise cost 3 driver round trips per wave).

        Semantics are IDENTICAL to the driver loop: same wave sort, seq
        assignment in candidate-proposal order, push_if_new routing (the
        sibling call is an ordered actor RPC).  The drain stops the
        moment any sibling accepts a NEW entry (that shard's hosts must
        join the next wave), when the budget is exhausted, or when the
        frontier empties.

        Returns {log_rows, next_seq, wave_no, fetch_seq, n_rejected,
        n_hops_rejected, finished}.
        """
        import ray

        from ..stages import prioritize as prio
        from ..stages.crawlworker import is_transient_status

        log_rows: list[tuple] = []
        n_rejected = 0
        n_hops_rejected = 0
        finished = False
        while True:
            if first_results is not None:
                # the caller's pop_and_process already processed this
                # wave's picks (aligned positionally): joint-sort the
                # pairs instead of re-fetching
                pairs = sorted(
                    zip(picked, first_results),
                    key=lambda p: (p[0].directive, p[0].cost, p[0].seq, p[0].url),
                )
                picked = [p[0] for p in pairs]
                results = [p[1] for p in pairs]
                for i, r in enumerate(results):
                    r.pos = i
                first_results = None
            else:
                picked.sort(key=lambda e: (e.directive, e.cost, e.seq, e.url))
                items = [(i, e.url, e.is_robots, e.retries) for i, e in enumerate(picked)]
                if self.processor is not None:
                    results = self._process_local(items)
                else:
                    results = ray.get(worker.process_batch.remote(items))
                results.sort(key=lambda r: r.pos)
            for r in results:
                if r.is_robots:
                    rules, delay = (
                        r.robots_rules if r.robots_rules is not None else ([], None)
                    )
                    self.set_robots(host_of_url(r.url), rules, delay)
            # transient-retry re-queue (no log row while retries remain;
            # the slot was consumed, the host queue is snoozed)
            keep_p: list[FrontierEntry] = []
            keep_r: list = []
            for r in results:
                e = picked[r.pos]
                if is_transient_status(r.status) and e.retries + 1 < max_retries:
                    self.requeue_retry(e, wave_no, retry_delay_waves)
                    continue
                keep_p.append(e)
                keep_r.append(r)
            if len(keep_p) != len(picked):
                picked, results = keep_p, keep_r
                for i, r in enumerate(results):
                    r.pos = i
            # candidates in proposal order
            to_mine: list[FrontierEntry] = []
            by_sibling: dict[int, list[FrontierEntry]] = {}
            sibling_order: list[int] = []
            for r in results:
                if r.is_robots or r.status != 200:
                    continue
                parent_hops = picked[r.pos].hops
                for link in r.outlinks:
                    if parent_hops + 1 > max_hops:
                        n_hops_rejected += 1
                        continue
                    a = prio.schedule(float(r.perp_str))
                    if a.directive < 0:
                        n_rejected += 1
                        continue
                    p_dir, p_cost = prio.apply_policy(
                        a.directive, a.cost, policy
                    )
                    e = FrontierEntry(
                        p_dir, p_cost, next_seq, link, r.url, r.perp_str,
                        hops=parent_hops + 1,
                    )
                    next_seq += 1
                    s = shard_of_host(host_of_url(link), len(siblings))
                    if s == my_index:
                        to_mine.append(e)
                    else:
                        if s not in by_sibling:
                            by_sibling[s] = []
                            sibling_order.append(s)
                        by_sibling[s].append(e)
            self.push_if_new(to_mine)
            sibling_active = False
            if by_sibling:
                fresh_counts = ray.get(
                    [siblings[s].push_if_new.remote(by_sibling[s]) for s in sibling_order]
                )
                sibling_active = any(c > 0 for c in fresh_counts)
            for r in results:
                e = picked[r.pos]
                log_rows.append(
                    (
                        fetch_seq + r.pos,
                        wave_no,
                        r.url,
                        host_of_url(r.url),
                        e.directive,
                        e.cost,
                        e.seq,
                        r.status,
                        r.is_robots,
                        r.perp,
                        r.perp_str,
                        len(r.outlinks),
                        e.via,
                        e.perp_via_str,
                        e.retries,
                    )
                )
            fetch_seq += len(results)
            wave_no += 1
            budget -= 1
            if sibling_active or budget <= 0:
                break
            picked, _rej, wake = self.pop_wave(wave_no)
            # Crawl-delay can leave whole waves empty while hosts wait:
            # jump the virtual clock straight to the earliest wake wave
            # (conformance-identical: empty waves emit no log rows, and
            # the budget is debited by the number of waves skipped).
            # INVARIANT: the drain owns the half-open wave range
            # [start, start + budget) - a sibling becomes eligible AT
            # the boundary, so popping requires a slot strictly inside
            # the range (step <= budget - 1); at the boundary we consume
            # what remains and hand back to the driver.
            while not picked and self.has_work() and budget > 1:
                step = 1
                if wake is not None and wake > wave_no + 1:
                    step = wake - wave_no
                if step > budget - 1:
                    break
                wave_no += step
                budget -= step
                picked, _rej, wake = self.pop_wave(wave_no)
            if not picked and budget > 0 and self.has_work():
                # unused skip slots up to the boundary: consume them so
                # the driver resumes exactly at start + budget
                wave_no += budget
                budget = 0
            if not picked:
                finished = not self.has_work()
                break
        return {
            "log_rows": log_rows,
            "next_seq": next_seq,
            "wave_no": wave_no,
            "fetch_seq": fetch_seq,
            "n_rejected": n_rejected,
            "n_hops_rejected": n_hops_rejected,
            "finished": finished,
        }

    # -- wave pop ----------------------------------------------------------
    def pop_wave(
        self, wave_no: int | None = None
    ) -> tuple[list[FrontierEntry], int, int | None]:
        """One politeness slot for every ELIGIBLE host this shard owns.

        ``wave_no`` is the global virtual clock (100ms slots); a host
        whose robots ``Crawl-delay`` implies a period of k waves becomes
        eligible again only at ``last fetch wave + k`` - the Heritrix
        ``respectCrawlDelayUpToSeconds`` behavior (cxml:31).  When no
        wave number is supplied (microbench path) an internal counter
        advances one wave per call.

        Returns (picked entries [incl. robots prerequisites], number of
        robots-rejected entries discarded this wave, wake wave - see
        :meth:`wake_wave`; piggybacked so the driver needs no extra RPC
        for drain/termination decisions).
        """
        if wave_no is None:
            wave_no = self._auto_wave
        self._auto_wave = wave_no + 1
        picked: list[FrontierEntry] = []
        rejected = 0
        if self._overflow_count:
            for host in list(self._overflow_count.keys()):
                self._maybe_reload(host)
        for host in list(self.queues.keys()):
            q = self.queues[host]
            if not q:
                del self.queues[host]
                continue
            if wave_no < self.next_allowed.get(host, 0):
                continue  # Crawl-delay: host's slot hasn't come up yet
            if not self.robots.known(host):
                if self.robots.request_once(host):
                    head = q[0]
                    picked.append(
                        FrontierEntry(
                            directive=0,
                            cost=1,
                            seq=head[2],
                            url="http://%s/robots.txt" % host,
                            via=head[3],
                            perp_via_str="",
                            is_robots=True,
                        )
                    )
                # robots fetch in flight: host waits this wave
                continue
            while True:
                if not q:
                    self._maybe_reload(host)
                    q = self.queues.get(host, [])
                    if not q:
                        break
                directive, cost, seq, url, via, pvs, is_seed, hops, retries = heapq.heappop(q)
                if not self.robots.allowed(host, path_of_url(url)):
                    rejected += 1
                    self.n_robots_rejected += 1
                    continue
                picked.append(
                    FrontierEntry(directive, cost, seq, url, via, pvs, False, is_seed, hops, retries)
                )
                self.n_popped += 1
                period = self.robots.period(host)
                if period > 1:
                    self.next_allowed[host] = wave_no + period
                break
            if not q and not self._overflow_count.get(host):
                self.queues.pop(host, None)
        return picked, rejected, self.wake_wave()

    def wake_wave(self) -> int | None:
        """None when this shard has no work; else the earliest wave at
        which any of its hosts could become eligible (0 = immediately).
        Lets the driver size a sibling's drain budget so waves that
        nobody else can use run in-actor (Crawl-delay politeness)."""
        hosts = set(self.queues) | set(self._overflow_count)
        if not hosts:
            return None
        return min(self.next_allowed.get(h, 0) for h in hosts)

    def pending(self) -> int:
        return sum(len(q) for q in self.queues.values()) + sum(
            self._overflow_count.values()
        )

    def dump_entries(self) -> list[tuple]:
        """Every queued entry this shard still holds — heap AND overflow
        (in-memory run or disk spill), read NON-destructively — as
        ``(host, directive, cost, seq, url, via, perp_via_str, hops,
        retries)`` rows.  The frontier-residue inspection surface: what
        a wave-capped crawl leaves behind, comparable against the
        independent simulator's leftover frontier.  O(pending) — at a
        10^10-URL frontier consumers dump per shard and stream, never
        gather all shards on one driver."""
        rows: list[tuple] = []
        for host, q in self.queues.items():
            for d, c, seq, url, via, pvs, _is_seed, hops, retries in q:
                rows.append((host, d, c, seq, url, via, pvs, hops, retries))
        for host in self._overflow_count:
            if self.spill_dir:
                import os

                path = self._spill_path(host)
                spilled: list[tuple] = []
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        while True:
                            try:
                                spilled.extend(pickle.load(f))
                            except EOFError:
                                break
                else:
                    spilled = list(self._overflow_mem.get(host, []))
            else:
                spilled = list(self._overflow_mem.get(host, []))
            for d, c, seq, url, via, pvs, _is_seed, hops, retries in spilled:
                rows.append((host, d, c, seq, url, via, pvs, hops, retries))
        return rows

    def has_work(self) -> bool:
        return bool(self.queues) or bool(self._overflow_count)

    # -- checkpoint --------------------------------------------------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "queues": self.queues,
                "rules": self.robots._rules,
                "requested": self.robots._requested,
                "delays": self.robots._delays,
                "next_allowed": self.next_allowed,
                "auto_wave": self._auto_wave,
                "seen": self.seen.snapshot(),
                "head_budget": self.head_budget,
                "spill_floor": self._spill_floor,
                "overflow_mem": self._overflow_mem,
                "overflow_count": self._overflow_count,
                "spill_counters": (self.n_spilled, self.n_reloaded),
                "counters": (
                    self.n_pushed,
                    self.n_popped,
                    self.n_robots_rejected,
                    self.n_dup,
                ),
            }
        )

    @classmethod
    def restore(cls, blob: bytes) -> "FrontierShardState":
        d = pickle.loads(blob)
        st = cls()
        st.queues = d["queues"]
        st.robots._rules = d["rules"]
        st.robots._requested = d["requested"]
        st.robots._delays = d.get("delays", {})
        st.next_allowed = d.get("next_allowed", {})
        st._auto_wave = d.get("auto_wave", 0)
        st.seen = SeenShardState.restore(d["seen"])
        st.head_budget = d.get("head_budget")
        st._spill_floor = d.get("spill_floor", {})
        st._overflow_mem = d.get("overflow_mem", {})
        st._overflow_count = d.get("overflow_count", {})
        st.n_spilled, st.n_reloaded = d.get("spill_counters", (0, 0))
        st.n_pushed, st.n_popped, st.n_robots_rejected, st.n_dup = d["counters"]
        return st


def shard_of_host(host: str, num_shards: int) -> int:
    return url_hash64("host:" + host) % num_shards


def make_frontier_actors(num_shards: int, seen_capacity: int = 1 << 16,
                         seen_keep_exact: bool = True,
                         head_budget: int | None = None,
                         spill_dir: str | None = None,
                         lm_ref=None, pages_dir: str | None = None,
                         fault: tuple[int, int] | None = None,
                         seen_filter_kind: str = "cuckoo"):
    """``lm_ref`` + ``pages_dir`` (a host-co-partitioned pages layout,
    see ``sources.pages.pages_host_bucketed_dir``) attach a fused
    fetch+process path to each shard: politeness waves then cost ONE
    driver round trip instead of pop -> worker -> page-store chains.
    Requires ``NUM_HOST_BUCKETS % num_shards == 0`` (ownership rule)."""
    import ray

    @ray.remote(num_cpus=0.25)
    class FrontierShard:
        def __init__(self, rank: int):
            self.state = FrontierShardState(
                seen_capacity,
                seen_keep_exact,
                head_budget,
                ("%s/shard_%02d" % (spill_dir, rank)) if spill_dir else None,
                seen_filter_kind,
            )
            if lm_ref is not None and pages_dir is not None:
                from ..sources.pages import NUM_HOST_BUCKETS
                from ..stages.crawlworker import CrawlProcessor
                from .pagestore import PageStoreState

                lm = (
                    ray.get(lm_ref)
                    if isinstance(lm_ref, ray.ObjectRef)
                    else lm_ref
                )
                self.state.processor = CrawlProcessor(lm, fault)
                self.state.page_reader = PageStoreState(
                    pages_dir,
                    rank,
                    num_shards,
                    bucket_prefix="hostbucket",
                    num_buckets=NUM_HOST_BUCKETS,
                )

        def warm(self):
            if self.state.page_reader is not None:
                self.state.page_reader._load()
            return True

        def pop_and_process(self, wave_no, inline_max, max_retries=3,
                            retry_delay_waves=900):
            return self.state.pop_and_process(
                wave_no, inline_max, max_retries, retry_delay_waves
            )

        def push(self, entries):
            self.state.push(entries)

        def push_if_new(self, entries):
            return self.state.push_if_new(entries)

        def drain(self, picked, worker, siblings, my_index, next_seq, wave_no,
                  fetch_seq, max_hops, budget=2000, first_results=None,
                  max_retries=3, retry_delay_waves=900, policy="decesive"):
            return self.state.drain(
                picked, worker, siblings, my_index, next_seq, wave_no,
                fetch_seq, max_hops, budget, first_results,
                max_retries, retry_delay_waves, policy,
            )

        def exact_seen_keys(self):
            return self.state.exact_seen_keys()

        def set_robots(self, host, rules, delay=None):
            self.state.set_robots(host, rules, delay)

        def set_robots_many(self, items):
            for host, rules, delay in items:
                self.state.set_robots(host, rules, delay)

        def requeue_retries(self, entries, wave_no, retry_delay_waves):
            for e in entries:
                self.state.requeue_retry(e, wave_no, retry_delay_waves)

        def pop_wave(self, wave_no=None):
            return self.state.pop_wave(wave_no)

        def wake_wave(self):
            return self.state.wake_wave()

        def has_work(self):
            return self.state.has_work()

        def pending(self):
            return self.state.pending()

        def dump_entries(self):
            return self.state.dump_entries()

        def stats(self):
            return {
                "pushed": self.state.n_pushed,
                "popped": self.state.n_popped,
                "robots_rejected": self.state.n_robots_rejected,
                "duplicates": self.state.n_dup,
                "spilled": self.state.n_spilled,
                "reloaded": self.state.n_reloaded,
                "seen_added": self.state.seen.n_added,
                "seen_false_positives": self.state.seen.n_fp,
                "pending": self.state.pending(),
            }

        def snapshot(self, spill_dest: str | None = None):
            """Serialize the shard state; when ``spill_dest`` is given and
            this shard spills overflow to disk, copy its spill files into
            the checkpoint too (the snapshot blob only records counts/
            floors - the ROWS live in the files, and post-checkpoint
            appends/reloads would otherwise corrupt a later resume)."""
            blob = self.state.snapshot()
            if spill_dest and self.state.spill_dir:
                import os
                import shutil

                # clear the destination first: a crashed prior attempt
                # at the same wave may have left stale host files that
                # dirs_exist_ok would merge (and a later restore would
                # resurrect already-consumed URLs)
                shutil.rmtree(spill_dest, ignore_errors=True)
                if os.path.isdir(self.state.spill_dir):
                    shutil.copytree(self.state.spill_dir, spill_dest)
                else:
                    os.makedirs(spill_dest, exist_ok=True)
            return blob

        def restore(self, blob, spill_src: str | None = None):
            # keep the runtime attachments across checkpoint restores
            proc, reader = self.state.processor, self.state.page_reader
            spill_dir = self.state.spill_dir
            self.state = FrontierShardState.restore(blob)
            self.state.processor = proc
            self.state.page_reader = reader
            self.state.spill_dir = spill_dir
            if spill_dir:
                import os
                import shutil

                # reset the live spill dir to the checkpoint's content:
                # files appended/consumed after the snapshot must not
                # leak into the replay
                shutil.rmtree(spill_dir, ignore_errors=True)
                if spill_src and os.path.isdir(spill_src):
                    shutil.copytree(spill_src, spill_dir)

    return [FrontierShard.remote(r) for r in range(num_shards)]
