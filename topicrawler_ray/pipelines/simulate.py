"""Pure-python reference simulator of the deterministic crawl spec.

Independent, sequential implementation of the scheduling semantics
documented in ``state/frontier.py`` / ``pipelines/crawl.py`` - used as
the conformance oracle: the distributed Ray engine must emit the exact
same fetch ordering, per-fetch assignments and URL-seen key set.

It deliberately does NOT reuse the engine's frontier / seen / wave
machinery (plain dict-of-sorted-lists + one python set here); only the
scalar reference-semantics functions are shared (prioritizer math,
extraction, scoring, robots parsing) since those are unit-tested against
the reference's golden cases on their own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow.parquet as pq

from ..config import CrawlConfig
from ..functions.hashing import url_hash64
from ..functions.strings import format_g12, java_trim
from ..functions.urls import extract_outlinks, host_of_url, path_of_url, seed_line_url
from ..stages import prioritize as prio
from ..stages.extract import decode_page_bytes, extract_one
from ..stages.score import score_text
from ..state.frontier import crawl_delay_period, parse_robots


@dataclass
class SimResult:
    rows: list[dict] = field(default_factory=list)  # fetch log
    seen_keys: set[int] = field(default_factory=set)
    n_rejected: int = 0
    n_dup: int = 0
    n_robots_rejected: int = 0
    n_domain_rejected: int = 0
    n_hops_rejected: int = 0
    # frontier residue of a wave-capped run: (host, directive, cost,
    # seq, url, via, perp_via_str, hops, retries) rows still queued
    # when the loop stopped (empty for a run-to-completion crawl)
    frontier_residue: list = field(default_factory=list)


def simulate_crawl(
    sf_dir: str,
    seeds: list[str] | None = None,
    config: CrawlConfig | None = None,
) -> SimResult:
    from ..lm.train import build_scorer_lm
    from ..pipelines.crawl import default_seeds
    from ..sources.pages import pages_path

    cfg = config or CrawlConfig()
    lm = build_scorer_lm(sf_dir, cfg.order, cfg.scorer)
    pages_t = pq.read_table(pages_path(sf_dir), columns=["url", "html"])
    page_html = {
        u: h for u, h in zip(pages_t["url"].to_pylist(), pages_t["html"].to_pylist())
    }

    seeds = seeds if seeds is not None else default_seeds(sf_dir)
    res = SimResult()

    # frontier: host -> list of entry tuples (directive, cost, seq, url,
    # via, perp_via_str); kept unsorted, min() picks the head
    frontier: dict[str, list[tuple]] = {}
    # host -> (disallow prefixes, crawl_delay_seconds|None) once fetched
    robots_rules: dict[str, tuple[list[str], float | None]] = {}
    robots_requested: set[str] = set()
    next_allowed: dict[str, int] = {}  # Crawl-delay politeness clock
    next_seq = 0

    def seen_add(url: str) -> bool:
        k = url_hash64(url)
        if k in res.seen_keys:
            return False
        res.seen_keys.add(k)
        return True

    def is_faulted(url: str, retries: int) -> bool:
        """Independent re-implementation of the deterministic
        transient-fault spec (doc id divisible by fault_mod fails its
        first fault_attempts fetches with a 503)."""
        if cfg.fault_mod is None:
            return False
        tail = url.rsplit("/p", 1)
        if len(tail) != 2 or not tail[1].isdigit():
            return False
        return int(tail[1]) % cfg.fault_mod == 0 and retries < cfg.fault_attempts

    for line in seeds:
        u = seed_line_url(line)
        seen_add(u)
        frontier.setdefault(host_of_url(u), []).append(
            (prio.SEED_DIRECTIVE, prio.SEED_COST, next_seq, u, "", prio.SEED_PERP_STR, 0, 0)
        )
        next_seq += 1

    observed_domains: set[str] = set()
    fetch_seq = 0
    wave = 0
    while wave < cfg.max_waves:
        # one politeness slot per host
        picks: list[tuple] = []  # (directive, cost, seq, url, via, pvs, is_robots)
        for host in list(frontier.keys()):
            entries = frontier[host]
            if not entries:
                del frontier[host]
                continue
            if wave < next_allowed.get(host, 0):
                continue  # Crawl-delay: host's slot hasn't come up yet
            if host not in robots_rules:
                if host not in robots_requested:
                    robots_requested.add(host)
                    head = min(entries)
                    picks.append(
                        (0, 1, head[2], "http://%s/robots.txt" % host, head[3], "", 0, 0, True)
                    )
                continue
            rules, delay = robots_rules[host]
            while entries:
                e = min(entries)
                entries.remove(e)
                if rules and any(
                    path_of_url(e[3]).startswith(p) for p in rules
                ):
                    res.n_robots_rejected += 1
                    continue
                picks.append((*e, False))
                period = crawl_delay_period(delay)
                if period > 1:
                    next_allowed[host] = wave + period
                break
            if not entries:
                del frontier[host]
        if not picks:
            # Crawl-delay can leave whole waves empty while hosts wait:
            # advance the virtual clock without fetching
            if any(frontier.values()):
                wave += 1
                continue
            break
        picks.sort(key=lambda p: (p[0], p[1], p[2], p[3]))

        candidates: list[tuple[str, str, str, int]] = []  # (url, via, pvs, hops)
        for directive, cost, seq, url, via, pvs, hops, retries, is_robots in picks:
            html = page_html.get(url)
            status = 200 if html is not None else 404
            perp = float("nan")
            perp_str = ""
            n_out = 0
            if not is_robots and status == 200 and is_faulted(url, retries):
                # transient 50x: the slot was consumed; re-queue with
                # retries+1 and snooze the host queue (cxml:66-67),
                # quarantine with a log row once retries are exhausted
                if retries + 1 < cfg.max_retries:
                    frontier.setdefault(host_of_url(url), []).append(
                        (directive, cost, seq, url, via, pvs, hops, retries + 1)
                    )
                    next_allowed[host_of_url(url)] = wave + cfg.retry_delay_waves
                    continue  # no log row while retries remain
                status = 503
            elif is_robots:
                robots_rules[host_of_url(url)] = (
                    parse_robots(html.decode("utf-8", "replace"))
                    if html
                    else ([], None)
                )
            elif status == 200:
                html_s = decode_page_bytes(url, html)
                _, scoring_text, _ = extract_one(html_s)
                perp = score_text(lm, java_trim(scoring_text))
                perp_str = format_g12(perp)
                outlinks = extract_outlinks(html_s, url)
                n_out = len(outlinks)
                for link in outlinks:
                    candidates.append((link, url, perp_str, hops + 1))
            res.rows.append(
                {
                    "fetch_seq": fetch_seq,
                    "wave": wave,
                    "url": url,
                    "host": host_of_url(url),
                    "directive": directive,
                    "cost": cost,
                    "seq": seq,
                    "status": status,
                    "is_robots": is_robots,
                    "perp": perp,
                    "perp_str": perp_str,
                    "n_outlinks": n_out,
                    "via": via,
                    "perp_via_str": pvs,
                    "retries": retries,
                }
            )
            fetch_seq += 1

        for url, via, pvs, hops in candidates:
            if hops > cfg.max_hops:
                res.n_hops_rejected += 1
                continue
            if cfg.max_domains is not None:
                from .crawl import _domain_of

                domain = _domain_of(host_of_url(url))
                rejected = len(observed_domains) > cfg.max_domains
                observed_domains.add(domain)
                if rejected:
                    res.n_domain_rejected += 1
                    continue
            a = prio.schedule(float(pvs))
            if a.directive < 0:
                res.n_rejected += 1
                continue
            p_dir, p_cost = prio.apply_policy(a.directive, a.cost, cfg.policy)
            # SPEC: seq assigned in proposal order BEFORE the seen filter
            seq = next_seq
            next_seq += 1
            if not seen_add(url):
                res.n_dup += 1
                continue
            frontier.setdefault(host_of_url(url), []).append(
                (p_dir, p_cost, seq, url, via, pvs, hops, 0)
            )
        wave += 1

    for host, entries in frontier.items():
        for d, c, seq, url, via, pvs, hops, retries in entries:
            res.frontier_residue.append(
                (host, d, c, seq, url, via, pvs, hops, retries)
            )
    res.frontier_residue.sort()
    return res
