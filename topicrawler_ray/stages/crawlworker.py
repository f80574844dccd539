"""Crawl worker: per-fetch processing (extract -> score -> outlinks).

The disposition-chain equivalent
(``DecesiveValueProducerPerplexity`` -> ``CandidatesProcessor``,
cxml:419-437): for each fetched page, extract the cleaned plaintext
(Ext cleaner for scoring, cxml:216; Min for the conformance text),
compute LM perplexity + its ``%012g`` string, and parse outlinks in
document order carrying the parent's perplexity string (J1
carry-forward - the via perp is in hand when candidates are generated,
so no join is needed).

Instantiated as long-lived Ray actors (LM loaded once from the object
store) driven by the wave loop; also usable in-process by the
conformance oracle.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..functions.strings import format_g12, java_trim
from ..functions.urls import extract_outlinks
from ..stages.extract import decode_page_bytes, extract_one
from ..stages.score import score_text
from ..state.frontier import parse_robots


@dataclass
class FetchResult:
    pos: int  # position in the wave's fetch order
    url: str
    status: int  # 200 / 404
    is_robots: bool
    perp: float
    perp_str: str
    clean_text: str
    text_abbr: str
    lang: str
    warc_ts_us: int
    outlinks: list[str]  # canonical, document order
    # for robots fetches: (disallow prefixes, crawl_delay_seconds|None)
    robots_rules: tuple[list[str], float | None] | None


def transient_fault(url: str, retries: int, fault: tuple[int, int] | None) -> bool:
    """Deterministic transient-failure injection for the fetch-sim
    (``fault = (mod, attempts)``): a document page whose doc id is
    divisible by ``mod`` returns a 503 on its first ``attempts``
    fetches, then succeeds.  Robots and 404 urls never fault.  The
    conformance simulator implements the same predicate independently."""
    if not fault:
        return False
    mod, attempts = fault
    if retries >= attempts:
        return False
    tail = url.rsplit("/p", 1)
    if len(tail) != 2 or not tail[1].isdigit():
        return False
    return int(tail[1]) % mod == 0


def is_transient_status(status: int) -> bool:
    """Retryable fetch statuses (Heritrix retryable 5xx class)."""
    return 500 <= status < 600


class CrawlProcessor:
    """Pure per-fetch logic shared by Ray workers and the oracle."""

    def __init__(self, lm, fault: tuple[int, int] | None = None):
        self._lm = lm
        self._fault = fault

    def process(
        self,
        pos: int,
        url: str,
        is_robots: bool,
        page: tuple[bytes, int, str] | None,
        retries: int = 0,
    ) -> FetchResult:
        """Process one fetch; unexpected per-row failures are quarantined
        as status -1 rows (no score, no outlinks) instead of killing the
        wave (poison-row policy, SURVEY par.4 retries design)."""
        try:
            return self._process(pos, url, is_robots, page, retries)
        except Exception:
            return FetchResult(
                pos, url, -1, is_robots, float("nan"), "", "", "", "", 0,
                [], ([], None) if is_robots else None,
            )

    def _process(
        self,
        pos: int,
        url: str,
        is_robots: bool,
        page: tuple[bytes, int, str] | None,
        retries: int = 0,
    ) -> FetchResult:
        if page is None:
            return FetchResult(
                pos, url, 404, is_robots, float("nan"), "", "", "", "", 0,
                [], ([], None) if is_robots else None,
            )
        if not is_robots and transient_fault(url, retries, self._fault):
            # transient 50x: occupies the politeness slot, no content
            return FetchResult(
                pos, url, 503, False, float("nan"), "", "", "", "", 0, [], None
            )
        html_bytes, ts_us, lang = page
        if is_robots:
            rules = parse_robots(html_bytes.decode("utf-8", "replace"))
            return FetchResult(
                pos, url, 200, True, float("nan"), "", "", "", lang, ts_us, [], rules
            )
        html = decode_page_bytes(url, html_bytes)
        clean_text, scoring_text, abbr = extract_one(html)
        perp = score_text(self._lm, java_trim(scoring_text))
        perp_str = format_g12(perp)
        outlinks = extract_outlinks(html, url)
        return FetchResult(
            pos, url, 200, False, perp, perp_str, clean_text, abbr, lang, ts_us,
            outlinks, None,
        )


def make_crawl_workers(lm_ref, num_workers: int, num_cpus: float = 0.5, stores=None,
                       fault: tuple[int, int] | None = None):
    """Spawn the worker pool.  When ``stores`` (PageStore handles) are
    given, workers run the fetch-sim themselves (actor-to-actor, one less
    driver round trip on the wave critical path)."""
    import ray

    @ray.remote
    class CrawlWorker:
        def __init__(self, lm_ref, stores):
            lm = ray.get(lm_ref) if isinstance(lm_ref, ray.ObjectRef) else lm_ref
            self.proc = CrawlProcessor(lm, fault)
            self.stores = stores or []

        def process_batch(self, items, pages=None):
            """items: list of (pos, url, is_robots, retries); pages:
            url -> row or None to fetch from the page-store shards
            directly."""
            if pages is None:
                from ..state.pagestore import shard_of_url

                by_store: dict[int, list[str]] = {}
                for item in items:
                    url = item[1]
                    by_store.setdefault(
                        shard_of_url(url, len(self.stores)), []
                    ).append(url)
                parts = ray.get(
                    [self.stores[s].fetch.remote(us) for s, us in by_store.items()]
                )
                pages = {}
                for p in parts:
                    pages.update(p)
            return [
                self.proc.process(
                    item[0], item[1], item[2], pages.get(item[1]),
                    item[3] if len(item) > 3 else 0,
                )
                for item in items
            ]

        def ping(self):
            return True

    return [
        CrawlWorker.options(num_cpus=num_cpus).remote(lm_ref, stores)
        for _ in range(num_workers)
    ]
