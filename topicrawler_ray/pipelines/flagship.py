"""Flagship linear pipeline: pages -> extract -> score (no frontier).

The SURVEY.md par.7 step-3 slice: ``read_parquet(pages)`` ->
``map_batches(extract)`` -> ``map_batches(PerplexityScorer actor pool)``.
The crawl loop (frontier/politeness/seen) builds on top of this in
``pipelines/crawl.py``.
"""

from __future__ import annotations

import ray.data

from ..lm.train import DEFAULT_ORDER, topic_lm_ref
from ..sources.pages import read_pages
from ..stages.extract import extract_batch
from ..stages.score import PerplexityScorer


def scored_pages(
    sf_dir: str,
    order: int = DEFAULT_ORDER,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int = 256,
) -> ray.data.Dataset:
    """Lazy Dataset of scored pages: url, warc_ts, lang, clean_text,
    text_abbr, perp, perp_str (html/score_text dropped after use)."""
    lm_ref = topic_lm_ref(sf_dir, order)
    n_actors = concurrency if isinstance(concurrency, int) else concurrency[1]
    ds = read_pages(sf_dir, num_blocks=max(8, n_actors * 4))
    ds = ds.map_batches(extract_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        PerplexityScorer,
        fn_constructor_kwargs={"lm_ref": lm_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    return ds.select_columns(
        ["url", "warc_ts", "lang", "clean_text", "text_abbr", "perp", "perp_str"]
    )
