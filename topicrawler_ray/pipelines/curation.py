"""Composite training-data curation pipeline — the webtext headline
that chains the engine's LLM-data operators end-to-end the way a real
100-TB pretraining run would:

    read (pruned columns)
      -> exact dedup FIRST                        (hash-aggregate +
                                                  winner join: slim
                                                  16-byte shuffle, no
                                                  sort; survivors only
                                                  reach the expensive
                                                  per-doc compute)
      -> quality signals + gopher repetition     (stateless Arrow maps,
                                                  fused by Ray Data)
      -> language ID                              (actor pool: profiles
                                                  compiled once/actor)
      -> quality + language gates                 (vectorized filter)
      -> token counting                           (stateless map)

Dedup-before-compute is the production order: at an R-way duplication
rate every downstream stage does 1/R the work.  The dedup operator
re-executes its (cheap) upstream read twice — the standard two-pass
shape; everything else streams block-by-block with one all-to-all
exchange total.  Used by ``bench.py`` as the ``curation`` headline:
docs/sec through the whole chain with the input replicated xR so the
dedup stage does representative work instead of passing everything
through.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def _langid_pool_size() -> int:
    """Cluster-derived langid actor-pool width: half the CPUs (uncapped,
    so a 256-node cluster gets a proportionally wide pool), never the
    full width (upstream read tasks need CPUs or the streaming executor
    deadlocks on small clusters)."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(1, cpus // 2)


def curated_docs(
    docs_ds,
    lang: str = "en",
    min_words: int = 10,
    min_quality: float = 0.1,
    max_line_dup_frac: float = 0.5,
    langid_concurrency: int | None = None,
):
    """documents Dataset (doc_id, text, ...) -> curated Dataset:
    exact-deduped, quality/langid decorated, gated, token-counted.

    ``langid_concurrency`` defaults to a cluster-derived pool size
    (half the cluster CPUs, uncapped) so the actor-pool stage widens
    with the cluster instead of starving at a fixed constant; half so
    the upstream read/map tasks keep CPUs (full-width actor pools
    deadlock the streaming executor on small clusters)."""
    from ..stages.dedup import exact_dedup_by_hash
    from ..stages.textstats import (
        LangId,
        gopher_repetition_batch,
        quality_batch,
        token_count_batch,
    )

    ds = exact_dedup_by_hash(docs_ds, column="text", id_column="doc_id")
    ds = ds.map_batches(quality_batch, batch_format="pyarrow")
    ds = ds.map_batches(gopher_repetition_batch, batch_format="pyarrow")
    ds = ds.map_batches(
        LangId,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=langid_concurrency or _langid_pool_size(),
    )

    def gate(batch: pa.Table) -> pa.Table:
        # duplicate-line fraction from the gopher integer signals:
        # 1 - distinct/lines  <= max  <=>  distinct >= (1-max) * lines
        lines = pc.cast(batch.column("n_lines"), pa.float64())
        distinct = pc.cast(batch.column("n_distinct_lines"), pa.float64())
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("n_words"), pa.scalar(min_words)),
                pc.greater_equal(
                    batch.column("quality_score"), pa.scalar(min_quality)
                ),
            ),
            pc.and_(
                pc.equal(batch.column("lang_pred"), pa.scalar(lang)),
                pc.greater_equal(
                    distinct,
                    pc.multiply(pa.scalar(1.0 - max_line_dup_frac), lines),
                ),
            ),
        )
        return batch.filter(keep)

    ds = ds.map_batches(gate, batch_format="pyarrow")
    return ds.map_batches(token_count_batch, batch_format="pyarrow")
