"""Composite training-data curation pipeline — the webtext headline
that chains the engine's LLM-data operators end-to-end the way a real
100-TB pretraining run would:

    read (pruned columns)
      -> exact dedup FIRST                        (sharded DHT min-
                                                  reduce by default:
                                                  no sort/aggregate
                                                  exchange; survivors
                                                  only reach the
                                                  expensive per-doc
                                                  compute)
      -> ONE fused actor-pool stage               (language ID -> lang
                                                  gate -> quality +
                                                  gopher signals ->
                                                  quality gate -> token
                                                  counts, all inside
                                                  each actor task)

Dedup-before-compute is the production order: at an R-way duplication
rate every downstream stage does 1/R the work.  The dedup operator
re-executes its (cheap) upstream read twice — the standard two-pass
shape; everything else streams block-by-block.

Langid runs FIRST among the decorators: it is the chain's only
SELECTIVE gate on real webtext (a multilingual crawl keeps one target
language, dropping most rows), so quality/gopher/token kernels only
see the survivors.  Measured at sf0.1: langid 56 us/doc on 100% of
rows, then quality+gopher+tokens ~68 us/doc on the ~20% that pass =
~70 us/doc total vs ~109 the other way round.  The gate conjunction
commutes, so the output is identical either way.

Why ONE actor-pool stage instead of task-map stages around a langid
pool: a fixed-width actor pool holds its CPUs for the whole run, so
whatever it doesn't use is all the task stages get — measured at 16
CPUs, a 12-actor langid pool left the surrounding task maps running
~1-wide and the pool itself 64% busy (total utilization 38%).  Fusing
the full decorator+gate chain into the pool (and letting the sharded
dedup's filter map fuse in too, via equal remote args — Ray Data's
operator_fusion merges compatible adjacent maps) makes one operator
own the cluster: width = CPUs minus a small read reserve, 0.99 CPUs
per actor so parquet read tasks run in the fractional slack.  Used by
``bench.py`` as the ``curation`` headline.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Every map in the chain (the sharded-dedup filter and the fused
# decorator/gate actor pool) uses the same fractional CPU request so
# Ray Data's operator fusion merges them into ONE operator; the
# fraction keeps ~1 whole CPU of slack per 100 actors for the parquet
# read tasks (an integer full-width pool deadlocks the streaming
# executor on small clusters).
_CHAIN_NUM_CPUS = 0.99


def _langid_pool_size() -> int:
    """Cluster-derived width for the fused curation actor pool: all
    CPUs minus a small read reserve (1 per 16 CPUs, min 1), uncapped
    so a 256-node cluster gets a proportionally wide pool.  The pool
    runs the ENTIRE per-doc chain (langid + quality + gopher + gates +
    tokens), so it should own nearly the whole cluster; the reserve
    plus the 0.99-CPU fractional slack keeps the upstream parquet read
    tasks fed."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
        # clamp by what is actually free at plan time: long shared
        # sessions can carry idle actor reservations from earlier
        # pipelines, and a pool sized to the FULL cluster then starves
        # its own read tasks (deadlock).  available_resources is a
        # snapshot, but it can only narrow the pool, never over-commit.
        avail = int(ray.available_resources().get("CPU", cpus))
    except Exception:
        cpus = 8
        avail = 8
    return max(1, min(cpus - max(1, cpus // 16), avail - 1))


class _CurationChain:
    """The fused per-batch curation worker: langid (profiles compiled
    once per actor) -> lang gate -> quality + gopher signals -> quality
    gate -> token counts.  One actor task runs the whole chain, so the
    pipeline has a single compute operator to size to the cluster."""

    def __init__(
        self,
        lang: str,
        min_words: int,
        min_quality: float,
        max_line_dup_frac: float,
    ):
        from ..stages.textstats import LangId

        self._lid = LangId()
        self._lang = lang
        self._min_words = min_words
        self._min_quality = min_quality
        self._max_line_dup_frac = max_line_dup_frac

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages.textstats import (
            gopher_repetition_batch,
            quality_batch,
            token_count_batch,
        )

        batch = self._lid(batch)
        batch = batch.filter(
            pc.equal(batch.column("lang_pred"), pa.scalar(self._lang))
        )
        batch = quality_batch(batch)
        batch = gopher_repetition_batch(batch)
        # duplicate-line fraction from the gopher integer signals:
        # 1 - distinct/lines  <= max  <=>  distinct >= (1-max) * lines
        lines = pc.cast(batch.column("n_lines"), pa.float64())
        distinct = pc.cast(batch.column("n_distinct_lines"), pa.float64())
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(
                    batch.column("n_words"), pa.scalar(self._min_words)
                ),
                pc.greater_equal(
                    batch.column("quality_score"),
                    pa.scalar(self._min_quality),
                ),
            ),
            pc.greater_equal(
                distinct,
                pc.multiply(
                    pa.scalar(1.0 - self._max_line_dup_frac), lines
                ),
            ),
        )
        return token_count_batch(batch.filter(keep))


def curated_docs(
    docs_ds,
    lang: str = "en",
    min_words: int = 10,
    min_quality: float = 0.1,
    max_line_dup_frac: float = 0.5,
    langid_concurrency: int | None = None,
    dedup: str = "sharded",
):
    """documents Dataset (doc_id, text, ...) -> curated Dataset:
    exact-deduped, quality/langid decorated, gated, token-counted.

    ``langid_concurrency`` (width of the fused chain actor pool)
    defaults to a cluster-derived size (CPUs minus a small read
    reserve, uncapped) so the stage widens with the cluster instead of
    starving at a fixed constant.

    ``dedup`` picks the exact-dedup exchange: ``"sharded"`` (default)
    is the DHT-actor min-reduce — no Ray sort/aggregate exchange, RAM
    ~50 B per unique doc sharded across the cluster, and its filter
    map fuses into the chain actor pool; ``"hash"`` is the
    groupby-aggregate + winner-join flavour whose unique-key set can
    spill to disk.  Winner semantics are identical (min doc_id per
    content hash) — PROVIDED ``doc_id`` is globally unique, the
    real-corpus invariant.  If the input may contain physically
    duplicated rows (same doc_id AND text appearing twice), pass
    ``dedup="hash"``: its hash-partitioned winner join co-locates and
    collapses identical copies, while the sharded filter keeps every
    copy of the winner row (see :func:`exact_dedup_sharded`)."""
    from ..stages.dedup import exact_dedup_by_hash, exact_dedup_sharded

    if dedup == "sharded":
        ds = exact_dedup_sharded(
            docs_ds,
            column="text",
            id_column="doc_id",
            map_num_cpus=_CHAIN_NUM_CPUS,
        )
    elif dedup == "hash":
        ds = exact_dedup_by_hash(docs_ds, column="text", id_column="doc_id")
    else:
        raise ValueError(
            "dedup must be 'sharded' or 'hash', got %r" % (dedup,)
        )
    # batch_size=None = one actor task per BLOCK: task granularity is
    # the block layout (several tasks per actor for a clean tail), and
    # LangId chunks to its cache-resident size internally, so a big
    # block costs no memory-bandwidth penalty
    return ds.map_batches(
        _CurationChain,
        fn_constructor_args=(lang, min_words, min_quality, max_line_dup_frac),
        batch_format="pyarrow",
        batch_size=None,
        concurrency=langid_concurrency or _langid_pool_size(),
        num_cpus=_CHAIN_NUM_CPUS,
    )
