"""Greedy deterministic n-gram generation — the batch analog of the
reference's n-gram-index "most likely continuation" surface
(lt.lm GenerateNgramIndex.java / the LM REPL's continuation probes),
re-expressed Ray-Data-first.

Model build is distributed (per-batch Counter fold -> ONE
groupby(w1, w2, w3).sum -> per-context argmax inside map_groups); only
the |contexts|-row argmax table ships to the driver and broadcasts —
the standard small-side-model contract (same as the perplexity LM).
Generation itself is inherently sequential PER SEED, so it distributes
over seeds: an actor pool holds the broadcast argmax dict and walks
each seed independently.

Determinism rule: next token = argmax over continuations by
(count DESC, token ASC); generation stops when the context has no
continuation.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa


def trigram_argmax_table(ds, text_column: str = "text"):
    """(w1, w2) -> best continuation, distributed: per-batch Counter
    combiner, one groupby sum, per-context argmax in map_groups.
    Returns a Dataset of (w1, w2, w3, n) argmax rows."""

    def fold(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch.column(text_column).to_pylist():
            toks = (text or "").split(" ")
            for i in range(len(toks) - 2):
                c[(toks[i], toks[i + 1], toks[i + 2])] += 1
        ks = sorted(c)
        return pa.table(
            {
                "w1": pa.array([k[0] for k in ks], pa.string()),
                "w2": pa.array([k[1] for k in ks], pa.string()),
                "w3": pa.array([k[2] for k in ks], pa.string()),
                "n": pa.array([c[k] for k in ks], pa.int64()),
            }
        )

    counts = (
        ds.map_batches(fold, batch_format="pyarrow")
        .groupby(["w1", "w2", "w3"])
        .sum("n")
    )

    def argmax_of_group(group: pa.Table) -> pa.Table:
        ns = group.column("sum(n)").to_pylist()
        ws = group.column("w3").to_pylist()
        best = min(range(len(ns)), key=lambda i: (-ns[i], ws[i]))
        return pa.table(
            {
                "w1": group.column("w1").slice(best, 1),
                "w2": group.column("w2").slice(best, 1),
                "w3": group.column("w3").slice(best, 1),
                "n": pa.array([ns[best]], pa.int64()),
                "ctx_total": pa.array([sum(ns)], pa.int64()),
            }
        )

    return counts.groupby(["w1", "w2"]).map_groups(
        argmax_of_group, batch_format="pyarrow"
    )


def pick_seeds(argmax_rows: list[dict], n_seeds: int, min_count: int):
    """The n_seeds lexicographically-smallest contexts whose total
    continuation mass is >= min_count (so greedy walks don't die on
    the first step)."""
    ctxs = sorted(
        (r["w1"], r["w2"])
        for r in argmax_rows
        if r["ctx_total"] >= min_count
    )
    return ctxs[:n_seeds]


class GreedyGenerator:
    """Actor: broadcast argmax dict in __init__, walk seeds in
    __call__ — one row per generated token."""

    def __init__(self, table_ref, steps: int):
        import ray

        rows = ray.get(table_ref)
        self.nxt = {(r["w1"], r["w2"]): r["w3"] for r in rows}
        self.steps = steps

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_sid, o_seed, o_step, o_tok = [], [], [], []
        for sid, w1, w2 in zip(
            batch.column("seed_id").to_pylist(),
            batch.column("w1").to_pylist(),
            batch.column("w2").to_pylist(),
        ):
            ctx = (w1, w2)
            for step in range(self.steps):
                w = self.nxt.get(ctx)
                if w is None:
                    break
                o_sid.append(sid)
                o_seed.append("%s %s" % (w1, w2))
                o_step.append(step)
                o_tok.append(w)
                ctx = (ctx[1], w)
        return pa.table(
            {
                "seed_id": pa.array(o_sid, pa.int64()),
                "seed": pa.array(o_seed, pa.string()),
                "step": pa.array(o_step, pa.int64()),
                "token": pa.array(o_tok, pa.string()),
            }
        )


def greedy_continuations(
    ds,
    text_column: str = "text",
    n_seeds: int = 5,
    min_count: int = 20,
    steps: int = 12,
    concurrency: int = 2,
):
    """End-to-end: distributed trigram argmax model -> seed pick ->
    actor-pool greedy walks.  The argmax table (|contexts| rows, the
    model) is the ONLY driver materialization — the small-side-model
    contract; the corpus itself streams once."""
    import ray
    import ray.data

    rows = trigram_argmax_table(ds, text_column).take_all()
    seeds = pick_seeds(rows, n_seeds, min_count)
    table_ref = ray.put(rows)
    seed_ds = ray.data.from_arrow(
        pa.table(
            {
                "seed_id": pa.array(range(len(seeds)), pa.int64()),
                "w1": pa.array([s[0] for s in seeds], pa.string()),
                "w2": pa.array([s[1] for s in seeds], pa.string()),
            }
        )
    )
    return seed_ds.map_batches(
        GreedyGenerator,
        fn_constructor_kwargs={"table_ref": table_ref, "steps": steps},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
