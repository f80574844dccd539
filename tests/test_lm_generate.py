"""Greedy deterministic trigram generation: distributed argmax model +
actor-pool walks vs a hand-computed corpus."""

import pyarrow as pa


def _ds(texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(3)


class TestGreedyGeneration:
    def test_ties_break_lexicographically_and_walks_stop(self, ray_session):
        from topicrawler_ray.lm.generate import greedy_continuations

        # context (a b): 'c' twice, 'b' twice -> tie, 'b' wins (ASC);
        # (b b): only 'z' which has no continuation -> walk stops
        texts = [
            "a b c",
            "a b c",
            "a b b",
            "a b b",
            "b b z",
        ]
        out = greedy_continuations(
            _ds(texts), n_seeds=2, min_count=2, steps=5, concurrency=1
        ).take_all()
        rows = sorted((r["seed_id"], r["step"], r["seed"], r["token"]) for r in out)
        # seeds: lexicographically smallest contexts with mass >= 2:
        # ('a','b') mass 4 and ('b','b') mass... (b b z) count 1 < 2,
        # so the second seed is whatever context reaches 2 - none do,
        # leaving one seed only
        assert rows == [
            (0, 0, "a b", "b"),   # tie c/b broken to 'b'
            (0, 1, "a b", "z"),   # context (b, b) -> z
            # context (b, z) has no continuation -> stop
        ]

    def test_matches_sequential_on_random_corpus(self, ray_session):
        import random

        from topicrawler_ray.lm.generate import greedy_continuations

        rng = random.Random(7)
        vocab = list("abcdefg")
        texts = [
            " ".join(rng.choice(vocab) for _ in range(30)) for _ in range(40)
        ]
        counts = {}
        for t in texts:
            toks = t.split(" ")
            for i in range(len(toks) - 2):
                k = (toks[i], toks[i + 1], toks[i + 2])
                counts[k] = counts.get(k, 0) + 1
        by_ctx = {}
        for (w1, w2, w3), n in counts.items():
            by_ctx.setdefault((w1, w2), []).append((n, w3))
        nxt = {c: min(l, key=lambda t: (-t[0], t[1]))[1] for c, l in by_ctx.items()}
        totals = {c: sum(n for n, _ in l) for c, l in by_ctx.items()}
        seeds = sorted(c for c in by_ctx if totals[c] >= 5)[:4]
        expect = []
        for sid, (w1, w2) in enumerate(seeds):
            ctx = (w1, w2)
            for step in range(8):
                w = nxt.get(ctx)
                if w is None:
                    break
                expect.append((sid, step, w))
                ctx = (ctx[1], w)
        got = sorted(
            (r["seed_id"], r["step"], r["token"])
            for r in greedy_continuations(
                _ds(texts), n_seeds=4, min_count=5, steps=8, concurrency=1
            ).take_all()
        )
        assert got == sorted(expect)
