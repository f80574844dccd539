"""Distributional thesaurus (stages/dt.py): LMI feature ranking and
shared-feature similarity vs an in-test sequential reference."""

import numpy as np
import pyarrow as pa
import pytest

DOCS = [
    "cat sat mat",
    "cat sat hat",
    "dog sat mat",
    "dog ran fast",
    "cat ran mat",
    "bird flew high",
    "bird sat mat",
]


def seq_dt(docs, window=2, k=3):
    from collections import Counter, defaultdict

    c = Counter()
    for t in docs:
        w = t.split(" ")
        for i in range(len(w)):
            for d in range(1, window + 1):
                if i + d < len(w):
                    c[(w[i], w[i + d])] += 1
    total = sum(c.values())
    r, cc = Counter(), Counter()
    for (a, b), n in c.items():
        r[a] += n
        cc[b] += n
    by_word = defaultdict(list)
    for (a, b), n in c.items():
        lmi = n * (np.log(n * float(total)) - np.log(float(r[a]) * float(cc[b])))
        by_word[a].append((int(np.floor(lmi * 1e6)), b, n))
    feats = {
        a: sorted(v, key=lambda t: (-t[0], t[1]))[:k] for a, v in by_word.items()
    }
    fsets = {a: {b for _, b, _ in v} for a, v in feats.items()}
    pairs = Counter()
    for a in fsets:
        for b in fsets:
            if a != b and fsets[a] & fsets[b]:
                pairs[(a, b)] = len(fsets[a] & fsets[b])
    sims = {}
    for a in fsets:
        cand = sorted(
            ((n, b) for (x, b), n in pairs.items() if x == a),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        if cand:
            sims[a] = cand
    return feats, sims


class TestDT:
    def test_lmi_features_match_reference(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.cooc import word_cooc
        from topicrawler_ray.stages.dt import lmi_features

        ds = ray.data.from_items([{"text": t} for t in DOCS]).repartition(3)
        out = lmi_features(word_cooc(ds, window=2), k=3).take_all()
        feats, _ = seq_dt(DOCS)
        got = {}
        for rr in sorted(out, key=lambda r: (r["word"], r["rank"])):
            got.setdefault(rr["word"], []).append(
                (rr["lmi_e6"], rr["feature"], rr["n"])
            )
        assert got == feats

    def test_similarity_matches_reference(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.cooc import word_cooc
        from topicrawler_ray.stages.dt import dt_similarity, lmi_features

        ds = ray.data.from_items([{"text": t} for t in DOCS]).repartition(3)
        sim = dt_similarity(
            lmi_features(word_cooc(ds, window=2), k=3), k=3
        ).take_all()
        _, sims = seq_dt(DOCS)
        got = {}
        for rr in sorted(sim, key=lambda r: (r["word"], r["rank"])):
            got.setdefault(rr["word"], []).append((rr["n_shared"], rr["neighbor"]))
        assert got == sims
        # cats and dogs share contexts
        assert "dog" in [b for _, b in got["cat"]]

    def test_promiscuous_feature_guard(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.dt import dt_similarity

        # 4 words all sharing 'stop'; pairs via 'stop' vanish when the
        # df cap excludes it, leaving only the x/y pair via 'rare'
        rows = [
            {"word": w, "feature": "stop"} for w in ("a", "b", "x", "y")
        ] + [{"word": "x", "feature": "rare"}, {"word": "y", "feature": "rare"}]
        ds = ray.data.from_items(rows).repartition(2)
        out = dt_similarity(ds, k=3, max_feature_df=3).take_all()
        got = {(r["word"], r["neighbor"]): r["n_shared"] for r in out}
        assert got == {("x", "y"): 1, ("y", "x"): 1}
