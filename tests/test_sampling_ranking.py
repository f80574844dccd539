"""Sampling + ranking operators (training-data curation suite):
deterministic hash sampling, group-wise top-k, df / top-terms."""

import numpy as np
import pyarrow as pa
import pytest


class TestHashSampling:
    def test_fraction_and_determinism(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sampling import hash_sample

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(4000), pa.int64())})
        )
        a = hash_sample(ds, "doc_id", 0.25, seed="s1").to_pandas()
        b = hash_sample(ds, "doc_id", 0.25, seed="s1").to_pandas()
        assert list(a.doc_id) == list(b.doc_id)  # pure function of ids
        assert 0.20 < len(a) / 4000 < 0.30  # ~fraction
        c = hash_sample(ds, "doc_id", 0.25, seed="s2").to_pandas()
        assert list(a.doc_id) != list(c.doc_id)  # seed matters

    def test_nested_fractions(self, ray_session):
        """A smaller fraction with the same seed is a SUBSET of a larger
        one (threshold monotonicity) - lets eval holdouts nest."""
        import ray.data

        from topicrawler_ray.stages.sampling import hash_sample

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        )
        small = set(hash_sample(ds, "doc_id", 0.1, seed="s").to_pandas().doc_id)
        big = set(hash_sample(ds, "doc_id", 0.4, seed="s").to_pandas().doc_id)
        assert small <= big

    def test_stratified_fractions(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sampling import stratified_sample

        n = 3000
        t = pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "lang": pa.array(
                    [("en", "de", "fr")[i % 3] for i in range(n)], pa.string()
                ),
            }
        )
        out = stratified_sample(
            ray.data.from_arrow(t), "doc_id", "lang",
            {"en": 0.8, "de": 0.2}, default_fraction=0.0,
        ).to_pandas()
        counts = out.lang.value_counts().to_dict()
        assert 0.7 < counts["en"] / 1000 < 0.9
        assert 0.12 < counts["de"] / 1000 < 0.28
        assert "fr" not in counts  # default 0 drops the stratum


class TestWeightedSample:
    def test_partitioning_invariance_and_weight_bias(self, ray_session):
        """A-ES top-k is a pure function of (ids, weights, seed) - the
        same rows whatever the block layout - and across seeds the
        inclusion frequency must track the weights (heavy rows sampled
        far more often than light ones)."""
        import ray.data

        from topicrawler_ray.stages.sampling import weighted_sample

        n = 400
        ids = np.arange(n, dtype=np.int64)
        # weights: first half light (1), second half heavy (50)
        w = np.where(ids < n // 2, 1, 50).astype(np.int64)
        tbl = pa.table({"doc_id": pa.array(ids), "n_chars": pa.array(w)})

        def run(parts, seed):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            out = weighted_sample(ds, "doc_id", "n_chars", k=40, seed=seed)
            return out.to_pandas()

        a = run(1, "s1")
        b = run(13, "s1")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert a["score_e9"].tolist() == b["score_e9"].tolist()
        # scores are sorted descending, k respected
        assert len(a) == 40
        assert a["score_e9"].is_monotonic_decreasing

        heavy = 0
        for seed in ("s1", "s2", "s3", "s4", "s5"):
            out = run(5, seed)
            heavy += (out["doc_id"] >= n // 2).sum()
        # 50x weight -> heavy rows should dominate the samples
        assert heavy / (5 * 40) > 0.8

    def test_nonpositive_weights_excluded(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sampling import weighted_sample

        tbl = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "n_chars": pa.array([0, -5, 10, 10], pa.int64()),
            }
        )
        out = weighted_sample(
            ray.data.from_arrow(tbl), "doc_id", "n_chars", k=10, seed="z"
        ).to_pandas()
        assert set(out["doc_id"]) == {3, 4}


class TestShuffleShards:
    def test_permutation_and_determinism(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sampling import shuffle_shards

        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(range(2000), pa.int64())})
        )
        a = shuffle_shards(ds, "doc_id", 8, seed="s1").to_pandas()
        # every row exactly once (it's a permutation layout)
        assert sorted(a.doc_id) == list(range(2000))
        # shard assignment consistent with the key, ranks contiguous 0..n-1
        assert ((a.shuffle_key % 8) == a.shard).all()
        for shard, grp in a.groupby("shard"):
            grp = grp.sort_values(["shuffle_key", "doc_id"])
            assert list(grp.shard_pos) == list(range(len(grp)))
        # roughly uniform shards
        sizes = a.groupby("shard").size()
        assert len(sizes) == 8 and sizes.min() > 2000 / 8 * 0.7
        # deterministic; seed changes the layout
        b = shuffle_shards(ds, "doc_id", 8, seed="s1").to_pandas()
        assert a.sort_values("doc_id").reset_index(drop=True).equals(
            b.sort_values("doc_id").reset_index(drop=True)
        )
        c = shuffle_shards(ds, "doc_id", 8, seed="s2").to_pandas()
        assert not a.sort_values("doc_id").shuffle_key.reset_index(
            drop=True
        ).equals(c.sort_values("doc_id").shuffle_key.reset_index(drop=True))

    def test_partitioning_invariance(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.sampling import shuffle_shards

        t = pa.table({"doc_id": pa.array(range(500), pa.int64())})
        one = shuffle_shards(
            ray.data.from_arrow(t), "doc_id", 4, seed="x"
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        many = shuffle_shards(
            ray.data.from_arrow(t).repartition(13), "doc_id", 4, seed="x"
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert one.equals(many)  # layout independent of input blocking


class TestTopkPerGroup:
    def test_matches_pandas_reference(self, ray_session):
        import pandas as pd
        import ray.data

        from topicrawler_ray.stages.ranking import topk_per_group

        rng = np.random.default_rng(11)
        n = 5000
        df = pd.DataFrame(
            {
                "g": rng.integers(0, 20, n),
                "score": rng.integers(0, 50, n).astype("float64"),
                "id": np.arange(n, dtype="int64"),
            }
        )
        out = (
            topk_per_group(
                ray.data.from_pandas(df), "g", "score", "id", k=4
            )
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        ref = (
            df.sort_values(["g", "score", "id"], ascending=[True, False, True])
            .groupby("g", sort=True)
            .head(4)
            .reset_index(drop=True)
        )
        assert list(out.g) == list(ref.g)
        assert list(out.id) == list(ref.id)
        assert list(out.score) == list(ref.score)
        # ranks run 0..k-1 within each group
        assert all(
            list(sub["rank"]) == list(range(len(sub)))
            for _, sub in out.groupby("g")
        )


class TestDocTerms:
    def test_edge_token_semantics_match_python_split(self, ray_session):
        """The round-4 vectorized partials must keep text.split(' ')
        semantics exactly: empty tokens from runs of spaces COUNT for
        word_df (df of '' rises), empty/None texts contribute nothing,
        and explode_tf drops '' terms."""
        from collections import Counter

        import ray.data

        from topicrawler_ray.stages.ranking import doc_top_terms, word_df

        docs = [
            {"doc_id": 0, "text": " leading  double and trailing "},
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": None},
            {"doc_id": 3, "text": "and and  again"},
        ]
        ds = ray.data.from_items(docs)
        dfm = dict(
            zip(*(lambda d: (d.word, d.df))(word_df(ds).to_pandas()))
        )
        expect: Counter = Counter()
        for d in docs:
            if not d["text"]:
                continue
            expect.update(set(d["text"].split(" ")))
        assert dfm == dict(expect) and "" in dfm
        tf_rows = (
            doc_top_terms(ds, k=10, max_df_docs=100)
            .to_pandas()
        )
        assert "" not in set(tf_rows.term)
        got3 = {
            (r.term, r.tf) for r in tf_rows.itertuples() if r.doc_id == 3
        }
        assert got3 == {("and", 2), ("again", 1)}

    def test_word_df_and_top_terms(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.ranking import doc_top_terms, word_df

        docs = [
            {"doc_id": 0, "text": "alpha alpha beta common common"},
            {"doc_id": 1, "text": "beta beta gamma common"},
            {"doc_id": 2, "text": "gamma delta common common common"},
        ]
        ds = ray.data.from_items(docs)
        dfm = dict(
            zip(*(lambda d: (d.word, d.df))(word_df(ds).to_pandas()))
        )
        assert dfm == {
            "alpha": 1, "beta": 2, "gamma": 2, "delta": 1, "common": 3
        }
        # stop-term 'common' (df 3 > max_df 2) is dropped everywhere
        out = (
            doc_top_terms(ds, k=2, max_df_docs=2)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        got = {
            (r.doc_id, r.rank): (r.term, r.tf, r.df)
            for r in out.itertuples()
        }
        assert got[(0, 0)] == ("alpha", 2, 1)
        assert got[(0, 1)] == ("beta", 1, 2)
        assert got[(1, 0)] == ("beta", 2, 2)
        assert got[(1, 1)] == ("gamma", 1, 2)
        assert got[(2, 0)] == ("delta", 1, 1)  # tf tie -> term asc
        assert got[(2, 1)] == ("gamma", 1, 2)
        assert "common" not in set(out.term)


class TestSequencePacking:
    def test_capacity_and_partitioning_invariance(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.packing import pack_sequences

        rng = np.random.default_rng(3)
        docs = [
            {"doc_id": i, "text": " ".join("w%d" % j for j in range(int(rng.integers(1, 40))))}
            for i in range(500)
        ]
        def run(nblocks):
            ds = ray.data.from_items(docs, override_num_blocks=nblocks)
            return (
                pack_sequences(ds, max_tokens=64, range_size=100)
                .to_pandas()
                .sort_values("doc_id")
                .reset_index(drop=True)
            )

        a, b = run(2), run(17)
        # block boundaries never leak into the packing
        assert a.equals(b)
        # capacity respected: per-sequence token sums <= 64 (except
        # oversized single docs, none here since docs < 40 tokens)
        sums = a.groupby("seq_id")["n_tokens"].sum()
        assert (sums <= 64).all()
        # offsets are the running fill within each sequence
        for _sid, sub in a.sort_values(["seq_id", "doc_id"]).groupby("seq_id"):
            run_fill = 0
            for r in sub.itertuples():
                assert r.seq_offset == run_fill
                run_fill += r.n_tokens
        # sequences never cross 100-doc ranges
        rng_of_seq = a.assign(rid=a.doc_id // 100).groupby("seq_id")["rid"].nunique()
        assert (rng_of_seq == 1).all()

    def test_oversized_doc_gets_own_sequence(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.packing import pack_sequences

        docs = [
            {"doc_id": 0, "text": "a b c"},
            {"doc_id": 1, "text": " ".join("x%d" % j for j in range(30))},  # > cap
            {"doc_id": 2, "text": "d e"},
        ]
        out = (
            pack_sequences(ray.data.from_items(docs), max_tokens=10)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert list(out.seq_id) == [0, 1, 2]  # the giant doc sits alone
        assert list(out.seq_offset) == [0, 0, 0]


class TestExactNtile:
    def _oracle(self, pairs, n):
        """Sequential ntile: first N%n buckets one row larger."""
        pairs = sorted(pairs)
        total = len(pairs)
        base, rem = divmod(total, n)
        out, i = {}, 0
        for j in range(1, n + 1):
            size = base + (1 if j <= rem else 0)
            for _ in range(size):
                out[pairs[i][1]] = j
                i += 1
        return out

    def test_matches_sequential_ntile_with_ties(self, ray_session):
        import numpy as np
        import ray.data

        from topicrawler_ray.stages.ranking import exact_ntile

        rng = np.random.default_rng(3)
        vals = rng.integers(0, 50, size=400).tolist()  # heavy ties
        rows = [{"v": int(v), "id": "k%04d" % i} for i, v in enumerate(vals)]
        for n in (2, 3, 7):
            ds = ray.data.from_items(rows).repartition(8)
            got = exact_ntile(ds, "v", "id", n_buckets=n).to_pandas()
            want = self._oracle([(r["v"], r["id"]) for r in rows], n)
            assert dict(zip(got["id"], got["bucket"])) == want

    def test_single_value_all_ties(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.ranking import exact_ntile

        rows = [{"v": 5, "id": "k%02d" % i} for i in range(10)]
        got = exact_ntile(ray.data.from_items(rows), "v", "id", 3).to_pandas()
        want = self._oracle([(5, r["id"]) for r in rows], 3)
        assert dict(zip(got["id"], got["bucket"])) == want


class TestUrlFilter:
    def test_rules(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.urlfilter import url_filter

        rows = [
            {"url": "http://host1.example/p1"},
            {"url": "http://host5.example/p2"},      # blocked host (N%5==0)
            {"url": "http://host2.example/robots.txt"},  # robots
            {"url": "http://host3.example/p?q=1"},   # query string
            {"url": "not a url"},                    # unparseable
            {"url": "http://host10.example/p3"},     # blocked host
            {"url": "http://host11.example/p4"},
        ]
        out = url_filter(ray.data.from_items(rows)).to_pandas()
        assert sorted(out.url) == [
            "http://host1.example/p1",
            "http://host11.example/p4",
        ]
        assert sorted(out.host) == ["host1.example", "host11.example"]


class TestMixtureSample:
    def _ds(self, ray):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(40), pa.int64()),
                    "source": pa.array(
                        ["a"] * 20 + ["b"] * 15 + ["c"] * 5
                    ),
                    "n_chars": pa.array(
                        [100 + 7 * i for i in range(40)], pa.int64()
                    ),
                }
            )
        )

    def test_group_and_threshold_agree(self, ray_session):
        import ray

        from topicrawler_ray.stages.sampling import mixture_sample

        ds = self._ds(ray)
        budgets = {"a": 800, "b": 10**9, "c": 1}  # mid / all / none
        g = (
            mixture_sample(ds, budgets, mode="group")
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        t = (
            mixture_sample(ds, budgets, mode="threshold", bins=4)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert g.equals(t)
        by_src = g.groupby("source")["keep"].sum()
        assert by_src["b"] == 15  # budget covers everything
        assert by_src["c"] == 0  # budget below the smallest doc
        assert 0 < by_src["a"] < 20

    def test_inclusive_cumsum_semantics(self, ray_session):
        import ray

        from topicrawler_ray.stages.sampling import (
            _bucket32,
            mixture_sample,
        )

        ds = self._ds(ray)
        # compute the sequential truth for source 'a'
        rows = [(i, 100 + 7 * i) for i in range(20)]
        rows.sort(key=lambda r: (_bucket32("0", str(r[0])), r[0]))
        cum, expect = 0, {}
        for i, tok in rows:
            cum += tok
            expect[i] = cum <= 800
        out = (
            mixture_sample(ds, {"a": 800}, mode="threshold")
            .to_pandas()
            .set_index("doc_id")["keep"]
        )
        for i, want in expect.items():
            assert out[i] == want, i

    def test_unbudgeted_source_drops(self, ray_session):
        import ray

        from topicrawler_ray.stages.sampling import mixture_sample

        ds = self._ds(ray)
        out = mixture_sample(ds, {"a": 10**9}, mode="group").to_pandas()
        assert not out[out.source != "a"]["keep"].any()
        assert out[out.source == "a"]["keep"].all()


class TestDiverseSample:
    def test_quota_and_partition_invariance(self, ray_session):
        import numpy as np
        import ray.data

        from topicrawler_ray.stages.sampling import diverse_sample

        rng = np.random.RandomState(9)
        # two well-separated blobs
        vecs = np.concatenate(
            [rng.randn(60, 8) + 5.0, rng.randn(60, 8) - 5.0]
        )
        rows = [
            {"vec_id": i, "embedding": vecs[i].tolist()}
            for i in range(len(vecs))
        ]
        outs = []
        for parts in (1, 5):
            ds = ray.data.from_items(rows).repartition(parts)
            got = sorted(
                (r["cluster"], r["rank"], r["vec_id"])
                for r in diverse_sample(
                    ds, quota_per_cluster=4, n_lists=2
                ).take_all()
            )
            outs.append(got)
        assert outs[0] == outs[1]
        by_cluster = {}
        for c, r, i in outs[0]:
            by_cluster.setdefault(c, []).append((r, i))
        assert set(by_cluster) == {0, 1}
        for members in by_cluster.values():
            assert [r for r, _ in sorted(members)] == [0, 1, 2, 3]
        # both blobs represented: each cluster's sample comes from one side
        sides = {
            c: {i < 60 for _, i in members}
            for c, members in by_cluster.items()
        }
        assert all(len(s) == 1 for s in sides.values())
        assert sides[0] != sides[1]


class TestZipfHead:
    def test_matches_counter_reference_and_partitioning(self, ray_session):
        from collections import Counter

        import pandas as pd
        import ray.data

        from topicrawler_ray.stages.ranking import zipf_head

        rng = np.random.default_rng(23)
        vocab = ["a", "bb", "ccc", "dd", "e", "", "zz", "q"]
        langs = ["en", "de", "fr"]
        rows = []
        for i in range(400):
            words = list(rng.choice(vocab, size=rng.integers(0, 12)))
            rows.append(
                {
                    "lang": str(rng.choice(langs)),
                    "text": " ".join(words),
                }
            )
        # empty + None texts must contribute nothing
        rows.append({"lang": "en", "text": ""})
        rows.append({"lang": "de", "text": None})
        df = pd.DataFrame(rows)

        ref_counts = Counter()
        for r in rows:
            if r["text"]:
                for w in r["text"].split(" "):
                    ref_counts[(r["lang"], w)] += 1
        ref = pd.DataFrame(
            [
                {"lang": lang, "word": w, "freq": c}
                for (lang, w), c in ref_counts.items()
            ]
        )
        ref = ref.sort_values(
            ["lang", "freq", "word"], ascending=[True, False, True]
        )
        ref = ref.groupby("lang", sort=True).head(5).reset_index(drop=True)

        for blocks in (1, 7):
            out = (
                zipf_head(
                    ray.data.from_pandas(df).repartition(blocks), k=5
                )
                .to_pandas()
                .sort_values(["lang", "rank"])
                .reset_index(drop=True)
            )
            assert list(out.lang) == list(ref.lang)
            assert list(out.word) == list(ref.word)
            assert list(out.freq) == list(ref.freq)
            assert all(
                list(sub["rank"]) == list(range(len(sub)))
                for _, sub in out.groupby("lang")
            )


class TestHapaxStats:
    def test_hand_corpus(self, ray_session):
        """Hand-computable corpus: distinct/hapax/token counts exact,
        split(' ') semantics (runs of spaces yield empty tokens)."""
        import ray.data

        from topicrawler_ray.stages.ranking import hapax_stats

        rows = [
            {"lang": "en", "text": "a b a"},
            {"lang": "en", "text": "b  c"},  # double space -> '' token
            {"lang": "de", "text": "x"},
            {"lang": "de", "text": ""},  # contributes nothing
        ]
        for blocks in (1, 3):
            out = (
                hapax_stats(ray.data.from_items(rows).repartition(blocks))
                .to_pandas()
                .sort_values("lang")
                .reset_index(drop=True)
            )
            # en: words a(2) b(2) c(1) ''(1) -> 4 distinct, 2 hapax, 6 tokens
            # de: x(1) -> 1 distinct, 1 hapax, 1 token
            assert out.to_dict("records") == [
                {"lang": "de", "n_distinct": 1, "n_hapax": 1, "n_tokens": 1},
                {"lang": "en", "n_distinct": 4, "n_hapax": 2, "n_tokens": 6},
            ]


class TestCharTrigramHead:
    def test_hand_corpus_and_ties(self, ray_session):
        """Windowed trigram counts with (freq DESC, trigram ASC) ranks,
        partition-invariant."""
        import ray.data

        from topicrawler_ray.stages.ranking import char_trigram_head

        rows = [
            {"lang": "en", "text": "abcabc"},  # abc,bca,cab,abc
            {"lang": "en", "text": "ab"},  # too short
            {"lang": "de", "text": "zzzz"},  # zzz x2
        ]
        for blocks in (1, 3):
            out = (
                char_trigram_head(
                    ray.data.from_items(rows).repartition(blocks), k=2
                )
                .to_pandas()
                .sort_values(["lang", "rank"])
                .reset_index(drop=True)
            )
            assert out.to_dict("records") == [
                {"lang": "de", "trigram": "zzz", "freq": 2, "rank": 0},
                {"lang": "en", "trigram": "abc", "freq": 2, "rank": 0},
                {"lang": "en", "trigram": "bca", "freq": 1, "rank": 1},
            ]

    def test_nul_slow_path_and_unicode(self, ray_session):
        """Texts containing NUL take the per-text slow path; both paths
        agree and non-BMP codepoints pack losslessly."""
        import ray.data

        from topicrawler_ray.stages.ranking import char_trigram_head

        rows = [
            {"lang": "x", "text": "q\x00abcd"},  # NUL: windows qNa,Nab excluded? NO:
            # slow path counts ALL windows incl. those containing NUL
            {"lang": "x", "text": "abcd"},
            {"lang": "y", "text": "\U0001F600\U0001F601\U0001F602"},
        ]
        out = (
            char_trigram_head(ray.data.from_items(rows), k=10)
            .to_pandas()
            .sort_values(["lang", "rank"])
            .reset_index(drop=True)
        )
        x = out[out.lang == "x"]
        # fast text: abc,bcd; slow text windows: q\0a, \0ab, abc, bcd
        assert dict(zip(x.trigram, x.freq))["abc"] == 2
        assert dict(zip(x.trigram, x.freq))["bcd"] == 2
        assert dict(zip(x.trigram, x.freq))["q\x00a"] == 1
        y = out[out.lang == "y"]
        assert list(y.trigram) == ["\U0001F600\U0001F601\U0001F602"]
        assert list(y.freq) == [1]
