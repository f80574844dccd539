"""Property-based tests (hypothesis) for the invariants the ports rely on."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from topicrawler_ray.functions.sentences import split_segments
from topicrawler_ray.functions.strings import format_g12, java_trim
from topicrawler_ray.functions.tokenizer import tokenize
from topicrawler_ray.state.seen import CuckooFilter, SeenShardState

# text without NUL (Java's `while (cp > 0)` truncates at NUL by spec)
_text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", max_codepoint=0xFFFF),
    max_size=300,
)


class TestTokenizerProperties:
    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_segments_reconstruct_input(self, s):
        toks = tokenize(s)
        assert "".join(t for t, _ in toks) == s

    @given(_text)
    @settings(max_examples=100, deadline=None)
    def test_deterministic(self, s):
        assert tokenize(s) == tokenize(s)


class TestSplitterProperties:
    @given(_text)
    @settings(max_examples=150, deadline=None)
    def test_segments_reconstruct_input(self, s):
        segs = split_segments(s)
        assert "".join(seg for seg, _ in segs) == s


class TestFormatG12:
    @given(st.floats(allow_nan=False, allow_infinity=False, width=64))
    @settings(max_examples=300, deadline=None)
    def test_width_and_parse_roundtrip(self, x):
        out = format_g12(x)
        assert len(out) >= 12
        # the string the prioritizer parses must round-trip to within
        # 6-significant-digit precision
        v = float(out)
        if x != 0:
            assert math.isclose(v, x, rel_tol=1e-5)
        else:
            assert v == 0

    @given(st.floats(min_value=2e-4, max_value=9e5))
    @settings(max_examples=200, deadline=None)
    def test_fixed_range_has_no_exponent(self, x):
        # (the rounding boundaries 1e-4 / 1e6 flip to scientific exactly
        # like Java's post-rounding magnitude check)
        assert "e" not in format_g12(x)


class TestJavaTrim:
    @given(_text)
    @settings(max_examples=200, deadline=None)
    def test_trims_only_low_codepoints(self, s):
        out = java_trim(s)
        if out:
            assert ord(out[0]) > 0x20 and ord(out[-1]) > 0x20
        assert out in s or out == ""


class TestCuckooFilter:
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, keys):
        f = CuckooFilter(capacity=4096)
        for k in keys:
            assert f.add(k)
        for k in keys:
            assert f.contains(k)

    @given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=200, unique=True))
    @settings(max_examples=50, deadline=None)
    def test_shard_state_first_wins(self, keys):
        st_ = SeenShardState(capacity=4096)
        first = st_.test_and_add(keys)
        assert all(first)
        second = st_.test_and_add(keys)
        assert not any(second)


class TestBloomFilter:
    @given(st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=300))
    @settings(max_examples=50, deadline=None)
    def test_no_false_negatives(self, keys):
        from topicrawler_ray.state.seen import BloomFilter

        f = BloomFilter(capacity=4096)
        for k in keys:
            assert f.add(k)
        for k in keys:
            assert f.contains(k)

    def test_fp_rate_bounded(self):
        import numpy as np

        from topicrawler_ray.state.seen import BloomFilter

        f = BloomFilter(capacity=1 << 16)
        rng = np.random.default_rng(17)
        present = rng.integers(0, 1 << 62, size=40000, dtype=np.int64)
        f.add_many(present)
        absent = rng.integers(0, 1 << 62, size=20000, dtype=np.int64)
        present_set = set(present.tolist())
        hits = f.contains_many(absent)
        fp = sum(
            1 for k, h in zip(absent.tolist(), hits) if h and k not in present_set
        )
        assert fp / len(absent) < 0.02, fp / len(absent)

    def test_batch_path_first_wins_with_intra_batch_dups(self):
        st_ = SeenShardState(capacity=4096, keep_exact=False, filter_kind="bloom")
        out = st_.test_and_add([5, 9, 5, 7, 9, 5])
        assert out == [True, True, False, True, False, False]
        assert st_.test_and_add([5, 9, 7]) == [False, False, False]

    def test_snapshot_restore_roundtrip(self):
        st_ = SeenShardState(capacity=4096, keep_exact=False, filter_kind="bloom")
        st_.test_and_add(list(range(100)))
        st2 = SeenShardState.restore(st_.snapshot())
        assert st2.filter_kind == "bloom"
        assert st2.test_and_add(list(range(100))) == [False] * 100
        assert st2.test_and_add([12345]) == [True]


class TestCuckooFalsePositiveRate:
    def test_fp_rate_bounded(self):
        import numpy as np

        f = CuckooFilter(capacity=1 << 16)
        rng = np.random.default_rng(17)
        present = rng.integers(0, 1 << 62, size=40000, dtype=np.int64).tolist()
        for k in present:
            f.add(int(k))
        absent = rng.integers(0, 1 << 62, size=20000, dtype=np.int64).tolist()
        present_set = set(present)
        fp = sum(1 for k in absent if int(k) not in present_set and f.contains(int(k)))
        rate = fp / len(absent)
        assert rate < 0.05, rate
