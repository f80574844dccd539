"""CDC chunking: vectorized gear hash equals the sequential
recurrence, boundary invariants, shift-robust dedup."""

import numpy as np
import pandas as pd

from topicrawler_ray.stages.cdc import (
    cdc_boundaries,
    chunk_doc,
    gear_hashes,
)

_GEAR = pd.util.hash_array(np.arange(256, dtype=np.int64)).tolist()


def _seq_hashes(data: bytes) -> list[int]:
    h, out = 0, []
    for b in data:
        h = ((h << 1) + _GEAR[b]) & 0xFFFFFFFFFFFFFFFF
        out.append(h)
    return out


class TestGearHash:
    def test_vectorized_equals_recurrence(self):
        data = bytes(range(256)) * 3 + b"hello world, hello world"
        assert gear_hashes(data).tolist() == _seq_hashes(data)

    def test_short_input(self):
        data = b"ab"
        assert gear_hashes(data).tolist() == _seq_hashes(data)
        assert gear_hashes(b"").tolist() == []


class TestBoundaries:
    def test_cover_and_bounds(self):
        data = b"x" * 10_000
        cuts = cdc_boundaries(data, mask=0x3F, min_size=16, max_size=256)
        assert cuts[-1] == len(data)
        prev = 0
        for c in cuts[:-1]:
            assert 16 <= c - prev <= 256
            prev = c
        # last chunk only has the upper bound
        assert cuts[-1] - (cuts[-2] if len(cuts) > 1 else 0) <= 256

    def test_shift_robustness(self):
        # identical payload after different prefixes chunks identically
        # past the first window
        payload = bytes(np.random.RandomState(3).randint(0, 256, 4000, dtype=np.uint8).tolist())
        a = chunk_doc(("A" * 7) + payload.decode("latin-1"), mask=0x1F)
        b = chunk_doc(("B" * 19) + payload.decode("latin-1"), mask=0x1F)
        # most chunks of the shared payload coincide
        inter = set(a) & set(b)
        assert len(inter) >= min(len(a), len(b)) * 0.5

    def test_empty_doc_no_chunks(self):
        assert chunk_doc("") == []


class TestCdcDedup:
    def test_duplicate_passage_marked(self, ray_session):
        import ray.data

        from topicrawler_ray.stages.cdc import cdc_dedup

        rng = np.random.RandomState(11)
        words = ["w%04d" % i for i in rng.randint(0, 10_000, 600)]
        passage = " ".join(words)  # non-repetitive shared payload
        docs = ray.data.from_items(
            [
                {"doc_id": 0, "text": passage},
                {"doc_id": 1, "text": "intro words here. " + passage},
            ]
        ).repartition(2)
        rows = cdc_dedup(docs, min_size=8, max_size=64, mask=0xF).take_all()
        dup_1 = [r for r in rows if r["doc_id"] == 1 and not r["keep"]]
        n1 = sum(1 for r in rows if r["doc_id"] == 1)
        # doc 1 shares most chunks with doc 0 -> majority marked dup
        assert len(dup_1) >= n1 * 0.5
        # the unique payload means doc 0 keeps everything
        assert all(r["keep"] for r in rows if r["doc_id"] == 0)


class TestPackOwnerGuards:
    def test_valid_pack(self):
        import pyarrow as pa

        from topicrawler_ray.stages.cdc import _IDX_BITS, pack_owner

        out = pack_owner(
            pa.chunked_array([pa.array([0, 5], pa.int64())]),
            pa.chunked_array([pa.array([3, 7], pa.int64())]),
        )
        assert out.to_pylist() == [3, 5 * (1 << _IDX_BITS) + 7]

    def test_chunk_idx_overflow_raises(self):
        import pyarrow as pa
        import pytest

        from topicrawler_ray.stages.cdc import _IDX_BITS, pack_owner

        with pytest.raises(OverflowError, match="chunk_idx"):
            pack_owner(
                pa.array([1], pa.int64()),
                pa.array([1 << _IDX_BITS], pa.int64()),
            )

    def test_doc_id_overflow_raises(self):
        import pyarrow as pa
        import pytest

        from topicrawler_ray.stages.cdc import _IDX_BITS, pack_owner

        with pytest.raises(OverflowError, match="doc_id"):
            pack_owner(
                pa.array([1 << (63 - _IDX_BITS)], pa.int64()),
                pa.array([0], pa.int64()),
            )
        with pytest.raises(OverflowError, match="doc_id"):
            pack_owner(pa.array([-1], pa.int64()), pa.array([0], pa.int64()))
