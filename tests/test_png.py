"""Stdlib PNG codec tests (functions/png.py; no Ray needed).

The decoder is REAL in this container (zlib inflate + scanline
unfilter), so the image path of the multimodal stages is exercised with
actual pixels, not the checksum stub.
"""

import struct
import zlib

import numpy as np
import pytest

from topicrawler_ray.functions.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    is_png,
    png_info,
)


def _plaid(h, w, ch=3, seed=7):
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    cs = np.arange(ch, dtype=np.int64)[None, None, :]
    return ((ys * 7 + xs * 3 + cs * 31 + seed) % 256).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1, 3), (5, 9, 3), (16, 16, 1),
                                       (7, 3, 4), (4, 6, 2), (64, 120, 3)])
    def test_encode_decode_identity(self, shape):
        img = _plaid(*shape)
        data = encode_png(img)
        assert is_png(data)
        out = decode_png(data)
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_grayscale_2d_input(self):
        img = _plaid(6, 8, 1)[:, :, 0]
        out = decode_png(encode_png(img))
        assert out.shape == (6, 8, 1)
        assert np.array_equal(out[:, :, 0], img)

    def test_info(self):
        img = _plaid(12, 34, 3)
        w, h, depth, color = png_info(encode_png(img))
        assert (w, h, depth, color) == (34, 12, 8, 2)


def _manual_png(width, height, ch, rows_with_filters):
    """Build a PNG whose raw stream uses explicit per-row filter types
    (the encoder only emits filter 0; the decoder must reverse all 5)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = b"".join(bytes([f]) + bytes(r) for f, r in rows_with_filters)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestFilters:
    """Hand-computed unfiltering goldens per RFC 2083 par.6."""

    def test_sub_filter(self):
        # raw deltas 10,20,30 -> reconstructed 10,30,60 per channel stride 1
        data = _manual_png(3, 1, 1, [(1, [10, 20, 30])])
        out = decode_png(data)
        assert out[:, :, 0].tolist() == [[10, 30, 60]]

    def test_up_filter(self):
        data = _manual_png(3, 2, 1, [(0, [5, 6, 7]), (2, [10, 20, 30])])
        out = decode_png(data)
        assert out[:, :, 0].tolist() == [[5, 6, 7], [15, 26, 37]]

    def test_average_filter(self):
        # row0: none [2, 4]; row1 avg: x0: 10+((0+2)//2)=11; x1: 10+((11+4)//2)=17
        data = _manual_png(2, 2, 1, [(0, [2, 4]), (3, [10, 10])])
        out = decode_png(data)
        assert out[:, :, 0].tolist() == [[2, 4], [11, 17]]

    def test_paeth_filter(self):
        # row0: [3, 9]; row1 paeth: x0 (a=0,b=3,c=0 -> p=3 -> pred=b=3): 1+3=4
        # x1 (a=4,b=9,c=3 -> p=10, pa=6,pb=1,pc=7 -> pred=b=9): 2+9=11
        data = _manual_png(2, 2, 1, [(0, [3, 9]), (4, [1, 2])])
        out = decode_png(data)
        assert out[:, :, 0].tolist() == [[3, 9], [4, 11]]

    def test_wraparound_arithmetic(self):
        data = _manual_png(2, 1, 1, [(1, [200, 100])])  # 200, (100+200)%256=44
        out = decode_png(data)
        assert out[:, :, 0].tolist() == [[200, 44]]

    def test_mixed_filters_multichannel(self):
        img = _plaid(9, 7, 3, seed=3)
        # re-encode with alternating filters by brute force: filter the
        # reference scanlines manually (Sub and Up), then decode
        stride = 7 * 3
        flat = img.reshape(9, stride).astype(np.int64)
        rows = []
        for y in range(9):
            f = (y % 3)
            cur = flat[y]
            prev = flat[y - 1] if y else np.zeros(stride, dtype=np.int64)
            if f == 0:
                rows.append((0, cur.astype(np.uint8).tolist()))
            elif f == 1:
                left = np.concatenate((np.zeros(3, dtype=np.int64), cur[:-3]))
                rows.append((1, ((cur - left) % 256).astype(np.uint8).tolist()))
            else:
                rows.append((2, ((cur - prev) % 256).astype(np.uint8).tolist()))
        data = _manual_png(7, 9, 3, rows)
        assert np.array_equal(decode_png(data), img)


class TestHonestGaps:
    def test_interlaced_raises(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)

        def chunk(ctype, d):
            return (
                struct.pack(">I", len(d)) + ctype + d
                + struct.pack(">I", zlib.crc32(ctype + d) & 0xFFFFFFFF)
            )

        data = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="interlaced"):
            decode_png(data)

    def test_16bit_raises(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)

        def chunk(ctype, d):
            return (
                struct.pack(">I", len(d)) + ctype + d
                + struct.pack(">I", zlib.crc32(ctype + d) & 0xFFFFFFFF)
            )

        data = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
        with pytest.raises(NotImplementedError, match="8-bit"):
            decode_png(data)

    def test_not_png_raises(self):
        with pytest.raises(ValueError):
            png_info(b"JFIF not a png at all")
        assert not is_png(b"JFIF not a png at all")


class TestStageIntegration:
    def test_stage_decodes_real_png(self):
        """media_features path with codec='png': exact pixel stats of a
        known image through the actor kernel."""
        import pyarrow as pa

        from topicrawler_ray.stages.multimodal import ImageDecodeStage

        img = np.full((16, 16, 3), 77, dtype=np.uint8)
        img[:8] = 20  # top half darker: mean = (20+77)/2 = 48.5
        stage = ImageDecodeStage(target_size=8, codec="png")
        batch = pa.table(
            {
                "media_id": pa.array([1], pa.int64()),
                "media_type": pa.array(["image/png"], pa.string()),
                "payload": pa.array([encode_png(img)], pa.binary()),
                "width": pa.array([16], pa.int32()),
                "height": pa.array([16], pa.int32()),
            }
        )
        out = stage(batch)
        assert out.column("pixel_mean").to_pylist() == [48.5]
        thumb = np.array(out.column("thumb").to_pylist()[0]).reshape(8, 8, 3)
        assert set(np.unique(thumb)) == {20, 77}

    def test_auto_codec_uses_stdlib_png(self):
        from topicrawler_ray.stages.multimodal import ImageDecodeStage

        stage = ImageDecodeStage(target_size=4, codec="auto")
        img = _plaid(8, 8, 3)
        arr = stage._decode(encode_png(img), 8, 8)
        # nearest sampling at (i*8)//4 = 0,2,4,6
        assert np.array_equal(arr, img[::2, ::2])

    def test_synthesizer_emits_real_pngs(self):
        import pyarrow as pa

        from topicrawler_ray.stages.multimodal import synthesize_media_batch

        docs = pa.table({"doc_id": pa.array([0, 3, 6], pa.int64())})
        media = synthesize_media_batch(docs)
        for payload, w, h in zip(
            media.column("payload").to_pylist(),
            media.column("width").to_pylist(),
            media.column("height").to_pylist(),
        ):
            assert is_png(payload)
            arr = decode_png(payload)
            assert arr.shape == (h, w, 3)


class TestPerceptualHash:
    def test_dhash_known_gradient(self):
        """Hand-checkable dHash: a pure left-to-right gradient has every
        row-difference positive -> all 64 bits set; a constant image has
        none."""
        import numpy as np

        from topicrawler_ray.stages.multimodal import ahash_i64, dhash_i64

        w = h = 16
        grad = np.repeat(
            np.arange(0, 16 * w, 16, dtype=np.uint8)
            .clip(0, 255)[None, :]
            .reshape(1, w),
            h,
            axis=0,
        )[:, :, None].repeat(3, axis=2)
        assert dhash_i64(grad) == (2**64 - 1) - (1 << 63)
        flat = np.full((h, w, 3), 7, dtype=np.uint8)
        assert dhash_i64(flat) == 0 - (1 << 63)
        # aHash of a constant image: no pixel exceeds the mean
        assert ahash_i64(flat) == 0 - (1 << 63)

    def test_phash_png_roundtrip_matches_direct(self):
        """Hash of decode(encode(img)) equals hash of img (the PNG
        path is lossless for 8-bit RGB)."""
        import numpy as np

        from topicrawler_ray.functions.png import decode_png, encode_png
        from topicrawler_ray.stages.multimodal import ahash_i64, dhash_i64

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8)
        rt = decode_png(encode_png(img))
        assert dhash_i64(rt) == dhash_i64(img)
        assert ahash_i64(rt) == ahash_i64(img)
