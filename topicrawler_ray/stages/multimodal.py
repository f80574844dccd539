"""Multimodal column stages - real Ray plumbing, stubbed codecs.

Images / audio / video are carried as opaque ``binary`` columns with
typed metadata (``media_type``, ``width``/``height`` etc.).  The decode
and feature kernels would use PIL / ffmpeg / torchvision - none of which
exist in this container - so the codec step is either a clearly marked
``NotImplementedError`` or a deterministic fake, while the Ray-side
plumbing (schema, actor-pool signature, batch sizing for large binary
payloads, output layout) is real and tested.

Batch-size guidance: binary payloads make rows wide - callers should
pass small ``batch_size`` (e.g. 16-64) and let block splitting keep
blocks under ``target_max_block_size``.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import murmur3_x64_128

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image/png, audio/wav, ...
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_batch(doc_batch: pa.Table) -> pa.Table:
    """Deterministic fake media rows derived from a documents batch -
    fixture input for the multimodal stages (payload = seeded bytes)."""
    ids = doc_batch.column("doc_id").to_pylist()
    o_id, o_type, o_payload, o_w, o_h, o_d = [], [], [], [], [], []
    for i in ids:
        kind = ("image/png", "audio/wav", "video/mp4")[i % 3]
        h1, h2 = murmur3_x64_128(b"media-%d" % i)
        payload = (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")) * (8 + i % 8)
        o_id.append(i)
        o_type.append(kind)
        o_payload.append(payload)
        o_w.append(64 + (i % 16) * 8 if kind.startswith("image") else 0)
        o_h.append(64 + (i % 8) * 8 if kind.startswith("image") else 0)
        o_d.append(1000 + (i % 30) * 500 if not kind.startswith("image") else 0)
    return pa.table(
        {
            "media_id": pa.array(o_id, pa.int64()),
            "media_type": pa.array(o_type, pa.string()),
            "payload": pa.array(o_payload, pa.binary()),
            "width": pa.array(o_w, pa.int32()),
            "height": pa.array(o_h, pa.int32()),
            "duration_ms": pa.array(o_d, pa.int32()),
        }
    )


class ImageDecodeStage:
    """Actor-pool stage: decode + resize images.

    Codec selection (``codec``):

    * ``"stub"`` (default, and what the deterministic fixtures use):
      derives an 8x8 "thumbnail" checksum grid from the payload bytes.
    * ``"pil"``: REAL decode via PIL (``Image.open -> convert("RGB") ->
      resize``) - raises ``ImportError`` where the codec belongs when
      PIL is absent (it is not in this container; the real path is
      covered by a skip-marked test).
    * ``"auto"``: PIL when importable, stub otherwise.

    ``fake=False`` is the legacy spelling of ``codec="pil"``.  Either
    way the import happens ONCE per actor in ``__init__``, never per
    batch."""

    def __init__(self, target_size: int = 8, fake: bool = True,
                 codec: str | None = None):
        self.target_size = target_size
        if codec is None:
            codec = "stub" if fake else "pil"
        self.codec = codec
        self._pil = None
        if codec in ("pil", "auto"):
            try:
                from PIL import Image

                self._pil = Image
            except ImportError:
                if codec == "pil":
                    raise NotImplementedError(
                        "image decode requires PIL (not in this container)"
                    )

    def _decode(self, payload: bytes, width: int, height: int):
        import numpy as np

        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.target_size, self.target_size))
            return np.asarray(img, dtype=np.uint8)
        h = np.frombuffer(
            (payload * ((self.target_size**2 * 3) // max(1, len(payload)) + 1))[
                : self.target_size**2 * 3
            ],
            dtype=np.uint8,
        )
        return h.reshape(self.target_size, self.target_size, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        thumbs = []
        means = []
        for payload, w, h, mt in zip(
            batch.column("payload").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if not mt.startswith("image"):
                thumbs.append(None)
                means.append(None)
                continue
            arr = self._decode(payload, w, h)
            thumbs.append(arr.reshape(-1).tolist())
            means.append(float(np.mean(arr)))
        return batch.append_column(
            "thumb", pa.array(thumbs, pa.list_(pa.uint8()))
        ).append_column("pixel_mean", pa.array(means, pa.float64()))


class AudioFeatureStage:
    """Actor-pool stage: frame-level audio features (STUB codec).

    Emits one row of fake frame energies per 100ms of ``duration_ms`` -
    the real implementation would decode PCM and compute RMS/mel frames.
    """

    def __init__(self, frame_ms: int = 100, fake: bool = True):
        self.frame_ms = frame_ms
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload, dur, mt in zip(
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if not mt.startswith("audio"):
                feats.append(None)
                continue
            if not self.fake:
                raise NotImplementedError("audio decode requires ffmpeg")
            n_frames = max(1, dur // self.frame_ms)
            feats.append(
                [((payload[i % len(payload)]) / 255.0) for i in range(n_frames)]
            )
        return batch.append_column("frame_energy", pa.array(feats, pa.list_(pa.float64())))


class VideoFrameSampleStage:
    """Actor-pool stage: sample every Nth frame (STUB codec) - emits
    frame indices + fake frame hashes."""

    def __init__(self, every_ms: int = 1000, fake: bool = True):
        self.every_ms = every_ms
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        samples = []
        for payload, dur, mt in zip(
            batch.column("payload").to_pylist(),
            batch.column("duration_ms").to_pylist(),
            batch.column("media_type").to_pylist(),
        ):
            if not mt.startswith("video"):
                samples.append(None)
                continue
            if not self.fake:
                raise NotImplementedError("video decode requires ffmpeg")
            idxs = list(range(0, max(1, dur), self.every_ms))
            samples.append(
                [murmur3_x64_128(payload + i.to_bytes(4, "little"))[0] % (1 << 31) for i in idxs]
            )
        return batch.append_column("frame_hashes", pa.array(samples, pa.list_(pa.int64())))
