"""Multimodal column stages - real Ray plumbing; codecs real where a
pure-stdlib decode exists, honest stubs otherwise.

Images / audio / video are carried as opaque ``binary`` columns with
typed metadata (``media_type``, ``width``/``height`` etc.).  Codec
status per modality:

* image: REAL via PIL when importable (``codec="pil"``/``"auto"``),
  stub otherwise (PIL is not in this container),
* audio: REAL for RIFF/WAVE PCM via stdlib ``wave`` + numpy RMS
  (``codec="wav"``/``"auto"``); compressed formats raise a clearly
  marked ``NotImplementedError`` (ffmpeg absent),
* video: REAL for uncompressed YUV4MPEG2 via a pure-Python parser
  (``codec="y4m"``/``"auto"``); compressed containers raise.

The deterministic stub remains the default (and what the frozen oracle
fixtures use) so fixture content never depends on optional libraries;
the Ray-side plumbing (schema, actor-pool signature, batch sizing for
large binary payloads, output layout) is identical on every path.

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
    import numpy as np

    from ..functions.png import encode_png

    ids = doc_batch.column("doc_id").to_pylist()
    o_id, o_type, o_payload, o_w, o_h, o_d = [], [], [], [], [], []
    for i in ids:
        kind = ("image/png", "audio/wav", "video/mp4")[i % 3]
        h1, h2 = murmur3_x64_128(b"media-%d" % i)
        w = 64 + (i % 16) * 8 if kind.startswith("image") else 0
        h = 64 + (i % 8) * 8 if kind.startswith("image") else 0
        if kind.startswith("image"):
            # REAL deterministic PNG: hash-seeded plaid gradient (no RNG)
            ys = np.arange(h, dtype=np.int64)[:, None]
            xs = np.arange(w, dtype=np.int64)[None, :]
            img = np.stack(
                [
                    (ys * 7 + xs * 3 + (h1 % 251)) % 256,
                    (ys * 11 + xs * 5 + (h2 % 241)) % 256,
                    (ys * 13 + xs * 2 + ((h1 >> 32) % 239)) % 256,
                ],
                axis=2,
            ).astype(np.uint8)
            payload = encode_png(img)
        else:
            payload = (h1.to_bytes(8, "little") + h2.to_bytes(8, "little")) * (
                8 + i % 8
            )
        o_id.append(i)
        o_type.append(kind)
        o_payload.append(payload)
        o_w.append(w)
        o_h.append(h)
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

    * ``"auto"`` (default): REAL stdlib decode for PNG payloads
      (``functions.png.decode_png`` - zlib inflate + full scanline
      unfilter, no PIL needed); PIL for other formats when importable;
      the deterministic stub grid otherwise.
    * ``"png"``: stdlib PNG decode only (raises on non-PNG payloads).
    * ``"stub"``: derives an 8x8 "thumbnail" checksum grid from the
      payload bytes (pre-round-5 fixture behaviour).
    * ``"pil"``: decode via PIL (``Image.open -> convert("RGB") ->
      resize``) - raises the honest ``NotImplementedError`` when PIL is
      absent (it is not in this container).

    ``fake=True`` / ``fake=False`` are the legacy spellings of
    ``codec="stub"`` / ``codec="pil"``; resizing
    in the stdlib path is nearest-neighbour sampling at
    ``(i * dim) // target`` grid points (a deterministic spec, not an
    interpolation kernel).  Imports happen ONCE per actor in
    ``__init__``, never per batch."""

    def __init__(self, target_size: int = 8, fake: bool | None = None,
                 codec: str | None = None):
        self.target_size = target_size
        if codec is None:
            if fake is True:
                codec = "stub"
            elif fake is False:
                codec = "pil"
            else:
                codec = "auto"
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

    def _decode_stub(self, payload: bytes):
        import numpy as np

        h = np.frombuffer(
            (payload * ((self.target_size**2 * 3) // max(1, len(payload)) + 1))[
                : self.target_size**2 * 3
            ],
            dtype=np.uint8,
        )
        return h.reshape(self.target_size, self.target_size, 3)

    def _resize_nearest(self, arr):
        import numpy as np

        t = self.target_size
        h, w = arr.shape[:2]
        iy = (np.arange(t, dtype=np.int64) * h) // t
        ix = (np.arange(t, dtype=np.int64) * w) // t
        out = arr[iy][:, ix]
        if out.ndim == 2:
            out = out[:, :, None]
        if out.shape[2] == 1:
            out = np.repeat(out, 3, axis=2)
        elif out.shape[2] == 2:  # grey+alpha -> grey tripled (alpha dropped)
            out = np.repeat(out[:, :, :1], 3, axis=2)
        elif out.shape[2] == 4:  # RGBA -> RGB (alpha dropped)
            out = out[:, :, :3]
        return np.ascontiguousarray(out)

    def _decode(self, payload: bytes, width: int, height: int):
        import numpy as np

        from ..functions.png import decode_png, is_png

        if self.codec == "stub":
            return self._decode_stub(payload)
        if self.codec == "png" or (self.codec == "auto" and is_png(payload)):
            return self._resize_nearest(decode_png(payload))
        if self._pil is not None:
            import io

            img = self._pil.open(io.BytesIO(payload)).convert("RGB")
            img = img.resize((self.target_size, self.target_size))
            return np.asarray(img, dtype=np.uint8)
        return self._decode_stub(payload)

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


def decode_wav_pcm(payload: bytes):
    """REAL RIFF/WAVE PCM decode via stdlib ``wave`` - returns
    ``(samples float64 in [-1, 1] mono-mixed, sample_rate)``.  Raises
    ``ValueError`` on non-WAV payloads."""
    import io
    import wave

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        width = w.getsampwidth()
        nch = w.getnchannels()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif width == 4:
        samples = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError("unsupported PCM sample width %d" % width)
    if nch > 1:
        samples = samples[: len(samples) - len(samples) % nch]
        samples = samples.reshape(-1, nch).mean(axis=1)
    return samples, rate


def wav_frame_rms(payload: bytes, frame_ms: int) -> list[float]:
    """Per-frame RMS energy of a PCM WAV payload (vectorized numpy)."""
    import numpy as np

    samples, rate = decode_wav_pcm(payload)
    hop = max(1, (rate * frame_ms) // 1000)
    n_frames = max(1, -(-len(samples) // hop))
    pad = n_frames * hop - len(samples)
    if pad:
        samples = np.pad(samples, (0, pad))
    frames = samples.reshape(n_frames, hop)
    return np.sqrt((frames * frames).mean(axis=1)).tolist()


class AudioFeatureStage:
    """Actor-pool stage: frame-level audio features.

    Codec selection (``codec``):

    * ``"stub"`` (default; what the frozen fixtures use): fake frame
      energies derived from payload bytes, one per 100ms of
      ``duration_ms``.
    * ``"wav"``: REAL PCM decode via stdlib ``wave`` + vectorized RMS
      per ``frame_ms`` window (``wav_frame_rms``) - no external codec
      needed; non-WAV payloads raise.
    * ``"auto"``: real decode when the payload sniffs as RIFF/WAVE,
      stub otherwise.

    ``fake=False`` is the legacy spelling of the real path (now WAV
    rather than unconditionally NotImplemented; compressed formats
    such as mp3/ogg would still need ffmpeg and raise).
    """

    def __init__(self, frame_ms: int = 100, fake: bool = True,
                 codec: str | None = None):
        self.frame_ms = frame_ms
        if codec is None:
            codec = "stub" if fake else "wav"
        self.codec = codec

    def _features(self, payload: bytes, dur: int) -> list[float]:
        is_wav = payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        if self.codec == "wav" or (self.codec == "auto" and is_wav):
            if not is_wav:
                raise NotImplementedError(
                    "compressed audio decode requires ffmpeg (not in "
                    "this container); only RIFF/WAVE PCM is supported"
                )
            return wav_frame_rms(payload, self.frame_ms)
        n_frames = max(1, dur // self.frame_ms)
        return [((payload[i % len(payload)]) / 255.0) for i in range(n_frames)]

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
            feats.append(self._features(payload, dur))
        return batch.append_column("frame_energy", pa.array(feats, pa.list_(pa.float64())))


def parse_y4m(payload: bytes):
    """REAL YUV4MPEG2 parse (public uncompressed interchange format) -
    returns ``(width, height, fps, [frame_bytes, ...])``.  Header is
    space-separated ASCII params (``W<w> H<h> F<num>:<den> ...``); each
    frame is a ``FRAME``[params] line followed by the raw planar YUV
    payload (4:2:0 default, 4:2:2 / 4:4:4 via ``C`` param).  Raises
    ``ValueError`` on anything else."""
    if not payload.startswith(b"YUV4MPEG2 "):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\x0a")
    width = height = 0
    fps = 0.0
    csp = "420"
    for param in payload[10:nl].split(b" "):
        if not param:
            continue
        tag, val = param[:1], param[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / int(den)
        elif tag == b"C":
            csp = val.decode("ascii", "replace")
    if width <= 0 or height <= 0 or fps <= 0:
        raise ValueError("y4m header missing W/H/F")
    if csp.startswith("420"):
        frame_size = width * height + 2 * ((width // 2) * (height // 2))
    elif csp.startswith("422"):
        frame_size = width * height + 2 * ((width // 2) * height)
    elif csp.startswith("444"):
        frame_size = 3 * width * height
    else:
        raise ValueError("unsupported y4m colourspace %r" % csp)
    frames = []
    pos = nl + 1
    n = len(payload)
    while pos < n:
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError("malformed y4m FRAME marker at %d" % pos)
        fnl = payload.index(b"\x0a", pos)
        start = fnl + 1
        if start + frame_size > n:
            raise ValueError("truncated y4m frame at %d" % pos)
        frames.append(payload[start : start + frame_size])
        pos = start + frame_size
    return width, height, fps, frames


class VideoFrameSampleStage:
    """Actor-pool stage: sample every ``every_ms`` of video - emits
    per-sample frame hashes.

    Codec selection (``codec``):

    * ``"stub"`` (default; the frozen fixtures): fake hashes derived
      from the whole payload + sample index.
    * ``"y4m"``: REAL frame extraction from uncompressed YUV4MPEG2
      payloads (``parse_y4m``, pure Python - no ffmpeg needed); the
      hash of each sampled frame covers its actual pixel bytes.
      Compressed containers (mp4/webm) would need ffmpeg and raise.
    * ``"auto"``: y4m when the payload sniffs as YUV4MPEG2, stub
      otherwise.
    """

    def __init__(self, every_ms: int = 1000, fake: bool = True,
                 codec: str | None = None):
        self.every_ms = every_ms
        if codec is None:
            codec = "stub" if fake else "y4m"
        self.codec = codec

    def _hashes(self, payload: bytes, dur: int) -> list[int]:
        is_y4m = payload.startswith(b"YUV4MPEG2 ")
        if self.codec == "y4m" or (self.codec == "auto" and is_y4m):
            if not is_y4m:
                raise NotImplementedError(
                    "compressed video decode requires ffmpeg (not in "
                    "this container); only YUV4MPEG2 is supported"
                )
            _w, _h, fps, frames = parse_y4m(payload)
            out = []
            t_ms = 0.0
            total_ms = len(frames) * 1000.0 / fps
            while t_ms < total_ms:
                idx = min(len(frames) - 1, int(t_ms * fps / 1000.0))
                out.append(murmur3_x64_128(frames[idx])[0] % (1 << 31))
                t_ms += self.every_ms
            return out
        idxs = range(0, max(1, dur), self.every_ms)
        return [
            murmur3_x64_128(payload + i.to_bytes(4, "little"))[0] % (1 << 31)
            for i in idxs
        ]

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
            samples.append(self._hashes(payload, dur))
        return batch.append_column("frame_hashes", pa.array(samples, pa.list_(pa.int64())))


def _phash_grays(arr, grid_h: int, grid_w: int):
    """Integer-luma grayscale sampled on a (grid_h x grid_w) lattice at
    ``(i * dim) // grid`` points — the same deterministic
    nearest-neighbour spec as :class:`ImageDecodeStage` (a spec, not an
    interpolation kernel), so the sequential oracle can re-derive it
    from the synthetic plaid formula without touching the PNG codec."""
    import numpy as np

    h, w = arr.shape[:2]
    iy = (np.arange(grid_h, dtype=np.int64) * h) // grid_h
    ix = (np.arange(grid_w, dtype=np.int64) * w) // grid_w
    px = arr[iy][:, ix].astype(np.int64)
    if px.ndim == 2:
        r = g = b = px
    else:
        if px.shape[2] == 1:
            r = g = b = px[:, :, 0]
        elif px.shape[2] == 2:
            r = g = b = px[:, :, 0]
        else:
            r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    return (299 * r + 587 * g + 114 * b) // 1000


def _pack_bits_i64(bits) -> int:
    """Row-major MSB-first 64-bit pack, offset to signed int64."""
    v = 0
    for bit in bits.reshape(-1):
        v = (v << 1) | int(bit)
    return v - (1 << 63)


def dhash_i64(arr) -> int:
    """Difference hash (row-gradient sign over a 9x8 luma lattice) —
    the classic near-duplicate image fingerprint."""
    g = _phash_grays(arr, 8, 9)
    return _pack_bits_i64(g[:, 1:] > g[:, :-1])


def ahash_i64(arr) -> int:
    """Average hash (8x8 luma vs integer floor mean)."""
    g = _phash_grays(arr, 8, 8)
    mean = int(g.sum()) // 64
    return _pack_bits_i64(g > mean)


class PerceptualHashStage:
    """Actor-pool stage: per-image dHash + aHash over the REAL stdlib
    PNG decode path (functions/png.py; no PIL in this container).
    Non-image rows are dropped.  Stateless numpy per row; the hash
    columns are the bucketing keys an image near-dup join partitions
    on (the simhash-band discipline applied to pixels).
    """

    def __init__(self):
        from ..functions.png import decode_png, is_png

        self._decode = decode_png
        self._is_png = is_png

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id, o_d, o_a = [], [], []
        for mid, mt, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("media_type").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if not mt.startswith("image") or not self._is_png(payload):
                continue
            arr = self._decode(payload)
            o_id.append(mid)
            o_d.append(dhash_i64(arr))
            o_a.append(ahash_i64(arr))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "dhash": pa.array(o_d, pa.int64()),
                "ahash": pa.array(o_a, pa.int64()),
            }
        )


def phash_with_group_sizes(media_ds, concurrency: int = 2):
    """-> (media_id, dhash, ahash, dhash_group_size): hashes plus how
    many images share each dhash (the exact-duplicate bucket width).

    Scale shape: hashing is a stateless actor pool; the group size
    rides ONE groupby(dhash).map_groups over slim 3-int rows (Arrow
    output); no pairs are materialized — pairwise verification at scale
    happens per bucket downstream, as in the simhash stage.
    """
    hashed = media_ds.map_batches(
        PerceptualHashStage,
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )

    def size_group(g: pa.Table) -> pa.Table:
        return g.append_column(
            "dhash_group_size",
            pa.array([len(g)] * len(g), pa.int64()),
        )

    return hashed.groupby("dhash").map_groups(
        size_group, batch_format="pyarrow"
    )
