"""Multimodal columns: opaque binary payloads + typed metadata
(north-rule training-data ops).

Decode paths:
  * REAL pure-stdlib/numpy decoders for uncompressed formats —
    ``decode_image`` (PPM P6 + 24-bit BI_RGB BMP), ``decode_audio``
    (RIFF/WAV PCM, 8/16-bit, any channel count), ``decode_video``
    (concatenated P6 frames, evenly frame-sampled) — used when
    ``fake_decode=False``.
  * Compressed formats (JPEG/PNG/MP3/H.264) need codec libraries not in
    this container; those payloads raise ``ValueError`` with a clear
    message.  The deterministic fake codec (byte-statistics features)
    remains the default for SQL-mirrorable driver entries.

Design rules encoded here (for 100 TB media):
  * payloads are ``binary`` columns; batches are SMALL (``batch_size=16``
    default) so batch x concurrency fits worker heaps;
  * decode/feature stages are callable-class actor pools — decoder dispatch
    state is constructed once per actor, never per batch;
  * outputs carry (doc_id, media metadata, feature vector), never the raw
    payload, so downstream stages stay narrow.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.hashing import md5_hash64

MEDIA_SCHEMA = pa.schema([
    ("doc_id", pa.int64()),
    ("media_type", pa.string()),       # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("width", pa.int32()),             # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])

FEATURE_DIM = 16


def _ppm_tokens(buf: bytes, start: int, count: int) -> tuple[list[int], int]:
    """Read ``count`` whitespace-separated ASCII integers from a PPM header
    (``#`` comments run to end of line).  Returns (values, next offset)."""
    vals: list[int] = []
    i = start
    n = len(buf)
    while len(vals) < count:
        while i < n and buf[i:i + 1].isspace():
            i += 1
        if i < n and buf[i] == 0x23:            # '#': comment to EOL
            while i < n and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < n and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        vals.append(int(buf[i:j]))
        i = j
    return vals, i + 1                          # single whitespace after maxval


def _decode_ppm(payload: bytes, offset: int = 0
                ) -> tuple[np.ndarray, int]:
    """One binary PPM (P6) image starting at ``offset`` ->
    (H x W x 3 uint8 array, offset past the image)."""
    if payload[offset:offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    (w, h, maxval), data_at = _ppm_tokens(payload, offset + 2, 3)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    end = data_at + w * h * 3
    if end > len(payload):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                       offset=data_at).reshape(h, w, 3)
    return px, end


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP -> H x W x 3 uint8 (RGB order)."""
    import struct
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only 24-bit BI_RGB BMP supported (bpp={bpp}, "
                         f"compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3                   # rows padded to 4 bytes
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]   # BGR -> RGB
    return px[::-1] if bottom_up else px


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an uncompressed image payload (PPM P6 or 24-bit BMP) to an
    H x W x 3 uint8 array.  Compressed formats (JPEG/PNG) need codec
    libraries not present in this container and raise ValueError."""
    if payload[:2] == b"P6":
        return _decode_ppm(payload)[0]
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unsupported image format (PPM P6 and 24-bit BMP are decodable "
        "in-container; JPEG/PNG need an imaging library)")


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAV PCM payload -> (mono float64 samples in [-1, 1],
    sample_rate).  8-bit unsigned and 16-bit signed PCM, any channel count
    (channels are averaged).  Compressed audio raises ValueError."""
    import struct
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(payload):
        cid = payload[i:i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)              # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 16:
        s = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        s = (np.frombuffer(data, dtype=np.uint8).astype(np.float64)
             - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width: {bits}")
    if channels > 1:
        s = s[:len(s) - len(s) % channels].reshape(-1, channels).mean(axis=1)
    return s, sample_rate


MAX_VIDEO_FRAMES = 4


def decode_video(payload: bytes, *, max_frames: int = MAX_VIDEO_FRAMES
                 ) -> list[np.ndarray]:
    """Decode a concatenated-P6 'video' payload (frames back to back),
    evenly sampling at most ``max_frames`` frames — the frame-sample stage
    a real container parser would feed."""
    frames: list[np.ndarray] = []
    off = 0
    while off < len(payload) and payload[off:off + 2] == b"P6":
        px, off = _decode_ppm(payload, off)
        frames.append(px)
    if not frames:
        raise ValueError("no P6 frames in video payload")
    if len(frames) > max_frames:
        idx = np.linspace(0, len(frames) - 1, max_frames).round().astype(int)
        frames = [frames[i] for i in idx]
    return frames


def image_feature(px: np.ndarray) -> np.ndarray:
    """16-bin normalized luminance histogram of a decoded image."""
    lum = px.astype(np.uint16).sum(axis=2) // 3          # integer mean
    hist = np.bincount((lum >> 4).ravel().astype(np.int64),
                       minlength=16).astype(np.float64)[:16]
    return hist / hist.sum() if hist.sum() else hist


def audio_feature(samples: np.ndarray) -> np.ndarray:
    """16-frame RMS envelope, normalized (a tiny fbank stand-in)."""
    if len(samples) == 0:
        return np.zeros(FEATURE_DIM)
    frames = np.array_split(samples.astype(np.float64), FEATURE_DIM)
    rms = np.array([np.sqrt((f * f).mean()) if len(f) else 0.0
                    for f in frames])
    tot = rms.sum()
    return rms / tot if tot else rms


def _fake_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoder': 16-d feature from byte statistics
    (stable across runs/nodes; replaces a real CNN/fbank featurizer)."""
    if not payload:
        return np.zeros(FEATURE_DIM)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    return hist / hist.sum()


class MediaFeaturizer:
    """Actor-pool stage: (doc_id, payload) -> (doc_id, media_type, n_bytes,
    payload_hash, feature list<double>).  Decoder dispatch is built once per
    actor (the slot where a real CNN/fbank model would load)."""

    def __init__(self, *, fake_decode: bool = True):
        self._fake = fake_decode
        if not fake_decode:
            # per-actor decoder dispatch — real decode per media type
            self._decoders = {
                "image": lambda p: image_feature(decode_image(p)),
                "audio": lambda p: audio_feature(decode_audio(p)[0]),
                "video": lambda p: np.mean(
                    [image_feature(f) for f in decode_video(p)], axis=0),
            }

    def _feature(self, media_type: str, payload: bytes) -> np.ndarray:
        if self._fake:
            return _fake_feature(payload)
        return self._decoders[media_type](payload)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        feats = [self._feature(mt, p or b"").tolist()
                 for mt, p in zip(types, payloads)]
        # md5-lower-64 (== DuckDB md5_number_lower) so the whole stage is
        # SQL-mirrorable when payloads are text-derived
        hashes = [int(md5_hash64(p or b"") & 0x7FFFFFFFFFFFFFFF)
                  for p in payloads]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "media_type": batch.column("media_type"),
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "payload_hash": pa.array(hashes, pa.int64()),
            "feature": pa.array(feats, pa.list_(pa.float64())),
        })


def featurize_media(media: "ray.data.Dataset", *, batch_size: int = 16,
                    concurrency: int = 8, fake_decode: bool = True
                    ) -> "ray.data.Dataset":
    return media.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"fake_decode": fake_decode},
        batch_format="pyarrow",
        batch_size=batch_size,              # small: payloads are wide
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_from_documents(sf_dir: str, *, limit: int = 200) -> pa.Table:
    """Deterministic media payloads derived from the documents table
    (payload = utf8 text bytes) so the featurization stage has an ANSI-SQL
    oracle: n_bytes = octet_length, payload_hash = md5_number_lower & 2^63-1,
    feature = high-nibble histogram of the payload (= hex-string character
    counts at even positions)."""
    import os
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                      columns=["doc_id", "text"],
                      filters=[("doc_id", "<", limit)]).sort_by("doc_id")
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    types = [("image", "audio", "video")[d % 3] for d in doc_ids]
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array([(x or "").encode("utf-8") for x in texts],
                            pa.binary()),
        "width": pa.array([640 if mt != "audio" else 0 for mt in types],
                          pa.int32()),
        "height": pa.array([480 if mt != "audio" else 0 for mt in types],
                           pa.int32()),
        "duration_ms": pa.array(
            [500 + d % 59_500 if mt != "image" else 0
             for d, mt in zip(doc_ids, types)], pa.int32()),
    }, schema=MEDIA_SCHEMA)


def synth_ppm(width: int, height: int, *, seed: int = 42) -> bytes:
    """Deterministic binary PPM (P6) payload."""
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    return b"P6\n# synth\n%d %d\n255\n" % (width, height) + px.tobytes()


def synth_bmp(width: int, height: int, *, seed: int = 42) -> bytes:
    """Deterministic 24-bit bottom-up BI_RGB BMP payload."""
    import struct
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    # bottom-up storage, BGR order
    rows[:, :width * 3] = px[::-1, :, ::-1].reshape(height, width * 3)
    body = rows.tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


def synth_wav(n_samples: int, *, sample_rate: int = 8000, channels: int = 1,
              seed: int = 42) -> bytes:
    """Deterministic 16-bit PCM WAV payload."""
    import struct
    rng = np.random.default_rng(seed)
    s = rng.integers(-32768, 32768, size=n_samples * channels,
                     dtype=np.int16)
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def synth_video(width: int, height: int, n_frames: int, *,
                seed: int = 42) -> bytes:
    """Deterministic concatenated-P6 'video' payload."""
    return b"".join(synth_ppm(width, height, seed=seed + i)
                    for i in range(n_frames))


def synth_real_media_table(doc_ids: list[int], *, seed: int = 42) -> pa.Table:
    """Media table whose payloads are REAL decodable formats (PPM/BMP for
    image, WAV for audio, concatenated P6 for video) — drives the
    fake_decode=False path end to end."""
    types, payloads, w, h, d = [], [], [], [], []
    for i, doc_id in enumerate(doc_ids):
        mt = ("image", "audio", "video")[i % 3]
        types.append(mt)
        if mt == "image":
            payloads.append(synth_ppm(12, 9, seed=seed + i) if i % 2
                            else synth_bmp(11, 7, seed=seed + i))
            w.append(12 if i % 2 else 11)
            h.append(9 if i % 2 else 7)
            d.append(0)
        elif mt == "audio":
            payloads.append(synth_wav(800, channels=1 + i % 2,
                                      seed=seed + i))
            w.append(0)
            h.append(0)
            d.append(100)
        else:
            payloads.append(synth_video(8, 6, 6, seed=seed + i))
            w.append(8)
            h.append(6)
            d.append(200)
    return pa.table({
        "doc_id": pa.array(list(doc_ids), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(w, pa.int32()),
        "height": pa.array(h, pa.int32()),
        "duration_ms": pa.array(d, pa.int32()),
    }, schema=MEDIA_SCHEMA)


def synth_media_table(doc_ids: list[int], *, seed: int = 42) -> pa.Table:
    """Deterministic synthetic media payloads for plumbing tests."""
    rng = np.random.default_rng(seed)
    types, payloads, w, h, d = [], [], [], [], []
    for i, doc_id in enumerate(doc_ids):
        mt = ("image", "audio", "video")[i % 3]
        size = int(rng.integers(64, 4096))
        types.append(mt)
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8
                                     ).tobytes())
        w.append(640 if mt != "audio" else 0)
        h.append(480 if mt != "audio" else 0)
        d.append(int(rng.integers(500, 60_000)) if mt != "image" else 0)
    return pa.table({
        "doc_id": pa.array(list(doc_ids), pa.int64()),
        "media_type": pa.array(types, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(w, pa.int32()),
        "height": pa.array(h, pa.int32()),
        "duration_ms": pa.array(d, pa.int32()),
    }, schema=MEDIA_SCHEMA)
