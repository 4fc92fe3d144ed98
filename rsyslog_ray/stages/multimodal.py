"""Multimodal columns: opaque binary payloads + typed metadata, processed
by actor-pool map_batches stages.

Real image/audio/video libs are not in this container, so the DECODE step
is stubbed (deterministic fake derived from the payload bytes, or
NotImplementedError when strict=True) — but the Ray-side plumbing is real
and tested: schema (binary + struct metadata), actor signature (state in
__init__), batch sizing for large payloads, flat_map frame explosion,
partitioned output layout.

Design notes for 100 TB:
- payloads ride as `large_binary` Arrow columns — zero-copy through the
  object store, never decoded on the driver;
- decode/feature stages use SMALL batch_size (256 default) so
  batch × concurrency fits a worker heap even at MBs/payload;
- frame sampling is a flat_map (1 row → N frame rows) so downstream stages
  see plain rows and shard naturally.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_png(b: bytes) -> tuple[int, int, float]:
    """Pure-stdlib PNG decode → (width, height, mean_luma); see
    decode_png_pixels for the decoder itself."""
    w, h, luma = decode_png_pixels(b)
    return w, h, float(np.round(luma.mean(), 4))


def decode_png_pixels(b: bytes) -> tuple[int, int, "np.ndarray"]:
    """Pure-stdlib PNG decode (zlib inflate + scanline unfilter) →
    (width, height, luma plane as float64 (h, w)). Real values, no
    imaging libs.

    Supported subset (raises ValueError outside it): bit depth 8, color
    types 0 gray / 2 RGB / 4 gray+alpha / 6 RGBA, no interlace — exactly
    what the datagen fixture encoder emits. Filters 0-4 per the PNG spec;
    Sub reconstructs via per-channel cumsum (mod-256 addition is
    associative), Up is one vectorized add, Average/Paeth fall back to a
    per-byte loop on the rows that use them (their recurrence is on the
    reconstructed left neighbor). Luma: gray channel, or ITU-R BT.601
    0.299R + 0.587G + 0.114B; alpha ignored."""
    if not b.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    import zlib
    pos, idat = 8, []
    w = h = ct = None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos:pos + 4], "big")
        typ = b[pos + 4:pos + 8]
        data = b[pos + 8:pos + 8 + ln]
        pos += 12 + ln                      # 4 len + 4 type + data + 4 crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            bitd, ct, _comp, _filt, interlace = data[8:13]
            if bitd != 8 or ct not in (0, 2, 4, 6) or interlace:
                raise ValueError(
                    f"unsupported PNG (bitdepth={bitd} colortype={ct} "
                    f"interlace={interlace})")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    bpp = {0: 1, 2: 3, 4: 2, 6: 4}[ct]
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data length mismatch")
    rows = raw.reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:]
    # whole-image fast paths when every scanline uses the same
    # non-recurrent-in-both-axes filter (uint8 wraparound == mod 256):
    # None (identity), Sub (cumsum along x per channel), Up (cumsum
    # along y). Mixed / Average / Paeth images take the row loop.
    if (filters == 0).all():
        img = data
    elif (filters == 1).all():
        img = data.reshape(h, w, bpp).cumsum(axis=1, dtype=np.uint8) \
            .reshape(h, stride)
    elif (filters == 2).all():
        img = data.cumsum(axis=0, dtype=np.uint8)
    else:
        img = _unfilter_rows(rows, h, stride, bpp)
    px = img.reshape(h, w, bpp).astype(np.float64)
    if ct in (0, 4):
        luma = px[..., 0]
    else:
        luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    return w, h, luma


def _unfilter_rows(rows: "np.ndarray", h: int, stride: int,
                   bpp: int) -> "np.ndarray":
    """General per-scanline PNG unfilter (filters 0-4, spec order)."""
    img = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        f = rows[y, 0]
        cur = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 1:                        # Sub
            rec = cur.copy()
            for c0 in range(bpp):
                rec[c0::bpp] = np.cumsum(cur[c0::bpp]) % 256
        elif f == 2:                        # Up
            rec = (cur + prev) % 256
        elif f in (3, 4):                   # Average / Paeth
            # sequential recurrence on the reconstructed left neighbor:
            # run it over plain Python ints (lists) — numpy scalar
            # indexing/abs in this loop is ~5× slower per byte
            cl, pl = cur.tolist(), prev.tolist()
            rl = [0] * stride
            if f == 3:
                for i in range(stride):
                    a = rl[i - bpp] if i >= bpp else 0
                    rl[i] = (cl[i] + ((a + pl[i]) >> 1)) & 0xFF
            else:
                for i in range(stride):
                    a = rl[i - bpp] if i >= bpp else 0
                    u = pl[i]
                    c = pl[i - bpp] if i >= bpp else 0
                    pa_ = abs(u - c)            # |p-a| with p = a+u-c
                    pb_ = abs(a - c)
                    pc_ = abs(a + u - 2 * c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (u if pb_ <= pc_ else c)
                    rl[i] = (cl[i] + pred) & 0xFF
            rec = np.asarray(rl, np.int64)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        img[y] = rec
        prev = rec
    return img


def decode_wav(b: bytes) -> tuple[int, int, float, float]:
    """Pure-numpy WAV (RIFF/PCM) decode → (sample_rate, n_channels,
    duration_s, rms). Real values, no audio libs: walks RIFF chunks for
    fmt/data, supports PCM16 (format tag 1, bits 16) — exactly what the
    datagen fixture encoder emits; raises ValueError outside the subset.
    rms is computed over samples normalized to [-1, 1)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = nch = bits = None
    data = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        ln = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            nch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (format={tag} bits={bits})")
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data[: len(data) - (len(data) % 2)],
                            dtype="<i2").astype(np.float64) / 32768.0
    n_frames = len(samples) // nch if nch else 0
    dur = n_frames / rate if rate else 0.0
    rms = float(np.sqrt(np.mean(samples ** 2))) if len(samples) else 0.0
    return rate, nch, round(dur, 6), round(rms, 6)


class AudioDecodeStub:
    """Actor stage: binary payload → (sample_rate, n_channels,
    duration_s, rms). WAV payloads decode for REAL (decode_wav); other
    formats would need an audio lib (absent in this container) and fall
    back to a deterministic fake, or raise with strict=True."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def _decode(self, b: bytes) -> tuple[int, int, float, float]:
        if b[:4] == b"RIFF":
            return decode_wav(b)
        if self.strict:
            raise NotImplementedError(
                "non-WAV decode requires an audio lib; container has none")
        if not b:
            return 0, 0, 0.0, 0.0
        a = np.frombuffer(b, dtype=np.uint8)
        return 8000 + int(a[:4].sum()) % 40000, 1 + int(a[0]) % 2, \
            round(len(b) / 16000.0, 6), round(float(a.mean()) / 255.0, 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_bytes(batch, self.payload_col)
        r, c, d, m = zip(*(self._decode(b) for b in payloads)) if payloads \
            else ((), (), (), ())
        return (batch
                .append_column("sample_rate", pa.array(r, pa.int32()))
                .append_column("n_channels", pa.array(c, pa.int32()))
                .append_column("duration_s", pa.array(d, pa.float64()))
                .append_column("rms", pa.array(m, pa.float64())))


MEDIA_META_TYPE = pa.struct([
    ("media_type", pa.string()),     # image | audio | video
    ("format", pa.string()),         # png/jpeg/wav/mp4/... (claimed)
    ("n_bytes", pa.int64()),
])


def attach_media_meta(batch: pa.Table, payload_col: str = "payload",
                      media_type: str = "image",
                      fmt: str = "bin") -> pa.Table:
    """Add the typed metadata struct column for an opaque binary column."""
    n_bytes = pc.binary_length(batch[payload_col])
    n = batch.num_rows
    meta = pa.StructArray.from_arrays(
        [pa.array([media_type] * n), pa.array([fmt] * n),
         pc.cast(n_bytes, pa.int64()).combine_chunks()
         if isinstance(n_bytes, pa.ChunkedArray) else pc.cast(n_bytes, pa.int64())],
        fields=list(MEDIA_META_TYPE))
    return batch.append_column("media_meta", meta)


def _payload_bytes(batch: pa.Table, col: str) -> list[bytes]:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return [v if v is not None else b"" for v in arr.to_pylist()]


class ImageDecodeStub:
    """Actor stage: binary payload → (width, height, mean_luma).

    PNG payloads get a REAL decode (decode_png above — stdlib zlib, no
    imaging libs); other formats would use PIL.Image.open (imported once
    in __init__ when available — not in this container) and otherwise
    fall back to a DETERMINISTIC fake decode (dims/luma derived from the
    payload bytes) so the pipeline shape stays fully testable.
    strict=True: PNG still decodes; a non-PNG payload raises instead of
    faking."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict
        try:  # pragma: no cover - lib not in container
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False

    def _fake_decode(self, b: bytes) -> tuple[int, int, float]:
        if not b:
            return 0, 0, 0.0
        a = np.frombuffer(b, dtype=np.uint8)
        w = 16 + int(a[: 8].sum()) % 240
        h = 16 + int(a[-8:].sum()) % 240
        return w, h, float(np.round(a.mean(), 4))

    def _decode(self, b: bytes) -> tuple[int, int, float]:
        if b.startswith(_PNG_SIG):
            return decode_png(b)
        if self.strict:
            raise NotImplementedError(
                "non-PNG decode requires Pillow; container has none")
        return self._fake_decode(b)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_bytes(batch, self.payload_col)
        w, h, luma = zip(*(self._decode(b) for b in payloads)) if payloads \
            else ((), (), ())
        return (batch
                .append_column("width", pa.array(w, pa.int32()))
                .append_column("height", pa.array(h, pa.int32()))
                .append_column("mean_luma", pa.array(luma, pa.float64())))


class ResizeStub:
    """Actor stage: 'resize' to target box — real impl would transform the
    payload; the stub rescales the stub dims (aspect-preserving fit)."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(1.0, np.maximum(w, h)))
        return (batch
                .append_column("resized_w", pa.array((w * scale).astype(np.int32)))
                .append_column("resized_h", pa.array((h * scale).astype(np.int32))))


def sample_frames_table(batch: pa.Table, payload_col: str = "payload",
                        id_col: str = "doc_id", n_frames: int = 4) -> pa.Table:
    """'Video' frame sampling as an explode: 1 row → n_frames rows, each
    with a byte-range slice of the payload as the frame payload (stub for
    keyframe extraction). Output: (id, frame_idx, frame_payload)."""
    payloads = _payload_bytes(batch, payload_col)
    ids = batch[id_col].to_pylist()
    out_id, out_fi, out_fp = [], [], []
    for i, b in zip(ids, payloads):
        k = min(n_frames, max(1, len(b)))
        step = max(1, len(b) // k)
        for fi in range(k):
            out_id.append(i)
            out_fi.append(fi)
            out_fp.append(b[fi * step:(fi + 1) * step])
    return pa.table({
        id_col: pa.array(out_id),
        "frame_idx": pa.array(out_fi, pa.int32()),
        "frame_payload": pa.array(out_fp, pa.large_binary()),
    })


def image_features(ds, payload_col: str = "payload", concurrency=2,
                   batch_size: int = 256):
    """decode → resize feature pipeline over an opaque binary column."""
    ds = ds.map_batches(ImageDecodeStub, fn_constructor_args=(payload_col,),
                        batch_format="pyarrow", batch_size=batch_size,
                        concurrency=concurrency)
    return ds.map_batches(ResizeStub, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def dhash64(luma: "np.ndarray") -> int:
    """64-bit difference hash (dHash, Krawetz) of a luma plane: mean-pool
    to an 8×9 grid (np.add.reduceat over near-equal row/col segments),
    set bit (r, c) when cell (r, c) is brighter than its right neighbour.
    Perceptually stable: uniform brightness shifts, re-encodes and small
    blurs keep the hash; structural changes flip bits ∝ changed area."""
    h, w = luma.shape
    if h < 1 or w < 1:
        return 0
    # segment edges for 8 rows × 9 cols (degenerate dims repeat pixels)
    re_ = np.linspace(0, h, 9).astype(np.int64)[:-1] if h >= 8 else None
    ce_ = np.linspace(0, w, 10).astype(np.int64)[:-1] if w >= 9 else None
    if re_ is None or ce_ is None:
        # tiny image: index-resample to 8×9 instead of pooling
        ri = np.minimum((np.arange(8) * h) // 8, h - 1)
        ci = np.minimum((np.arange(9) * w) // 9, w - 1)
        g = luma[np.ix_(ri, ci)]
    else:
        pooled = np.add.reduceat(np.add.reduceat(luma, re_, axis=0),
                                 ce_, axis=1)
        rcnt = np.diff(np.append(re_, h)).astype(np.float64)
        ccnt = np.diff(np.append(ce_, w)).astype(np.float64)
        g = pooled / (rcnt[:, None] * ccnt[None, :])
    bits = (g[:, :-1] > g[:, 1:]).ravel()
    return int(np.packbits(bits).view(">u8")[0])


class ImageDHashStage:
    """Actor stage: binary payload → 64-bit perceptual dHash column
    (`dhash`, int64 view of the uint64). PNG payloads hash REAL decoded
    pixels (decode_png_pixels); non-PNG falls back to a deterministic
    byte-derived fake (strict=True raises instead) — same
    disclosure/fallback contract as ImageDecodeStub."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def _hash(self, b: bytes) -> int:
        if b.startswith(_PNG_SIG):
            _w, _h, luma = decode_png_pixels(b)
            return dhash64(luma)
        if self.strict:
            raise NotImplementedError(
                "non-PNG decode requires Pillow; container has none")
        if not b:
            return 0
        import hashlib
        return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(),
                              "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_bytes(batch, self.payload_col)
        hs = np.array([self._hash(b) for b in payloads],
                      dtype=np.uint64) if payloads else \
            np.array([], np.uint64)
        return batch.append_column("dhash",
                                   pa.array(hs.view(np.int64)))


def image_dedup(ds, payload_col: str = "payload", id_col: str = "doc_id",
                radius: int = 2, driver_threshold: int = 5_000_000,
                concurrency=None, batch_size: int = 256):
    """Perceptual image near-dup removal: actor-pool dHash over decoded
    pixels → the generic Hamming-radius signature dedup
    (dedup.hamming_dedup_signatures — Manku block bucketing, exact
    XOR-popcount verify, distributed connected components above the
    driver threshold). Keeps the smallest id per near-dup component.
    Re-encodes, uniform brightness shifts and small edits land within
    `radius` bits; distinct images are ~32 bits apart in expectation."""
    from .dedup import hamming_dedup_signatures
    sig_ds = ds.map_batches(
        ImageDHashStage(payload_col=payload_col),
        batch_format="pyarrow", batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {})
    ).select_columns([id_col, "dhash"])
    return hamming_dedup_signatures(ds, sig_ds, id_col=id_col,
                                    sig_col="dhash", radius=radius,
                                    driver_threshold=driver_threshold)


def decode_wav_samples(b: bytes) -> tuple[int, "np.ndarray"]:
    """RIFF/PCM16 WAV → (sample_rate, mono float64 samples in [-1, 1)) —
    the sample-level sibling of decode_wav (which returns scalars);
    multi-channel audio downmixes by mean."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, nch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        ln = int.from_bytes(b[pos + 4:pos + 8], "little")
        body = b[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"fmt ":
            tag = int.from_bytes(body[0:2], "little")
            nch = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (format={tag} bits={bits})")
        elif cid == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    x = np.frombuffer(data[: len(data) - (len(data) % 2)],
                      dtype="<i2").astype(np.float64) / 32768.0
    if nch > 1:
        x = x[: len(x) - (len(x) % nch)].reshape(-1, nch).mean(axis=1)
    return rate, x


def audio_fingerprint64(samples: "np.ndarray") -> int:
    """64-bit energy-difference audio fingerprint (the dHash idea on the
    time axis): mean segment energy over 65 near-equal windows, bit i set
    when segment i is louder than segment i+1. Gain-invariant (uniform
    amplitude scaling preserves every comparison), re-encode stable,
    structure-sensitive."""
    n = len(samples)
    if n == 0:
        return 0
    seg = 65
    if n < seg:
        samples = np.repeat(samples, -(-seg // n))[: max(seg, n)]
        n = len(samples)
    edges = np.linspace(0, n, seg + 1).astype(np.int64)[:-1]
    e = np.add.reduceat(samples.astype(np.float64) ** 2, edges)
    cnt = np.diff(np.append(edges, n)).astype(np.float64)
    e = e / cnt
    bits = e[:-1] > e[1:]
    return int(np.packbits(bits).view(">u8")[0])


class AudioFingerprintStage:
    """Actor stage: binary payload → 64-bit audio fingerprint column
    (`afp`, int64 view). WAV payloads fingerprint REAL decoded samples;
    non-WAV falls back to a deterministic byte-derived fake (strict=True
    raises) — the multimodal fallback contract."""

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        self.strict = strict

    def _fp(self, b: bytes) -> int:
        if b[:4] == b"RIFF":
            _rate, x = decode_wav_samples(b)
            return audio_fingerprint64(x)
        if self.strict:
            raise NotImplementedError(
                "non-WAV decode requires an audio lib; container has none")
        if not b:
            return 0
        import hashlib
        return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(),
                              "big")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_bytes(batch, self.payload_col)
        hs = np.array([self._fp(b) for b in payloads],
                      dtype=np.uint64) if payloads else \
            np.array([], np.uint64)
        return batch.append_column("afp", pa.array(hs.view(np.int64)))


def audio_dedup(ds, payload_col: str = "payload", id_col: str = "doc_id",
                radius: int = 2, driver_threshold: int = 5_000_000,
                concurrency=None, batch_size: int = 256):
    """Audio near-dup removal: actor-pool energy-difference fingerprints
    over decoded PCM16 samples → the generic Hamming-radius signature
    dedup (dedup.hamming_dedup_signatures). Gain-shifted copies and
    re-encodes land within `radius` bits; distinct signals are ~32 bits
    apart in expectation. Keeps the smallest id per component."""
    from .dedup import hamming_dedup_signatures
    sig_ds = ds.map_batches(
        AudioFingerprintStage(payload_col=payload_col),
        batch_format="pyarrow", batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {})
    ).select_columns([id_col, "afp"])
    return hamming_dedup_signatures(ds, sig_ds, id_col=id_col,
                                    sig_col="afp", radius=radius,
                                    driver_threshold=driver_threshold)
