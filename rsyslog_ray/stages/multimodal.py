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

    With a real imaging lib this would be PIL.Image.open in __call__ with
    the lib imported once in __init__; here __init__ probes for PIL and
    falls back to a DETERMINISTIC fake decode (dims/luma derived from the
    payload bytes) so the pipeline shape is fully testable.
    """

    def __init__(self, payload_col: str = "payload", strict: bool = False):
        self.payload_col = payload_col
        try:  # pragma: no cover - lib not in container
            import PIL.Image  # noqa: F401
            self._pil = True
        except ImportError:
            self._pil = False
        if strict and not self._pil:
            raise NotImplementedError(
                "real image decode requires Pillow; container has none")

    def _fake_decode(self, b: bytes) -> tuple[int, int, float]:
        if not b:
            return 0, 0, 0.0
        a = np.frombuffer(b, dtype=np.uint8)
        w = 16 + int(a[: 8].sum()) % 240
        h = 16 + int(a[-8:].sum()) % 240
        return w, h, float(np.round(a.mean(), 4))

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = _payload_bytes(batch, self.payload_col)
        w, h, luma = zip(*(self._fake_decode(b) for b in payloads)) if payloads \
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
