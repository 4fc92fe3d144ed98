"""Deterministic synthetic `transcripts` table generator (FIXTURES.md §1–§2).

Schema (BASELINE.json input_hint):
    conv_id:string, turn_idx:int32, role:string, text:large_string,
    tool:string, ts:timestamp[us]

`text` carries syslog-shaped payloads mirroring the reference parser-chain
branches (reference: tools/pmrfc5424.c, tools/pmrfc3164.c,
plugins/imdiag/imdiag.c:224 fabricates "<167>Mar  1 01:00:00 host tag
msgnum:NNNNNNNN:").  Every draw comes from one seeded numpy Generator in a
fixed order, so the same (n_rows, seed) always yields byte-identical tables
in any process.

Shape distribution (share → shape):
    0.40 rfc5424        <PRI>1 TS HOST APP PROCID MSGID SD msgnum:N: body
    0.30 rfc3164        <PRI>Mmm dd hh:mm:ss host tag: msgnum:N: body
    0.08 rfc3164_3339   <PRI>RFC3339 host tag: msgnum:N: body
    0.05 cee            <PRI>Mmm dd hh:mm:ss host tag: @cee: {json}
    0.05 headerless     "  {json}" / "  [x]"  (starts with { or [ → no header)
    0.04 no_pri         plain text, no <PRI>  → default PRI 13
    0.03 bad_pri        <999>… / <12x… / <>…  → invalid PRI path
    0.02 dup            exact copy of previous turn in same conv (runs)
    0.02 nasty          trailing NUL/LF, tabs, control chars, leading space
    0.01 empty          ""  (dropped by sanitize, RS_RET_EMPTY_MSG analogue)

PRI values sweep all 24 facilities × 8 severities deterministically
(pri = (global_seq * 37) % 192; 37 ⊥ 192 so all values appear).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")
SHAPES = [
    ("rfc5424", 0.40),
    ("rfc3164", 0.30),
    ("rfc3164_3339", 0.08),
    ("cee", 0.05),
    ("headerless", 0.05),
    ("no_pri", 0.04),
    ("bad_pri", 0.03),
    ("dup", 0.02),
    ("nasty", 0.02),
    ("empty", 0.01),
]
ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "search", "editor", "browser", ""]

# Cache root for generated parquet (never under /root/testdata — read-only).
DATA_ROOT = os.environ.get("GRAFT_TRANSCRIPTS_ROOT", "/tmp/rsyslog_ray_data")


def _conv_sizes(n_rows: int, rng: np.random.Generator) -> np.ndarray:
    """Conversation sizes; two hot convs hold ~20% of rows (skew fixture)."""
    hot = max(1, n_rows // 10)
    sizes = [hot, hot]
    remaining = n_rows - 2 * hot
    while remaining > 0:
        s = int(rng.integers(1, 25))
        s = min(s, remaining)
        sizes.append(s)
        remaining -= s
    return np.asarray(sizes, dtype=np.int64)


def generate_transcripts(n_rows: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)

    sizes = _conv_sizes(n_rows, rng)
    n_convs = len(sizes)
    conv_ids = np.array([f"conv-{i:06d}" for i in range(n_convs)])
    conv_of_row = np.repeat(np.arange(n_convs), sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)

    n = len(conv_of_row)
    seq = np.arange(n)
    ts = BASE_TS + (seq * 1_000_000).astype("timedelta64[us]")
    role = np.array(ROLES)[turn_idx % 4]
    tool = np.array(TOOLS)[rng.integers(0, len(TOOLS), size=n)]
    pri = (seq * 37) % 192

    shape_names = [s for s, _ in SHAPES]
    probs = np.array([p for _, p in SHAPES])
    shape = rng.choice(len(shape_names), size=n, p=probs)

    host_k = rng.integers(0, 50, size=n)
    tag_m = rng.integers(0, 20, size=n)
    pid = rng.integers(100, 9999, size=n)
    nil_roll = rng.random(size=n)  # rfc5424 nil-field variants
    sub = rng.integers(0, 4, size=n)  # per-shape sub-variant
    dup_run = rng.integers(2, 10, size=n)  # dup run lengths

    # Vectorized timestamp renderings
    ts_s = pd.Series(ts)
    rfc3339 = ts_s.dt.strftime("%Y-%m-%dT%H:%M:%S.%f+00:00").to_numpy()
    # RFC3164: "Mmm dd" with day space-padded ("Mar  1")
    mon = ts_s.dt.strftime("%b").to_numpy()
    day = ts_s.dt.day.to_numpy()
    hms = ts_s.dt.strftime("%H:%M:%S").to_numpy()
    rfc3164_ts = np.array(
        [f"{m} {d:2d} {h}" for m, d, h in zip(mon, day, hms)], dtype=object
    )

    texts: list[str] = [""] * n
    for i in range(n):
        sh = shape_names[shape[i]]
        p = pri[i]
        k = host_k[i]
        m = tag_m[i]
        msgnum = f"msgnum:{seq[i]:08d}:"
        if sh == "rfc5424":
            host = "-" if nil_roll[i] < 0.05 else f"host-{k}"
            app = "-" if 0.05 <= nil_roll[i] < 0.10 else f"app-{tool[i] or 'none'}"
            procid = "-" if 0.10 <= nil_roll[i] < 0.15 else str(pid[i])
            msgid = "-" if 0.15 <= nil_roll[i] < 0.20 else f"ID{m}"
            sd = (
                "-"
                if 0.20 <= nil_roll[i] < 0.25
                else f'[exam@32473 k="v{m}" q="a\\]b"]'
            )
            texts[i] = (
                f"<{p}>1 {rfc3339[i]} {host} {app} {procid} {msgid} {sd} "
                f"{msgnum} body text {seq[i]}"
            )
        elif sh == "rfc3164":
            texts[i] = f"<{p}>{rfc3164_ts[i]} host-{k} tag{m}: {msgnum} body"
        elif sh == "rfc3164_3339":
            texts[i] = f"<{p}>{rfc3339[i]} host-{k} tag{m}: {msgnum} body"
        elif sh == "cee":
            texts[i] = (
                f"<{p}>{rfc3164_ts[i]} host-{k} tag{m}: @cee: "
                f'{{"event":"ev{m}","n":{seq[i]}}}'
            )
        elif sh == "headerless":
            texts[i] = (
                f'  {{"a":{seq[i]}}}' if sub[i] % 2 == 0 else f"  [x{seq[i]}]"
            )
        elif sh == "no_pri":
            texts[i] = f"plain message {msgnum} no pri here"
        elif sh == "bad_pri":
            v = sub[i] % 3
            if v == 0:
                texts[i] = f"<999>{rfc3164_ts[i]} host-{k} tag{m}: {msgnum} bad"
            elif v == 1:
                texts[i] = f"<12x{msgnum} bad pri"
            else:
                texts[i] = f"<>{msgnum} empty pri"
        elif sh == "nasty":
            v = sub[i]
            if v == 0:
                texts[i] = f"<{p}>{rfc3164_ts[i]} host-{k} tag{m}: {msgnum} trail\n"
            elif v == 1:
                texts[i] = f"<{p}>{rfc3164_ts[i]} host-{k} tag{m}: {msgnum} nul\x00"
            elif v == 2:
                texts[i] = f"<{p}>{rfc3164_ts[i]} host-{k} tag{m}: {msgnum}\tctl\x07x"
            else:  # HP-procurve leading space before timestamp
                texts[i] = f"<{p}> {rfc3164_ts[i]} host-{k} tag{m}: {msgnum} hp"
        elif sh == "empty":
            texts[i] = ""
        # "dup" handled in a second pass below

    # dup pass: runs of consecutive exact duplicates within one conv
    dup_idx = np.flatnonzero(shape == shape_names.index("dup"))
    for i in dup_idx:
        if turn_idx[i] == 0 or texts[i - 1] == "":
            texts[i] = f"<{pri[i]}>{rfc3164_ts[i]} host-{host_k[i]} tag0: {f'msgnum:{seq[i]:08d}:'} solo"
            continue
        run = int(dup_run[i])
        j = i
        while j < n and j - i < run and turn_idx[j] > 0 and conv_of_row[j] == conv_of_row[i]:
            texts[j] = texts[i - 1]
            j += 1

    return pa.table(
        {
            "conv_id": pa.array(conv_ids[conv_of_row], type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": pa.array(texts, type=pa.large_string()),
            "tool": pa.array(tool, type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )


def rows_for_sf(sf: float) -> int:
    """Scale-factor → row count (matches lineitem scaling: sf0.01 → 60k)."""
    return max(1000, int(sf * 6_000_000))


def sf_tag_of_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' → 'sf0.01'."""
    return os.path.basename(os.path.normpath(sf_dir))


def transcripts_path(tag: str) -> str:
    return os.path.join(DATA_ROOT, f"transcripts_{tag}")


def ensure_transcripts(sf_dir_or_tag: str, seed: int = 42) -> str:
    """Generate (once, cached) the transcripts parquet for a testdata sf dir
    or an explicit tag like 'rows1000000'. Returns the parquet directory.

    Written as multiple part files (~250k rows each) so reads parallelize
    and the resumable job has natural shard boundaries.
    """
    tag = sf_tag_of_dir(sf_dir_or_tag)
    if tag.startswith("rows"):
        n_rows = int(tag[4:])
    elif tag.startswith("sf"):
        n_rows = rows_for_sf(float(tag[2:]))
    else:
        raise ValueError(f"unrecognized transcripts tag: {tag!r}")
    out_dir = transcripts_path(tag)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    table = generate_transcripts(n_rows, seed=seed)
    per_file = 250_000
    nfiles = max(1, (n_rows + per_file - 1) // per_file)
    for f in range(nfiles):
        lo = f * per_file
        hi = min(n_rows, lo + per_file)
        pq.write_table(
            table.slice(lo, hi - lo),
            os.path.join(out_dir, f"part-{f:05d}.parquet"),
            row_group_size=65_536,
        )
    with open(done, "w") as fh:
        fh.write(f"{n_rows}\n")
    return out_dir


# ---------------------------------------------------------------------------
# PNG fixture encoder (multimodal decode stage needs REAL payloads; no
# imaging libs in the container, so we emit spec-compliant PNGs from
# stdlib zlib — decode_png in stages/multimodal.py is the inverse)
# ---------------------------------------------------------------------------


def make_png(pixels, filter_type: int = 0) -> bytes:
    """uint8 pixel array → PNG bytes. (h, w) → grayscale (colortype 0);
    (h, w, 3) → RGB (2); (h, w, 4) → RGBA (6). Bit depth 8, one IDAT, no
    interlace. filter_type 0-4 applies that PNG filter to EVERY scanline
    (forward filtering — the decoder's unfilter is the inverse), which
    lets tests exercise each reconstruction path."""
    import zlib

    import numpy as np
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
        ct = 0
    else:
        ct = {1: 0, 3: 2, 4: 6}[px.shape[2]]
    h, w, bpp = px.shape
    flat = px.reshape(h, w * bpp).astype(np.int64)
    lines = []
    prev = np.zeros(w * bpp, np.int64)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            filt = cur
        elif filter_type == 1:        # Sub
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            filt = (cur - left) % 256
        elif filter_type == 2:        # Up
            filt = (cur - prev) % 256
        elif filter_type == 3:        # Average
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            filt = (cur - ((left + prev) >> 1)) % 256
        elif filter_type == 4:        # Paeth
            left = np.concatenate((np.zeros(bpp, np.int64), cur[:-bpp]))
            upleft = np.concatenate((np.zeros(bpp, np.int64), prev[:-bpp]))
            p = left + prev - upleft
            pa_, pb_, pc_ = (np.abs(p - left), np.abs(p - prev),
                             np.abs(p - upleft))
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, upleft))
            filt = (cur - pred) % 256
        else:
            raise ValueError(f"bad filter type {filter_type}")
        lines.append(bytes([filter_type]) + filt.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (len(data).to_bytes(4, "big") + typ + data
                + zlib.crc32(typ + data).to_bytes(4, "big"))

    ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([8, ct, 0, 0, 0]))
    idat = zlib.compress(b"".join(lines), 6)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


def synth_png_for_id(doc_id: int) -> bytes:
    """Deterministic per-document PNG fixture: dims and a gradient pattern
    derived from doc_id only — reproducible across batch sizes and
    partitionings (the row-identity rule every fixture here follows)."""
    import numpy as np
    w = 8 + (doc_id * 7) % 25
    h = 8 + (doc_id * 13) % 17
    y, x = np.mgrid[0:h, 0:w]
    if doc_id % 3 == 0:               # grayscale
        return make_png(((x * 3 + y * 5 + doc_id) % 256).astype(np.uint8),
                        filter_type=doc_id % 5)
    r = (x * 2 + doc_id) % 256
    g = (y * 4 + doc_id // 2) % 256
    b = (x + y + doc_id // 3) % 256
    return make_png(np.stack([r, g, b], axis=-1).astype(np.uint8),
                    filter_type=doc_id % 5)


def make_wav(samples, sample_rate: int = 16000, n_channels: int = 1) -> bytes:
    """float array in [-1, 1) (frames × channels interleaved if stereo) →
    RIFF/PCM16 WAV bytes — the inverse of stages/multimodal.decode_wav."""
    import numpy as np
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    pcm = np.clip(np.round(x * 32768.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = 2 * n_channels
    fmt = (b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * block).to_bytes(4, "little")
           + block.to_bytes(2, "little") + (16).to_bytes(2, "little"))
    dchunk = b"data" + len(data).to_bytes(4, "little") + data
    body = b"WAVE" + fmt + dchunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def synth_wav_for_id(doc_id: int) -> bytes:
    """Deterministic per-document WAV fixture: a sine tone whose
    frequency, duration and amplitude derive from doc_id only."""
    import numpy as np
    rate = 8000
    n = 400 + (doc_id * 37) % 800
    freq = 100 + (doc_id * 13) % 900
    amp = 0.2 + (doc_id % 7) / 10.0
    t = np.arange(n) / rate
    return make_wav(amp * np.sin(2 * np.pi * freq * t), sample_rate=rate)


def dup_png_for_id(doc_id: int) -> bytes:
    """Near-dup PNG fixture: class = doc_id % 97 fixes the pixel pattern;
    the encoder filter type and a small brightness shift vary per id, so
    each class is 'same image, different bytes' — the dHash dedup must
    collapse it to one survivor."""
    import numpy as np
    cls = doc_id % 97
    rng = np.random.default_rng(cls)
    px = rng.integers(0, 200, (24, 32), dtype=np.uint8)
    px = np.clip(px + (doc_id // 97) % 3, 0, 255).astype(np.uint8)
    return make_png(px, filter_type=doc_id % 5)


def dup_wav_for_id(doc_id: int) -> bytes:
    """Near-dup WAV fixture: class = doc_id % 89 fixes the tone; the gain
    varies per id (same recording at a new level)."""
    import numpy as np
    cls = doc_id % 89
    rate = 8000
    n = 1200 + (cls * 37) % 800
    freq = 100 + (cls * 13) % 900
    gain = 0.2 + ((doc_id // 89) % 4) / 10.0
    t = np.arange(n) / rate
    return make_wav(gain * np.sin(2 * np.pi * freq * t), sample_rate=rate)


def media_path(tag: str) -> str:
    return os.path.join(DATA_ROOT, f"media_{tag}")


def ensure_media(sf_dir: str) -> str:
    """Generate (once, cached) the media-payload parquet for a testdata
    sf dir: one row per documents.parquet doc_id with REAL binary columns
    png / wav (per-id fixtures) and png_dup / wav_dup (near-dup class
    fixtures). The multimodal pipelines then READ opaque binary columns
    from storage — the shape of a production media pipeline — instead of
    synthesizing payloads inside the timed stage. Generation itself is a
    parallel map_batches + write_parquet when Ray is up (a driver loop
    otherwise, for tiny fixtures)."""
    import pyarrow.compute as _pc

    tag = sf_tag_of_dir(sf_dir)
    out_dir = media_path(tag)
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    # no _DONE marker: a crash mid-write may have left partial fragments
    # that a retry would duplicate — regenerate from a clean directory
    import shutil
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def gen(batch):
        ids = [int(i) for i in batch["doc_id"].to_pylist()]
        return pa.table({
            "doc_id": _pc.cast(batch["doc_id"], pa.int64()),
            "png": pa.array([synth_png_for_id(i) for i in ids],
                            pa.large_binary()),
            "wav": pa.array([synth_wav_for_id(i) for i in ids],
                            pa.large_binary()),
            "png_dup": pa.array([dup_png_for_id(i) for i in ids],
                                pa.large_binary()),
            "wav_dup": pa.array([dup_wav_for_id(i) for i in ids],
                                pa.large_binary()),
        })

    src = os.path.join(sf_dir, "documents.parquet")
    import ray as _ray
    if _ray.is_initialized():
        import ray.data as _rd
        (_rd.read_parquet(src, columns=["doc_id"])
         .map_batches(gen, batch_format="pyarrow", batch_size=2048)
         .write_parquet(out_dir))
    else:
        tbl = pq.read_table(src, columns=["doc_id"])
        out = gen(tbl)
        pq.write_table(out, os.path.join(out_dir, "part-00000.parquet"),
                       row_group_size=4096)
    with open(done, "w") as fh:
        fh.write(f"{tag}\n")
    return out_dir
