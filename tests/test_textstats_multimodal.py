"""Text-analysis stages (token stats, quality, langid, fingerprint) and the
multimodal binary-column plumbing (decode/resize stubs, frame explode)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from rsyslog_ray.stages.multimodal import (ImageDecodeStub, ResizeStub,
                                           attach_media_meta, image_features,
                                           sample_frames_table)
from rsyslog_ray.stages.textstats import (LangId, QualityScore,
                                          fingerprint_table, langid,
                                          quality_scores, token_stats_table)


def _docs(texts):
    return pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_token_stats_hand_counts():
    t = token_stats_table(_docs(["one two  three", "a,b c!", ""]))
    assert t["n_tokens"].to_pylist() == [3, 2, 0]
    assert t["n_chars"].to_pylist() == [14, 6, 0]
    # bpe-ish: [a][,][b] [c][!] → 5
    assert t["n_bpeish"].to_pylist()[1] == 5


def test_quality_scores_ratios(ray_session):
    ds = rd.from_arrow(_docs(["the cat and the dog", "12345!!!", ""]))
    rows = sorted(quality_scores(ds).take_all(), key=lambda r: r["doc_id"])
    # text0: words [the,cat,and,the,dog] → stopwords the,and,the = 3/5
    assert rows[0]["stop_ratio"] == pytest.approx(0.6)
    assert rows[0]["mean_word_len"] == pytest.approx(3.0)
    # text1: no letters → no words; 3 punct over 8 chars, 5 digits over 8
    assert rows[1]["stop_ratio"] == 0.0
    assert rows[1]["punct_ratio"] == pytest.approx(round(3 / 8, 6))
    assert rows[1]["digit_ratio"] == pytest.approx(round(5 / 8, 6))
    assert rows[2]["quality"] >= 0.0


def test_langid_profiles(ray_session):
    ds = rd.from_arrow(_docs([
        "the house of you and that it is great",
        "der hund und die katze ist nicht da",
        "le chat est dans la maison et je suis pas la",
        "zzz qqq xxx",
    ]))
    rows = sorted(langid(ds).take_all(), key=lambda r: r["doc_id"])
    assert [r["lang_pred"] for r in rows] == ["en", "de", "fr", "unknown"]


def test_fingerprint_deterministic_and_equal_for_equal_text():
    a = fingerprint_table(_docs(["hello world document", "hello world document",
                                 "different thing"]))
    f = a["fingerprint"].to_pylist()
    assert f[0] == f[1] != f[2]
    b = fingerprint_table(_docs(["hello world document"]))
    assert b["fingerprint"].to_pylist()[0] == f[0]


def _payload_table():
    payloads = [b"\x01\x02\x03\x04" * 64, b"\xff" * 16, b""]
    return pa.table({"doc_id": pa.array(range(3), pa.int64()),
                     "payload": pa.array(payloads, pa.large_binary())})


def test_media_meta_and_decode_stub():
    t = attach_media_meta(_payload_table())
    meta = t["media_meta"].to_pylist()
    assert meta[0]["n_bytes"] == 256 and meta[0]["media_type"] == "image"
    d = ImageDecodeStub()(t)
    assert d["width"].to_pylist()[2] == 0           # empty payload
    # deterministic: same payload → same dims
    d2 = ImageDecodeStub()(t)
    assert d["width"].to_pylist() == d2["width"].to_pylist()
    r = ResizeStub(max_side=8)(d)
    assert max(r["resized_w"].to_pylist()[:2]) <= 8


def test_decode_strict_raises_on_non_png_without_lib():
    # strict mode: PNG decodes for real; non-PNG payloads raise (no
    # imaging lib in the container) instead of silently faking
    with pytest.raises(NotImplementedError):
        ImageDecodeStub(strict=True)(_payload_table())
    from rsyslog_ray.datagen import synth_png_for_id
    t = pa.table({"doc_id": pa.array([7], pa.int64()),
                  "payload": pa.array([synth_png_for_id(7)],
                                      pa.large_binary())})
    out = ImageDecodeStub(strict=True)(t)
    assert out["width"].to_pylist()[0] == 8 + (7 * 7) % 25


def test_png_roundtrip_all_filters_and_colortypes():
    """decode_png must recover exact dims and the numpy-computed luma of
    the SOURCE pixel array for every PNG filter type and color type the
    fixture encoder emits (encoder filters forward, decoder unfilters —
    the pixel array is the independent ground truth)."""
    import numpy as np
    from rsyslog_ray.datagen import make_png
    from rsyslog_ray.stages.multimodal import decode_png
    rng = np.random.default_rng(1234)
    for ft in range(5):
        for shape in [(11, 13), (9, 7, 3), (6, 10, 4)]:
            px = rng.integers(0, 256, size=shape, dtype=np.uint8)
            w, h, luma = decode_png(make_png(px, filter_type=ft))
            assert (w, h) == (shape[1], shape[0]), (ft, shape)
            p = px.astype(np.float64)
            if p.ndim == 2:
                want = p.mean()
            elif p.shape[2] == 4:
                want = (0.299 * p[..., 0] + 0.587 * p[..., 1]
                        + 0.114 * p[..., 2]).mean()
            else:
                want = (0.299 * p[..., 0] + 0.587 * p[..., 1]
                        + 0.114 * p[..., 2]).mean()
            assert abs(luma - round(want, 4)) < 1e-9, (ft, shape)


def test_png_decode_rejects_unsupported():
    from rsyslog_ray.stages.multimodal import decode_png
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    # 16-bit depth PNG header → unsupported subset
    import zlib
    ihdr = ((4).to_bytes(4, "big") + (4).to_bytes(4, "big")
            + bytes([16, 0, 0, 0, 0]))
    chunk = (len(ihdr).to_bytes(4, "big") + b"IHDR" + ihdr
             + zlib.crc32(b"IHDR" + ihdr).to_bytes(4, "big"))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(b"\x89PNG\r\n\x1a\n" + chunk)


def test_frame_sampling_explodes_rows():
    t = sample_frames_table(_payload_table(), n_frames=4)
    # 4 frames for real payloads, 1 for the empty one
    assert t.num_rows == 4 + 4 + 1
    assert t["frame_idx"].to_pylist()[:4] == [0, 1, 2, 3]
    total = sum(len(p) for p in t["frame_payload"].to_pylist())
    assert total <= 256 + 16


def test_image_features_pipeline(ray_session):
    ds = rd.from_arrow(_payload_table())
    out = image_features(ds).take_all()
    assert len(out) == 3 and all("resized_w" in r for r in out)


def test_wav_roundtrip_real_decode():
    """decode_wav must recover rate/channels/duration exactly and the rms
    of the SOURCE signal (quantization-tolerant) — encoder and decoder
    are independent implementations."""
    import numpy as np
    from rsyslog_ray.datagen import make_wav, synth_wav_for_id
    from rsyslog_ray.stages.multimodal import AudioDecodeStub, decode_wav
    t = np.arange(1600) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    rate, nch, dur, rms = decode_wav(make_wav(sig, sample_rate=8000))
    assert (rate, nch) == (8000, 1)
    assert abs(dur - 0.2) < 1e-9
    assert abs(rms - np.sqrt((sig ** 2).mean())) < 1e-3
    # stereo
    stereo = np.stack([sig, -sig], axis=1)
    rate2, nch2, dur2, _ = decode_wav(
        make_wav(stereo, sample_rate=8000, n_channels=2))
    assert (rate2, nch2) == (8000, 2) and abs(dur2 - 0.2) < 1e-9
    # stage over a batch: WAV rows decode for real, strict rejects junk
    tbl = pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array([synth_wav_for_id(0), synth_wav_for_id(1)],
                            pa.large_binary())})
    out = AudioDecodeStub()(tbl)
    assert out["sample_rate"].to_pylist() == [8000, 8000]
    assert out["duration_s"].to_pylist()[0] > 0
    with pytest.raises(NotImplementedError):
        AudioDecodeStub(strict=True)(pa.table({
            "payload": pa.array([b"mp3junk"], pa.large_binary())}))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF....WAVEjunkdata")


def test_repetition_table_gopher_fractions():
    from rsyslog_ray.stages.textstats import repetition_table
    t = repetition_table(_docs(["aa\nbb\naa\ncc\nbb",   # 2 dups of 5
                                "x\nx\nx",              # 2 dups of 3
                                "unique\nlines",
                                ""]),
                         sep="\n")
    assert t["dup_line_frac"].to_pylist() == [
        round(2 / 5, 6), round(2 / 3, 6), 0.0, 0.0]
    # doc0 chars: aa,bb,aa,cc,bb = 10; dups aa+bb = 4
    assert t["dup_char_frac"].to_pylist()[0] == round(4 / 10, 6)


def test_top_ngrams_exact_with_ties(ray_session):
    from rsyslog_ray.stages.textstats import top_ngrams
    docs = _docs(["a b a b c", "a b x y", "c d c d"])
    out = top_ngrams(rd.from_arrow(docs), n=2, k=3)
    got = list(zip(out["gram"].to_pylist(), out["cnt"].to_pylist()))
    # bigrams: 'a b'×3, 'c d'×2, then ties at 1 break lexicographically
    assert got[0] == ("a b", 3) and got[1] == ("c d", 2)
    assert got[2] == ("b a", 1)          # smallest gram among count-1 ties


def test_normalize_text_table_nfc_nfd():
    import unicodedata
    from rsyslog_ray.stages.textstats import normalize_text_table
    decomp = "café naÏve"            # NFD-ish input
    comp = unicodedata.normalize("NFC", decomp)  # café naÏve composed
    t = pa.table({"doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "text": pa.array(["plain ascii", decomp, comp, None])})
    out = normalize_text_table(t, form="NFC")
    assert out["text_nfc"].to_pylist() == ["plain ascii", comp, comp, None]
    # all-ASCII batch takes the zero-copy fast path and is unchanged
    t2 = pa.table({"text": pa.array(["abc", "def"])})
    assert (normalize_text_table(t2)["text_nfc"].to_pylist()
            == ["abc", "def"])
    # NFD round-trips the composed form back to decomposed
    out_d = normalize_text_table(t, form="NFD")
    assert out_d["text_nfc"].to_pylist()[2] == unicodedata.normalize(
        "NFD", comp)


def test_tfidf_top_terms_matches_python_oracle(ray_session):
    import math
    from collections import Counter
    from rsyslog_ray.stages.textstats import tfidf_top_terms
    docs = ["apple banana apple", "banana cherry", "apple cherry date",
            "date date date banana"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    out = (tfidf_top_terms(rd.from_arrow(t).repartition(2), k=2)
           .to_pandas().sort_values(["doc_id", "score", "term"],
                                    ascending=[True, False, True])
           .reset_index(drop=True))
    n = len(docs)
    df_counts = Counter(w for d in docs for w in set(d.split()))
    want = []
    for i, d in enumerate(docs):
        tf = Counter(d.split())
        scored = sorted(
            ((round6(c * math.log(n / df_counts[w])), w, c)
             for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))[:2]
        want += [(i, w, c, s) for s, w, c in scored]
    got = list(zip(out["doc_id"], out["term"], out["tf"], out["score"]))
    assert got == want


def round6(x: float) -> float:
    import math
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_tfidf_join_path_agrees_with_broadcast(ray_session):
    from rsyslog_ray.stages.textstats import tfidf_top_terms
    docs = [f"w{i % 7} w{(i * 3) % 11} common tail{i % 4}" for i in range(40)]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    def run(thr):
        return (tfidf_top_terms(rd.from_arrow(t).repartition(3), k=3,
                                vocab_threshold=thr)
                .to_pandas().sort_values(["doc_id", "score", "term"],
                                         ascending=[True, False, True])
                .reset_index(drop=True))
    b, j = run(10**6), run(0)   # broadcast path vs forced join path
    assert b.equals(j)


def test_bigram_lm_join_path_agrees_with_broadcast(ray_session):
    from rsyslog_ray.stages.textstats import bigram_lm_score
    docs = ["the cat sat", "the cat ran", "a dog sat", "one",
            "the cat sat on the mat"]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    def run(thr):
        return (bigram_lm_score(rd.from_arrow(t).repartition(2),
                                vocab_threshold=thr)
                .to_pandas().sort_values("doc_id").reset_index(drop=True))
    b, j = run(10**6), run(0)
    assert b.equals(j)
    # 'one' has a single token -> no row; common bigrams score higher
    assert b["doc_id"].tolist() == [0, 1, 2, 4]
    assert b.loc[0, "lm_score"] > b.loc[2, "lm_score"]


def test_dhash_invariances():
    """dHash is stable under PNG filter re-encodes and uniform brightness
    shifts; distinct images are far apart."""
    import numpy as np

    from rsyslog_ray.datagen import make_png
    from rsyslog_ray.stages.multimodal import decode_png_pixels, dhash64

    rng = np.random.default_rng(5)
    img = rng.integers(0, 200, (40, 60), dtype=np.uint8)
    base = dhash64(img.astype(np.float64))
    for ft in range(5):
        _, _, luma = decode_png_pixels(make_png(img, filter_type=ft))
        assert dhash64(luma) == base, ft
    shifted = np.clip(img.astype(np.float64) + 17, 0, 255)
    assert dhash64(shifted) == base
    other = rng.integers(0, 200, (40, 60), dtype=np.uint8)
    d = bin(base ^ dhash64(other.astype(np.float64))).count("1")
    assert d > 10
    # tiny images resample instead of pooling, still 64-bit stable
    tiny = rng.integers(0, 200, (3, 4), dtype=np.uint8)
    assert 0 <= dhash64(tiny.astype(np.float64)) < 2 ** 64


def test_image_dedup_planted_groups(ray_session):
    """Same pixels re-encoded with different filters / brightness shifts
    collapse to one survivor per class; distinct images all survive."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.datagen import make_png
    from rsyslog_ray.stages.multimodal import image_dedup

    rng = np.random.default_rng(9)
    imgs = [rng.integers(0, 200, (20, 30), dtype=np.uint8)
            for _ in range(4)]
    rows = []
    for i in range(24):
        cls = i % 4
        px = np.clip(imgs[cls].astype(np.int64) + (i // 4) % 3, 0, 255) \
            .astype(np.uint8)
        rows.append((i, make_png(px, filter_type=i % 5)))
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "payload": pa.array([r[1] for r in rows],
                                        pa.large_binary())})
    out = image_dedup(rd.from_arrow(tbl).repartition(3)) \
        .to_pandas()["doc_id"].sort_values().tolist()
    assert out == [0, 1, 2, 3]          # smallest id per class survives

    # dual path: force distributed pairing + connected components
    out2 = image_dedup(rd.from_arrow(tbl).repartition(3),
                       driver_threshold=0) \
        .to_pandas()["doc_id"].sort_values().tolist()
    assert out2 == out


def test_audio_fingerprint_invariances():
    import numpy as np

    from rsyslog_ray.datagen import make_wav
    from rsyslog_ray.stages.multimodal import (audio_fingerprint64,
                                               decode_wav_samples)

    rng = np.random.default_rng(4)
    sig = rng.uniform(-0.5, 0.5, 4000)
    f1 = audio_fingerprint64(sig)
    assert audio_fingerprint64(sig * 0.3) == f1          # gain invariant
    _, x = decode_wav_samples(make_wav(sig))
    assert bin(f1 ^ audio_fingerprint64(x)).count("1") <= 2  # re-encode
    other = rng.uniform(-0.5, 0.5, 4000)
    assert bin(f1 ^ audio_fingerprint64(other)).count("1") > 10
    # stereo downmix decodes
    st = np.stack([sig, sig]).T.ravel()
    _, mono = decode_wav_samples(make_wav(st, n_channels=2))
    assert len(mono) == 4000
    # degenerate inputs
    assert audio_fingerprint64(np.array([])) == 0
    assert 0 <= audio_fingerprint64(np.array([0.1, -0.2])) < 2 ** 64


def test_audio_dedup_planted_groups(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.datagen import make_wav
    from rsyslog_ray.stages.multimodal import audio_dedup

    rows = []
    for i in range(18):
        cls = i % 3
        n = 2000 + cls * 500
        freq = 150 + cls * 211
        gain = 0.2 + (i // 3) / 12.0
        t = np.arange(n) / 8000.0
        rows.append((i, make_wav(gain * np.sin(2 * np.pi * freq * t),
                                 sample_rate=8000)))
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "payload": pa.array([r[1] for r in rows],
                                        pa.large_binary())})
    out = audio_dedup(rd.from_arrow(tbl).repartition(2)) \
        .to_pandas()["doc_id"].sort_values().tolist()
    assert out == [0, 1, 2]


def test_mine_templates(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from rsyslog_ray.stages.textstats import mine_templates

    msgs = ["connect from 10.0.0.1 port 2222",
            "connect from 192.168.7.9 port 80",
            "session 0xDEADBEEF opened for id 42",
            "session 0x1f opened for id 7",
            "job 550e8400-e29b-41d4-a716-446655440000 done",
            "unique message"]
    ds = rd.from_arrow(pa.table({"msg": msgs}))
    out = {r["template"]: r["rows"]
           for r in mine_templates(ds).take_all()}
    assert out["connect from <ip> port <n>"] == 2
    assert out["session <hex> opened for id <n>"] == 2
    assert out["job <uuid> done"] == 1
    assert out["unique message"] == 1


def test_ccnet_buckets_tiles_by_score(ray_session):
    """Repeated-phrase docs score high (head), rare-word docs low
    (tail); tiles are per-source NTILE(3)-sized and partition-stable."""
    import ray.data as rd
    from rsyslog_ray.stages.textstats import ccnet_buckets

    rows = []
    common = "the cat sat on the mat"
    for i in range(9):                  # one source, 9 scored docs
        txt = common if i < 5 else f"zx{i} qw{i} er{i} ty{i}"
        rows.append({"doc_id": i, "source": "s0", "text": txt})
    rows.append({"doc_id": 99, "source": "s0", "text": "solo"})  # <2 toks
    tbl = pa.table({k: pa.array([r[k] for r in rows])
                    for k in ("doc_id", "source", "text")})
    outs = []
    for nparts in (1, 4):
        got = ccnet_buckets(rd.from_arrow(tbl).repartition(nparts)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    g = outs[0]
    assert len(g) == 9                          # doc 99 unscored
    assert list(g.groupby("tile").size()) == [3, 3, 3]
    # the repeated-phrase docs outrank the rare-word docs
    assert set(g[g.bucket == "head"].doc_id) <= {0, 1, 2, 3, 4}
    assert (g[g.doc_id >= 5].bucket != "head").all()
    # equal scores tie-break by doc_id DESC: head == exactly {4, 3, 2}
    assert set(g[g.tile == 1].doc_id) == {2, 3, 4}


def test_char_entropy_known_values_and_unicode(ray_session):
    """Hand-computable distributions, incl. a non-ASCII batch that
    exercises the codepoint fallback path, and an empty doc emitting
    no row."""
    import math
    import ray.data as rd
    from rsyslog_ray.stages.textstats import char_entropy

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["aaaa",          # 0 nats
                          "abab",          # ln 2
                          "héhé",          # ln 2 (2 codepoints x2)
                          ""]),            # no row
    })
    got = char_entropy(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got.doc_id.tolist() == [0, 1, 2]
    assert got.n_cp.tolist() == [4, 4, 4]
    assert got.entropy.tolist() == [
        0.0, round(math.log(2), 6), round(math.log(2), 6)]


def test_char_entropy_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd
    from rsyslog_ray.stages.textstats import char_entropy, char_entropy_sql

    rng = np.random.default_rng(5)
    texts = ["".join(rng.choice(list("abcdef \n."), size=int(k)))
             for k in rng.integers(1, 200, size=120)]
    tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                    "text": pa.array(texts)})
    got = char_entropy(rd.from_arrow(tbl).repartition(6)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    want = con.execute(char_entropy_sql() + " ORDER BY doc_id").df()
    assert got.n_cp.tolist() == want.n_cp.tolist()
    assert got.entropy.tolist() == want.entropy.tolist()
