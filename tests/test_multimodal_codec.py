"""The real multimodal decode path must actually execute: decode_image
(PIL when importable, builtin PNG/PPM decoders otherwise) runs inside the
same Arrow-batched mapInPandas plumbing the fake-codec oracle queries use.
Fixtures are real PNG files encoded here (zlib + CRC chunks), so the test
exercises genuine entropy decoding and filter reconstruction — no skip."""

import hashlib
import struct
import zlib

import numpy as np
import pytest

from unifydb_spark.operators.multimodal import (
    decode_image,
    extract_features,
    resize_images,
    resize_nearest,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """Library encoder (multimodal.make_png): 8-bit RGB, filter 0 rows."""
    from unifydb_spark.operators.multimodal import make_png

    return make_png(arr)


def _test_images():
    rng = np.random.RandomState(7)
    return {
        1: rng.randint(0, 256, (2, 3, 3), dtype=np.uint8),
        2: rng.randint(0, 256, (5, 4, 3), dtype=np.uint8),
        3: np.zeros((8, 8, 3), dtype=np.uint8),
    }


def test_decode_png_roundtrip():
    for arr in _test_images().values():
        w, h, c, got = decode_image(encode_png(arr))
        assert (w, h, c) == (arr.shape[1], arr.shape[0], 3)
        assert np.array_equal(got, arr)


def test_decode_ppm():
    arr = _test_images()[2]
    h, w, _ = arr.shape
    payload = f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()
    w2, h2, c2, got = decode_image(payload)
    assert (w2, h2, c2) == (w, h, 3)
    assert np.array_equal(got, arr)


def test_decode_rejects_unknown_format():
    with pytest.raises(NotImplementedError):
        decode_image(b"GIF89a not supported by the builtin path")


def test_extract_features_real_decode_end_to_end(spark):
    imgs = _test_images()
    rows = [(doc_id, bytearray(encode_png(arr))) for doc_id, arr in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: r
        for r in extract_features(df, real_decode=True).collect()
    }
    assert set(got) == set(imgs)
    for doc_id, arr in imgs.items():
        r = got[doc_id]
        # REAL dimensions from the decoder, not the md5 pseudo-dims
        assert (r["pseudo_width"], r["pseudo_height"]) == (
            arr.shape[1],
            arr.shape[0],
        )
        assert r["content_md5"] == hashlib.md5(encode_png(arr)).hexdigest()


def test_resize_real_codec_end_to_end(spark):
    imgs = _test_images()
    rows = [(doc_id, bytearray(encode_png(arr))) for doc_id, arr in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {
        r["doc_id"]: r
        for r in resize_images(df, out_w=4, out_h=4, real_codec=True).collect()
    }
    for doc_id, arr in imgs.items():
        expected = resize_nearest(arr, 4, 4).tobytes()
        r = got[doc_id]
        assert (r["out_w"], r["out_h"]) == (4, 4)
        assert r["out_bytes"] == len(expected) == 4 * 4 * 3
        assert r["resized_md5"] == hashlib.md5(expected).hexdigest()


def test_resize_nearest_kernel():
    arr = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    up = resize_nearest(arr, 8, 8)
    assert up.shape == (8, 8, 3)
    # each source pixel becomes a 2x2 block under exact 2x upscale
    assert np.array_equal(up[0, 0], arr[0, 0]) and np.array_equal(
        up[1, 1], arr[0, 0]
    )
    down = resize_nearest(arr, 2, 2)
    assert down.shape == (2, 2, 3)
    assert np.array_equal(down[0, 0], arr[0, 0])


def test_decode_png_all_filter_types():
    """Hand-build an IDAT stream using filters 1-4 (Sub/Up/Average/Paeth)
    and check reconstruction against a reference implementation."""
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, (4, 5, 3), dtype=np.uint8)
    h, w, c = arr.shape
    stride = w * c

    def filt(ftype, row, prev):
        row = row.astype(np.int32)
        out = np.zeros(stride, dtype=np.int32)
        for x in range(stride):
            a = int(row[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[x] = (row[x] - pred) % 256
        return out.astype(np.uint8)

    raw = b""
    prev = np.zeros(stride, dtype=np.uint8)
    for y, ftype in enumerate([1, 2, 3, 4]):
        flat = arr[y].reshape(-1)
        raw += bytes([ftype]) + filt(ftype, flat, prev).tobytes()
        prev = flat
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w2, h2, c2, got = decode_image(png)
    assert (w2, h2, c2) == (w, h, 3)
    assert np.array_equal(got, arr)


def test_decode_rgba_png_normalizes_to_rgb():
    """RGBA inputs must decode to the same 3-channel convention as the
    PIL path (convert('RGB') drops unassociated alpha) — otherwise
    resize bytes / md5 / feature sums depend on which codec is
    installed."""
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (3, 4, 4), dtype=np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)  # color type 6 = RGBA
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    w2, h2, c2, got = decode_image(png)
    assert (w2, h2, c2) == (w, h, 3)
    assert np.array_equal(got, arr[:, :, :3])


def test_wav_roundtrip():
    from unifydb_spark.operators.multimodal import decode_wav, make_wav

    rng = np.random.RandomState(3)
    samples = rng.randint(-32768, 32768, 777).astype("<i2")
    rate, channels, got = decode_wav(make_wav(samples, 8000))
    assert (rate, channels) == (8000, 1)
    assert np.array_equal(got, samples)


def test_wav_rejects_non_riff():
    from unifydb_spark.operators.multimodal import decode_wav

    with pytest.raises(ValueError):
        decode_wav(b"OggS not a wav")


def test_audio_features_end_to_end(spark):
    """synth -> REAL RIFF decode -> windowed RMS, checked against direct
    numpy on the generating formula (the same check the SQL oracle runs)."""
    from unifydb_spark.operators.multimodal import audio_features, synth_audio

    docs = spark.createDataFrame([(d,) for d in [0, 3, 6]], "doc_id bigint")
    rows = audio_features(synth_audio(docs), window=128).collect()
    by_key = {(r["doc_id"], r["win_idx"]): r for r in rows}
    import math

    for d in [0, 3, 6]:
        n = 256 + (d % 7) * 128
        i = np.arange(n, dtype=np.int64)
        samples = (d * 31 + i * 17) % 65536 - 32768
        assert sum(1 for k in by_key if k[0] == d) == (n + 127) // 128
        for wi in range(0, n, 128):
            chunk = samples[wi : wi + 128]
            ssq = int((chunk * chunk).sum())
            r = by_key[(d, wi // 128)]
            assert r["n_samples"] == len(chunk)
            assert r["sum_sq"] == ssq
            assert r["rms"] == round(math.sqrt(ssq / len(chunk)), 6)


def test_y4m_roundtrip():
    from unifydb_spark.operators.multimodal import decode_y4m, make_y4m

    rng = np.random.RandomState(5)
    frames = [rng.randint(0, 256, (4, 6), dtype=np.uint8) for _ in range(3)]
    w, h, fn, fd, got = decode_y4m(make_y4m(frames, 6, 4, fps=30))
    assert (w, h, fn, fd) == (6, 4, 30, 1)
    assert len(got) == 3
    for a, b in zip(frames, got):
        assert np.array_equal(a, b)


def test_y4m_c420_luma_plane():
    """C420 payloads carry chroma planes; the parser must skip them and
    still recover every Y plane."""
    import numpy as np

    from unifydb_spark.operators.multimodal import decode_y4m

    w, h = 4, 2
    y0 = np.arange(w * h, dtype=np.uint8).reshape(h, w)
    y1 = (y0 + 100).astype(np.uint8)
    chroma = bytes(w * h // 2)  # 2 quarter-size planes per frame
    payload = (
        f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode()
        + b"FRAME\n" + y0.tobytes() + chroma
        + b"FRAME\n" + y1.tobytes() + chroma
    )
    w2, h2, _fn, _fd, frames = decode_y4m(payload)
    assert (w2, h2) == (w, h) and len(frames) == 2
    assert np.array_equal(frames[0], y0) and np.array_equal(frames[1], y1)


def test_y4m_rejects_garbage():
    from unifydb_spark.operators.multimodal import decode_y4m

    with pytest.raises(ValueError):
        decode_y4m(b"RIFF....WAVE not video\n")


def test_image_ahash_brightness_invariant_and_pairs(spark):
    """ahash groups a brightness-shifted copy with its original (every
    byte differs -> md5 dedup is blind to it) while keeping a different
    pattern apart; the block-pigeonhole pairs find small perturbations."""
    import numpy as np

    from unifydb_spark.operators.multimodal import (
        image_ahash_dedup,
        image_ahash_pairs,
        make_png,
    )

    rng = np.random.RandomState(3)
    base = rng.randint(0, 200, size=(16, 16, 3)).astype(np.uint8)
    brighter = np.clip(base.astype(np.int16) + 40, 0, 255).astype(np.uint8)
    # flip a couple of cells hard enough to move a few bits only
    perturbed = base.copy()
    perturbed[:2, :2] = 255
    other = rng.randint(0, 255, size=(16, 16, 3)).astype(np.uint8)
    rows = [
        (0, bytearray(make_png(base))),
        (1, bytearray(make_png(brighter))),
        (2, bytearray(make_png(perturbed))),
        (3, bytearray(make_png(other))),
    ]
    imgs = spark.createDataFrame(rows, "doc_id bigint, payload binary")

    dd = {r["doc_id"]: r for r in image_ahash_dedup(imgs).collect()}
    # uniform +40 shift: every pixel brighter by the same amount ->
    # cell-vs-mean compares unchanged (until clipping) -> same signature
    assert (dd[0]["ahash_hi"], dd[0]["ahash_lo"]) == (
        dd[1]["ahash_hi"], dd[1]["ahash_lo"])
    assert dd[0]["canonical_id"] == dd[1]["canonical_id"] == 0
    assert dd[0]["cluster_size"] == 2
    assert (dd[3]["ahash_hi"], dd[3]["ahash_lo"]) != (
        dd[0]["ahash_hi"], dd[0]["ahash_lo"])

    pairs = {(r["id1"], r["id2"]): r["hamming"]
             for r in image_ahash_pairs(imgs, max_hamming=7).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and 0 < pairs[(0, 2)] <= 7  # small perturbation
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_audio_fingerprint_gain_invariant(spark):
    """The energy-difference fingerprint survives uniform gain scaling
    (the compare is scale-free) — the property that makes it a content
    fingerprint rather than a byte hash."""
    import numpy as np

    from unifydb_spark.operators.multimodal import (
        audio_fingerprint,
        make_wav,
    )

    rng = np.random.RandomState(11)
    base = (rng.randn(512) * 3000).astype(np.int16)
    half = (base.astype(np.int32) // 2).astype(np.int16)  # -6 dB copy
    other = (rng.randn(512) * 3000).astype(np.int16)
    rows = [
        (0, bytearray(make_wav(base))),
        (1, bytearray(make_wav(half))),
        (2, bytearray(make_wav(other))),
    ]
    au = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in audio_fingerprint(au).collect()}
    assert out[0]["n_windows"] == 8
    assert out[0]["fingerprint"] == out[1]["fingerprint"]  # gain-invariant
    assert out[0]["fingerprint"] != out[2]["fingerprint"]


def test_scene_changes_detects_planted_cut(spark):
    import numpy as np

    from unifydb_spark.operators.multimodal import make_y4m, scene_changes

    dark = np.zeros((8, 8), dtype=np.uint8) + 10
    bright = np.zeros((8, 8), dtype=np.uint8) + 240
    frames = [dark, dark + 1, dark, bright, bright - 1, bright]
    vid = spark.createDataFrame(
        [(0, bytearray(make_y4m(frames, 8, 8)))],
        "doc_id bigint, payload binary",
    )
    out = {r["frame_idx"]: r for r in scene_changes(vid).collect()}
    assert len(out) == 6
    assert not out[0]["is_cut"]  # first frame never a cut
    assert out[3]["is_cut"]      # dark -> bright
    assert not any(out[i]["is_cut"] for i in (1, 2, 4, 5))  # tiny deltas


def test_image_stats_flat_vs_gradient(spark):
    """r118: a flat image has entropy 0 / contrast 0; a gradient image
    has positive entropy and contrast; n_pixels matches w*h."""
    import numpy as np

    from unifydb_spark.operators.multimodal import image_stats, make_png

    flat = np.full((4, 4, 3), 7, dtype=np.uint8)
    grad = (np.arange(48, dtype=np.int64) % 256).astype(np.uint8).reshape(4, 4, 3)
    rows = [(0, bytearray(make_png(flat))), (1, bytearray(make_png(grad)))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r.asDict() for r in image_stats(df).collect()}
    assert out[0]["n_pixels"] == 16 and out[0]["n_distinct"] == 1
    assert out[0]["entropy"] == 0.0 and out[0]["contrast"] == 0
    assert out[1]["entropy"] > 0.0 and out[1]["contrast"] > 0
    assert out[1]["p05"] <= out[1]["p95"]
