"""Multimodal-column operators: binary payloads, frame sampling,
Arrow-batched feature extraction, checksum dedup, decode gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_cudf_spark.operators.multimodal import (
    attach_payload,
    decode_payload,
    dedup_payloads,
    extract_features,
    sample_frames,
)
from dask_cudf_spark.sources import load_table

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return attach_payload(load_table(spark, SF_DIR, "documents"))


def test_payload_schema(docs):
    types = dict(docs.dtypes)
    assert types["payload"] == "binary"
    assert types["meta"] == "struct<modality:string,n_bytes:bigint,checksum:string>"


def test_metadata_matches_bytes(docs):
    bad = docs.filter(
        F.col("meta.n_bytes") != F.octet_length("payload")
    ).count()
    assert bad == 0


def test_frame_sampling_counts(docs):
    frames = sample_frames(docs, frame_bytes=64, stride=32)
    # every frame is exactly frame_bytes long (partial tails dropped)
    assert frames.filter(F.octet_length("frame") != 64).count() == 0
    # closed-form frame count per doc
    got = (
        frames.groupBy("doc_id").count().withColumnRenamed("count", "n")
    )
    expect = docs.select(
        "doc_id",
        F.when(
            F.col("meta.n_bytes") >= 64,
            ((F.col("meta.n_bytes") - 64) / 32).cast("long") + 1,
        )
        .otherwise(0)
        .alias("want"),
    )
    bad = got.join(expect, "doc_id").filter(F.col("n") != F.col("want")).count()
    assert bad == 0


def test_frames_reconstruct_payload_prefix(spark, docs):
    # stride == frame size -> frames tile the payload; concat rebuilds it
    one = docs.filter(F.col("doc_id") == 0)
    n = one.select(F.col("meta.n_bytes")).first()[0]
    frames = sample_frames(one, frame_bytes=16, stride=16)
    rebuilt = (
        frames.orderBy("frame_idx")
        .agg(F.concat_ws("", F.collect_list(F.col("frame").cast("string"))))
        .first()[0]
    )
    text = one.select("text").first()[0]
    assert rebuilt == text[: (n // 16) * 16]


def test_extract_features_deterministic(spark, docs):
    feats = extract_features(docs.filter(F.col("doc_id") < 50)).toPandas()
    assert len(feats) == 50
    texts = dict(
        docs.filter(F.col("doc_id") < 50).select("doc_id", "text").collect()
    )
    row = feats.set_index("doc_id").loc[7]
    raw = texts[7].encode()
    assert row["n_bytes"] == len(raw)
    assert row["byte_min"] == min(raw)
    assert row["byte_max"] == max(raw)
    assert abs(row["byte_mean"] - round(sum(raw) / len(raw), 6)) < 1e-9


def test_dedup_payloads(spark, docs):
    deduped = dedup_payloads(docs, "payload")
    n_distinct = docs.select(F.sha2("payload", 256)).distinct().count()
    assert deduped.count() == n_distinct


def test_decode_is_gated(docs):
    with pytest.raises(NotImplementedError, match="codec"):
        decode_payload(docs)


def test_wav_codec_round_trip_and_decode_wav(spark):
    """RIFF/WAVE codec (round 4): container round trip at both bit
    depths, word-alignment handling (odd data size), and the
    distributed decode_wav operator."""
    import struct

    from dask_cudf_spark.operators.multimodal import (
        build_wav_codec,
        decode_wav,
    )

    enc, dec = build_wav_codec()
    # odd-length 8-bit data -> pad byte after the data chunk must not
    # break parsing of a trailing chunk; single-chunk file here, but
    # odd size exercises the alignment arithmetic
    m = dec(enc(bytes([128, 255, 0]), 16000, 1, 8))
    assert m["n_samples"] == 3 and m["peak"] == 128
    assert m["duration_us"] == 3 * 1_000_000 // 16000
    pcm16 = b"".join(struct.pack("<h", v) for v in [0, -32768, 32767])
    m16 = dec(enc(pcm16, 8000, 1, 16))
    assert m16["bits_per_sample"] == 16 and m16["peak"] == 32768

    import pytest as _pytest

    with _pytest.raises(ValueError, match="RIFF"):
        dec(b"not wav")
    with _pytest.raises(ValueError, match="PCM"):
        bad = bytearray(enc(b"\x80", 8000, 1, 8))
        bad[20] = 3  # audio_format -> IEEE float
        dec(bytes(bad))

    df = spark.createDataFrame(
        [(1, enc(bytes([128] * 100), 16000, 1, 8)),
         (2, enc(bytes(range(200)), 8000, 1, 8))],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r.asDict() for r in decode_wav(df).collect()}
    assert got[1]["rms_s4"] == 0 and got[1]["n_samples"] == 100
    assert got[2]["sample_rate"] == 8000 and got[2]["peak"] == 128


def test_png_codec_filters_and_errors():
    """PNG codec (round 4): every filter type reconstructs exactly on
    every color type; CRC corruption and bad signatures are rejected."""
    import random

    import pytest as _pytest

    from dask_cudf_spark.operators.multimodal import build_png_codec

    enc, dec = build_png_codec()
    random.seed(41)
    for ch in (1, 3, 4):
        for ft in (0, 1, 2, 3, 4):
            w, h = 7, 5
            pix = bytes(random.randrange(256) for _ in range(w * h * ch))
            m = dec(enc(pix, w, h, ch, row_filter=ft))
            assert (m["height"], m["width"], m["channels"]) == (h, w, ch)
            assert m["sum_pix"] == sum(pix), (ch, ft)
            assert m["min_pix"] == min(pix) and m["max_pix"] == max(pix)

    with _pytest.raises(ValueError, match="signature"):
        dec(b"JFIF not a png")
    good = bytearray(enc(b"\x01\x02\x03\x04", 2, 2, 1))
    good[-17] ^= 0xFF  # flip a byte inside IEND/IDAT region
    with _pytest.raises(ValueError, match="CRC|filter|Error"):
        dec(bytes(good))


def test_avi_codec_round_trip_and_errors():
    import pytest as _pytest

    from dask_cudf_spark.operators.multimodal import build_avi_codec

    enc, dec = build_avi_codec()
    frames = [bytes(range(k, k + 12)) for k in range(0, 30, 10)]  # 4x3
    m = dec(enc(frames, 4, 3, fps=5))
    assert (m["width"], m["height"], m["n_frames"], m["fps"]) == (4, 3, 3, 5)
    assert m["duration_us"] == 600000
    assert m["sum_pix"] == sum(b for f in frames for b in f)

    with _pytest.raises(ValueError, match="RIFF"):
        dec(b"MKV? nope")
    # header/movi cross-check: drop a frame chunk, keep the header count
    good = enc(frames, 4, 3, fps=5)
    truncated = good[: good.rindex(b"00db")]
    with _pytest.raises(ValueError, match="truncated AVI"):
        dec(truncated)
    # header/movi cross-check: re-encode with a lying header frame count
    import struct as _struct

    lying = bytearray(enc(frames, 4, 3, fps=5))
    avih_at = bytes(lying).index(b"avih") + 8
    _struct.pack_into("<I", lying, avih_at + 16, 99)  # dwTotalFrames
    with _pytest.raises(ValueError, match="frame count mismatch"):
        dec(bytes(lying))


def test_jpeg_flat_tiles_roundtrip_exactly():
    """Baseline JPEG with DC quant step 1 is EXACTLY lossless on
    block-constant tiles (flat block -> DC-only, 8*(c-128) integral)
    — the property the SQL oracle exploits."""
    import numpy as np

    from dask_cudf_spark.operators.multimodal import build_jpeg_codec

    enc, dec = build_jpeg_codec()
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 37, 200, 0, 255
    assert np.array_equal(dec(enc(img)), img)


def test_jpeg_random_roundtrip_quality():
    """General images: near-lossless at quant=1 (only DCT rounding),
    bounded error with the Annex-K-style quant table — the REAL lossy
    pipeline (Huffman AC runs, ZRL, EOB, byte stuffing all exercised
    by random data)."""
    import numpy as np

    from dask_cudf_spark.operators.multimodal import build_jpeg_codec

    enc, dec = build_jpeg_codec()
    rng = np.random.default_rng(11)
    gray = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    assert np.mean(
        (dec(enc(gray)).astype(float) - gray.astype(float)) ** 2
    ) < 1.0
    color = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    assert np.mean(
        (dec(enc(color)).astype(float) - color.astype(float)) ** 2
    ) < 2.0
    q = np.array(
        [16,11,10,16,24,40,51,61,12,12,14,19,26,58,60,55,
         14,13,16,24,40,57,69,56,14,17,22,29,51,87,80,62,
         18,22,37,56,68,109,103,77,24,35,55,64,81,104,113,92,
         49,64,78,87,103,121,120,101,72,92,95,98,112,100,103,99]
    )
    # lossy but sane: smooth gradient survives a real quant table
    grad = np.tile(np.arange(0, 255, 255 / 40, dtype=np.float64), (24, 1))
    grad = grad.astype(np.uint8)
    out = dec(enc(grad, quant=q))
    assert np.mean(np.abs(out.astype(float) - grad.astype(float))) < 6.0


def test_jpeg_truncated_after_stuffing_ff_raises_valueerror():
    """ADVICE r5: a stream cut immediately after a 0xFF byte must
    raise the decoder's typed truncation error, not IndexError from an
    unguarded stuffing-byte read."""
    import numpy as np
    import pytest

    from dask_cudf_spark.operators.multimodal import build_jpeg_codec

    enc, dec = build_jpeg_codec()
    rng = np.random.default_rng(7)
    good = enc(rng.integers(0, 256, (24, 40), dtype=np.uint8))
    # strip the EOI, then cut right after the last 0xFF in the
    # entropy stream (a stuffed-byte prefix)
    body = good[:-2]
    cut = body.rindex(b"\xff") + 1
    with pytest.raises(ValueError, match="truncated"):
        dec(body[:cut])


def test_jpeg_rejects_non_baseline():
    import numpy as np
    import pytest

    from dask_cudf_spark.operators.multimodal import build_jpeg_codec

    enc, dec = build_jpeg_codec()
    data = bytearray(enc(np.zeros((8, 8), dtype=np.uint8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 1] = 0xC2  # progressive SOF
    with pytest.raises(NotImplementedError, match="progressive"):
        dec(bytes(data))
    with pytest.raises(ValueError, match="SOI"):
        dec(b"\x00\x01")


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 (2x2 luma MCUs + box-averaged chroma, the dominant
    real-world layout): flat color is exact (box average of flat is
    flat, upsample replicates), smooth gradients stay within a small
    mean error, odd dimensions handled."""
    import numpy as np

    from dask_cudf_spark.operators.multimodal import build_jpeg_codec

    enc, dec = build_jpeg_codec()
    flat = np.full((16, 16, 3), [120, 60, 200], dtype=np.uint8)
    assert np.array_equal(dec(enc(flat, subsample="420")), flat)
    xx, yy = np.meshgrid(np.arange(32), np.arange(16))
    sm = np.stack(
        [(xx * 4) % 256, (yy * 8) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    out = dec(enc(sm, subsample="420"))
    assert out.shape == sm.shape
    assert np.mean(np.abs(out.astype(float) - sm.astype(float))) < 4.0
    rng = np.random.default_rng(5)
    odd = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    assert dec(enc(odd, subsample="420")).shape == (13, 19, 3)


def test_mjpeg_codec_flat_exact_and_container_errors():
    """MJPEG-in-AVI (round 7): flat frames round-trip EXACTLY through
    per-frame baseline JPEG in '00dc' chunks (DC-only blocks, quant
    step 1); container-level guards — fourcc mismatch, frame-count
    mismatch, truncation — raise typed ValueErrors."""
    import numpy as np
    import pytest

    from dask_cudf_spark.operators.multimodal import (
        build_avi_codec,
        build_mjpeg_codec,
    )

    enc, dec = build_mjpeg_codec()
    frames = [np.full((8, 8), v, dtype=np.uint8) for v in (0, 255, 17)]
    m = dec(enc(frames, fps=10))
    assert m == {
        "width": 8,
        "height": 8,
        "n_frames": 3,
        "fps": 10,
        "duration_us": 300000,
        "sum_pix": 64 * (0 + 255 + 17),
        "min_pix": 0,
        "max_pix": 255,
    }
    # a real compressed stream: non-flat frames decode within JPEG loss
    rng = np.random.default_rng(7)
    noisy = [
        rng.integers(0, 256, (16, 24), dtype=np.uint8) for _ in range(2)
    ]
    m2 = dec(enc(noisy))
    assert (m2["width"], m2["height"], m2["n_frames"]) == (24, 16, 2)
    # uncompressed AVI is NOT an MJPEG stream (fourcc guard)
    enc_avi, _ = build_avi_codec()
    with pytest.raises(ValueError, match="fccHandler"):
        dec(enc_avi([bytes(64)], 8, 8))
    # frame-count lies are caught
    buf = bytearray(enc(frames))
    i = buf.find(b"avih") + 8 + 16  # dwTotalFrames field
    buf[i : i + 4] = (7).to_bytes(4, "little")
    with pytest.raises(ValueError, match="frame count mismatch"):
        dec(bytes(buf))
    with pytest.raises(ValueError, match="truncated|RIFF"):
        dec(bytes(enc(frames))[:40])
