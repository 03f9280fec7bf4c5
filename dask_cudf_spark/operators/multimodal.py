"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference context (SURVEY.md §2.12): dask-cudf pipelines carry media as
binary columns with struct metadata alongside text (the NeMo-Curator
pattern); decode/feature-extraction runs per-partition on the GPU. Here
the same model is Spark-first:

- payload: ``BinaryType`` column (parquet stores it natively; at 100 TB
  the payloads dominate I/O, so metadata lives in a separate struct
  column — predicate pushdown on metadata never touches the bytes).
- metadata: ``StructType`` (modality, n_bytes, checksum) — filter/join
  on it JVM-side without deserializing payloads.
- frame sampling: pure SQL (``sequence`` + ``substring`` over binary) —
  no Python, scales linearly, never shuffles.
- decode / feature-extract: Arrow-batched ``mapInPandas`` — the real
  plumbing (schema, batch iteration, partition-parallel). The actual
  image/audio codecs are NOT in this container, so ``decode_payload``
  gates on the library import and otherwise uses a deterministic fake
  (byte-level stats) so tests exercise the full path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

#: metadata carried next to every payload; filterable without I/O on bytes
PAYLOAD_META = StructType(
    [
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", modality: str = "image"
) -> DataFrame:
    """Attach a binary payload + metadata struct.

    Test stand-in: payload = UTF-8 bytes of ``text_col`` (deterministic,
    oracle-checkable). In production the payload column comes straight
    off parquet; only the metadata construction below is the pattern.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.lit(modality).alias("modality"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("checksum"),
        ),
    )


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    frame_bytes: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Fixed-size frame sampling over a binary payload (the video
    frame-sample / audio windowing primitive), pure SQL.

    Emits one row per full frame: (frame_idx, frame: binary). Partial
    tail frames are dropped — frame count is a closed-form function of
    n_bytes, so the op is oracle-checkable without blob support in the
    oracle engine. No shuffle: explode is partition-local.
    """
    n = F.octet_length(F.col(payload_col))
    # start offsets 1, 1+stride, ... while offset+frame_bytes-1 <= n
    starts = F.when(
        n >= frame_bytes,
        F.sequence(F.lit(1), n - frame_bytes + 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    frames = F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("long").alias("frame_idx"),
            F.col(payload_col).substr(s, F.lit(frame_bytes)).alias("frame"),
        ),
    )
    return df.select("*", F.explode(frames).alias("__f")).select(
        *df.columns, F.col("__f.frame_idx"), F.col("__f.frame")
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_min", LongType()),
        StructField("byte_max", LongType()),
        StructField("head_hash", LongType()),
    ]
)


def extract_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-payload feature extraction via Arrow-batched ``mapInPandas``.

    The features are deterministic byte-level stats — the stand-in for
    an image embedding / audio fingerprint. The plumbing is the real
    pattern: payloads arrive as Arrow binary batches, features leave as
    a fixed-width frame; runs partition-parallel with no shuffle.
    """
    import math
    import numpy as np

    def compute(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            payloads = pdf[payload_col]
            arrs = [np.frombuffer(b, dtype=np.uint8) for b in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [a.size for a in arrs],
                    # stats of NOTHING are NULL, not 0 (r10
                    # empty-payload convention, NULLS.md) — the count
                    # is 0, the mean/min/max of zero bytes undefined
                    # explicit half-up at 6dp: python round() is
                    # banker's, DuckDB ROUND is half-up — a mean that
                    # lands exactly on x.xxxxxx5 (sum/2^k bytes) split
                    # the engines (r11 corpus fuzz).  floor(x*1e6+0.5)
                    # /1e6 is the same op sequence the oracle runs.
                    "byte_mean": [
                        math.floor(float(a.mean()) * 1e6 + 0.5) / 1e6
                        if a.size
                        else None
                        for a in arrs
                    ],
                    "byte_min": [
                        int(a.min()) if a.size else None for a in arrs
                    ],
                    "byte_max": [
                        int(a.max()) if a.size else None for a in arrs
                    ],
                    # rolling-hash of the first 16 bytes (content fingerprint)
                    "head_hash": [
                        int(
                            sum(int(v) * 31**i for i, v in enumerate(a[:16]))
                            % (1 << 61)
                        )
                        for a in arrs
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(compute, FEATURE_SCHEMA)


def decode_payload(
    df: DataFrame, payload_col: str = "payload", modality: str = "image"
) -> DataFrame:
    """Decode payloads to (height, width, channels) via the real codec
    when available; this container has no image/audio libraries, so the
    codec import is gated and the call raises ``NotImplementedError``
    with the exact production recipe.

    NOTE (r4): the AUDIO (RIFF/WAVE PCM, :func:`build_wav_codec`) and
    IMAGE (8-bit PNG, :func:`build_png_codec`) modalities no longer
    need this stub — both containers decode for real with stdlib
    struct/zlib; only video and compressed formats (JPEG/H.264) remain
    codec-gated.

    Production: replace `_decode_stub` with PIL/libav inside the same
    mapInPandas signature — schema, batching, and parallelism are
    already correct.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as err:
        raise NotImplementedError(
            "generic payload decode requires an image/audio codec "
            "library (PIL / libav) not present in this environment.  "
            "Spec-implemented stdlib/numpy codecs ARE available for "
            "WAV (decode_wav), PNG (build_png_codec), AVI "
            "(build_avi_codec) and baseline JPEG (build_jpeg_codec — "
            "round 5); only compressed VIDEO codecs (H.264 etc.) "
            "remain gated here"
        ) from err
    raise NotImplementedError("real codec path not wired in this build")


def dedup_payloads(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact multimodal dedup on payload checksum — metadata-only
    (never compares bytes pairwise), one shuffle on the 256-bit hash."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(F.col(payload_col), 256)).orderBy(
        *[F.col(c) for c in df.columns if c != payload_col][:1] or [F.lit(1)]
    )
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


__all__ = [
    "PAYLOAD_META",
    "FEATURE_SCHEMA",
    "attach_payload",
    "sample_frames",
    "extract_features",
    "decode_payload",
    "dedup_payloads",
    "build_wav_codec",
    "decode_wav",
    "build_png_codec",
    "BinaryType",
]


def resample_signal(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    factor: int = 8,
    head: int = 4,
) -> DataFrame:
    """Signal decimation via block-mean pooling (the audio-resample /
    image-downscale stand-in): each payload's byte stream is split into
    ``factor``-byte blocks (tail remainder dropped) and each block
    reduces to its mean.  Real decode/resample (libsndfile/PIL) slots into the
    same mapInPandas body; the plumbing — Arrow binary batches in,
    fixed-width frame out, partition-parallel, zero shuffles — is the
    production pattern.

    Determinism: block means are emitted as scaled ints
    (sum * (10000 // factor), exact while 10000 % factor == 0) and the
    signal mean as an integer floor — bit-identical to the oracle's
    closed-form SQL.  ``head_csv`` carries the first ``head`` block
    means for spot inspection."""
    if 10000 % factor:
        raise ValueError("factor must divide 10000 for exact scaled means")
    scale = 10000 // factor
    out_schema = (
        f"{id_col} bigint, n_blocks bigint, sig_mean_s4 bigint, head_csv string"
    )

    def pool(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, n_blocks, means, heads = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                a = np.frombuffer(payload, dtype=np.uint8)
                nb = a.size // factor
                ids.append(int(doc_id))
                n_blocks.append(nb)
                if nb:
                    sums = (
                        a[: nb * factor]
                        .reshape(nb, factor)
                        .sum(axis=1, dtype=np.int64)
                    )
                    s4 = sums * scale
                    means.append(int(s4.sum() // nb))
                    heads.append(",".join(str(int(x)) for x in s4[:head]))
                else:
                    means.append(-1)
                    heads.append("")
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "n_blocks": n_blocks,
                    "sig_mean_s4": means,
                    "head_csv": heads,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(pool, out_schema)


def build_wav_codec():
    """Factory returning ``(encode_wav, decode_wav_meta)`` for RIFF/WAVE
    PCM — implemented from the PUBLIC RIFF/WAVE spec with stdlib struct
    only, so the AUDIO leg of decode_payload is REAL in this container
    (image/video still require PIL/libav and stay stubbed).  Factory
    form: the closures pickle BY VALUE for Spark workers (see
    functions/porter.build_porter_stem).

    encode_wav(pcm, sample_rate, channels, bits) -> container bytes.
    decode_wav_meta(buf) -> dict with n_channels, sample_rate,
    bits_per_sample, n_samples, duration_us, rms_s4 (centered RMS
    scaled 1e4, floor+0.5 — oracle-exact), peak (max |centered|).
    8-bit PCM is unsigned midpoint-128; 16-bit is signed LE.
    """
    import struct

    def encode_wav(pcm: bytes, sample_rate=16000, channels=1, bits=8):
        fmt = struct.pack(
            "<HHIIHH",
            1,  # PCM
            channels,
            sample_rate,
            sample_rate * channels * bits // 8,
            channels * bits // 8,
            bits,
        )
        riff_size = 4 + (8 + len(fmt)) + (8 + len(pcm))
        return (
            b"RIFF" + struct.pack("<I", riff_size) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
        )

    def decode_wav_meta(buf: bytes):
        if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE payload")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            pos += 8
            chunk = buf[pos : pos + size]
            pos += size + (size & 1)  # chunks are word-aligned
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", chunk, 0)
            elif cid == b"data":
                data = chunk
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        audio_format, channels, rate, _, block_align, bits = fmt
        if audio_format != 1:
            raise ValueError(f"only PCM supported, got format {audio_format}")
        n_samples = len(data) // block_align if block_align else 0
        if bits == 8:
            centered = [b - 128 for b in data]
        elif bits == 16:
            centered = [
                struct.unpack_from("<h", data, i)[0]
                for i in range(0, len(data) - 1, 2)
            ]
        else:
            raise ValueError(f"unsupported bits_per_sample {bits}")
        n = len(centered)
        sq = sum(v * v for v in centered)
        # stats of NOTHING are NULL, not 0 (the r10 empty-payload
        # convention, NULLS.md): an empty-but-valid container has a
        # well-defined sample COUNT (0) and duration (0), but its RMS
        # and peak are undefined — exactly what the SQL twin computes
        return {
            "n_channels": channels,
            "sample_rate": rate,
            "bits_per_sample": bits,
            "n_samples": n_samples,
            "duration_us": n_samples * 1_000_000 // rate if rate else 0,
            "rms_s4": int((sq / n) ** 0.5 * 10000 + 0.5) if n else None,
            "peak": max(abs(v) for v in centered) if n else None,
        }

    return encode_wav, decode_wav_meta


WAV_META_SCHEMA = (
    "doc_id long, n_channels int, sample_rate int, bits_per_sample int, "
    "n_samples long, duration_us long, rms_s4 long, peak long"
)


def decode_wav(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Real audio-container decode (RIFF/WAVE PCM) over a binary
    payload column: Arrow-batched mapInPandas, stdlib-only workers.
    Returns one metadata/energy row per payload (WAV_META_SCHEMA)."""
    import pandas as pd  # noqa: PLC0415

    _, decode_meta = build_wav_codec()

    def gen(batches):
        for pdf in batches:
            out = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                m = decode_meta(bytes(buf))
                m[id_col] = int(i)
                out.append(m)
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "n_channels", "sample_rate", "bits_per_sample",
                    "n_samples", "duration_us", "rms_s4", "peak",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(gen, WAV_META_SCHEMA)


def build_png_codec():
    """Factory returning ``(encode_png, decode_png_meta)`` for
    non-interlaced 8-bit PNG (gray / RGB / RGBA) — implemented from the
    PUBLIC PNG spec with stdlib zlib only: chunk framing + CRC32, IDAT
    inflate, and the full five-filter reconstruction (None/Sub/Up/
    Average/Paeth).  With this the IMAGE leg of multimodal decode is
    REAL in this container; only video (and compressed formats like
    JPEG) remain codec-gated.  Factory form: closures pickle by value
    for Spark workers.

    encode_png(pixels, width, height, channels, row_filter) -> bytes;
    ``row_filter`` picks each row's filter (int or callable(row_idx)),
    so encodes can deliberately exercise every filter type.
    decode_png_meta(buf) -> dict(height, width, channels, n_pixels,
    sum_pix, min_pix, max_pix) — integer stats, oracle-exact.
    """
    import struct
    import zlib

    SIG = b"\x89PNG\r\n\x1a\n"

    def _chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def encode_png(pixels: bytes, width: int, height: int, channels: int = 1,
                   row_filter=0) -> bytes:
        assert len(pixels) == width * height * channels
        colortype = {1: 0, 3: 2, 4: 6}[channels]
        ihdr = struct.pack(">IIBBBBB", width, height, 8, colortype, 0, 0, 0)
        stride = width * channels
        raw = bytearray()
        prev = bytes(stride)
        for r in range(height):
            row = pixels[r * stride : (r + 1) * stride]
            ft = row_filter(r) if callable(row_filter) else row_filter
            raw.append(ft)
            for i in range(stride):
                x = row[i]
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ft == 0:
                    f = x
                elif ft == 1:
                    f = (x - a) & 0xFF
                elif ft == 2:
                    f = (x - b) & 0xFF
                elif ft == 3:
                    f = (x - (a + b) // 2) & 0xFF
                elif ft == 4:
                    f = (x - _paeth(a, b, c)) & 0xFF
                else:
                    raise ValueError(f"bad filter {ft}")
                raw.append(f)
            prev = row
        return (
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    def decode_png_meta(buf: bytes):
        if buf[:8] != SIG:
            raise ValueError("not a PNG (bad signature)")
        pos = 8
        ihdr = None
        idat = bytearray()
        saw_iend = False
        while pos + 8 <= len(buf):
            (n,) = struct.unpack_from(">I", buf, pos)
            ctype = buf[pos + 4 : pos + 8]
            data = buf[pos + 8 : pos + 8 + n]
            (crc,) = struct.unpack_from(">I", buf, pos + 8 + n)
            if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
                raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
            pos += 12 + n
            if ctype == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", data)
            elif ctype == b"IDAT":
                idat += data
            elif ctype == b"IEND":
                saw_iend = True
                break
        if ihdr is None:
            raise ValueError("missing IHDR")
        if not saw_iend:
            # a stream cut between chunks passes every per-chunk CRC —
            # only the IEND terminator proves the container is whole
            # (r11 codec fuzz: decode must be exact-or-raise, never
            # stats from a partial stream)
            raise ValueError("truncated PNG (missing IEND)")
        width, height, depth, colortype, _, _, interlace = ihdr
        if depth != 8 or interlace != 0:
            raise ValueError("only 8-bit non-interlaced PNG supported")
        channels = {0: 1, 2: 3, 6: 4}.get(colortype)
        if channels is None:
            raise ValueError(f"unsupported color type {colortype}")
        raw = zlib.decompress(bytes(idat))
        stride = width * channels
        out = bytearray()
        prev = bytes(stride)
        pos = 0
        for _ in range(height):
            ft = raw[pos]
            pos += 1
            row = bytearray(raw[pos : pos + stride])
            pos += stride
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                if ft == 1:
                    row[i] = (row[i] + a) & 0xFF
                elif ft == 2:
                    row[i] = (row[i] + b) & 0xFF
                elif ft == 3:
                    row[i] = (row[i] + (a + b) // 2) & 0xFF
                elif ft == 4:
                    row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
                elif ft != 0:
                    raise ValueError(f"bad filter byte {ft}")
            out += row
            prev = bytes(row)
        # stats of NOTHING are NULL, not 0 (r10 empty-payload
        # convention, NULLS.md): a zero-pixel image has a defined pixel
        # COUNT (0) but no sum/min/max — matching the SQL twin's
        # aggregates-over-empty-list behavior
        return {
            "height": height,
            "width": width,
            "channels": channels,
            "n_pixels": width * height,
            "sum_pix": sum(out) if out else None,
            "min_pix": min(out) if out else None,
            "max_pix": max(out) if out else None,
        }

    return encode_png, decode_png_meta


def build_avi_codec():
    """Factory returning ``(encode_avi, decode_avi_meta)`` for
    uncompressed 8-bit grayscale AVI (RIFF 'AVI ' container, 'hdrl'
    with avih + one 'vids' stream header/format, 'movi' list of raw
    '00db' frames) — implemented from the PUBLIC RIFF/AVI spec with
    stdlib struct only.  With WAV and PNG this makes all three
    modalities' container decodes REAL in this container; compressed
    codecs (MJPEG/H.264) remain gated.  Factory form: closures pickle
    by value for Spark workers.

    encode_avi(frames, width, height, fps) -> bytes, where ``frames``
    is a list of width*height byte strings.
    decode_avi_meta(buf) -> dict(width, height, n_frames, fps,
    duration_us, sum_pix, min_pix, max_pix) — integer stats over ALL
    frame bytes, oracle-exact.
    """
    import struct

    def _chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def _list(ltype: bytes, payload: bytes) -> bytes:
        return _chunk(b"LIST", ltype + payload)

    def encode_avi(frames, width: int, height: int, fps: int = 25) -> bytes:
        n = len(frames)
        for f in frames:
            assert len(f) == width * height
        avih = struct.pack(
            "<14I",
            1_000_000 // fps,  # dwMicroSecPerFrame
            width * height * fps,  # dwMaxBytesPerSec
            0, 0,  # padding; flags=0 — no idx1 chunk is written, so
                      # AVIF_HASINDEX must NOT be claimed
            n, 0, 1, width * height,  # frames, initial, streams, bufsize
            width, height, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"\x00\x00\x00\x00", 0, 0, 0, 0,
            1, fps,  # dwScale / dwRate -> fps
            0, n, width * height, 0, 0,
            0, 0, width, height,
        )
        strf = struct.pack(
            "<IiiHHIIiiII",
            40, width, height, 1, 8, 0, width * height, 0, 0, 256, 0,
        )
        hdrl = _list(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
        )
        movi = _list(b"movi", b"".join(_chunk(b"00db", f) for f in frames))
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def decode_avi_meta(buf: bytes):
        if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI container")
        avih = None
        fps = None
        frames = []

        def walk(data, pos, end):
            nonlocal avih, fps
            end = min(end, len(data))  # declared sizes lie on truncation
            while pos + 8 <= end:
                cid = data[pos : pos + 4]
                size = struct.unpack_from("<I", data, pos + 4)[0]
                body_start = pos + 8
                if body_start + size > len(data):
                    raise ValueError(
                        f"truncated AVI: chunk {cid!r} claims {size} bytes "
                        f"past end of buffer"
                    )
                if cid == b"LIST":
                    walk(data, body_start + 4, body_start + size)
                elif cid == b"avih":
                    avih = struct.unpack_from("<14I", data, body_start)
                elif cid == b"strh":
                    s = struct.unpack_from("<4s4sIHHIIIIIIIIhhhh", data, body_start)
                    if s[0] == b"vids" and s[6]:
                        fps = s[7] // s[6]  # dwRate / dwScale
                elif cid == b"00db":
                    frames.append(data[body_start : body_start + size])
                pos = body_start + size + (size & 1)

        walk(buf, 12, len(buf))
        if avih is None:
            raise ValueError("missing avih header")
        n_frames, width, height = avih[4], avih[8], avih[9]
        if len(frames) != n_frames:
            raise ValueError(
                f"frame count mismatch: header {n_frames}, movi {len(frames)}"
            )
        allpix = b"".join(frames)
        fps = fps or (1_000_000 // avih[0] if avih[0] else 0)
        return {
            "width": width,
            "height": height,
            "n_frames": n_frames,
            "fps": fps,
            "duration_us": n_frames * 1_000_000 // fps if fps else 0,
            # same empty-payload convention as the PNG/WAV decoders
            "sum_pix": sum(allpix) if allpix else None,
            "min_pix": min(allpix) if allpix else None,
            "max_pix": max(allpix) if allpix else None,
        }

    return encode_avi, decode_avi_meta


def build_jpeg_codec():
    """Baseline JPEG (ITU-T T.81 / ISO 10918-1) encoder + decoder in
    pure numpy + stdlib — closes the compressed-image boundary the
    earlier rounds gated behind NotImplementedError.

    Scope: baseline sequential DCT, 8-bit, grayscale (1 component) or
    4:4:4 color (3 components, no chroma subsampling), one quant table
    and the Annex K luminance Huffman tables for every component,
    optional restart intervals on DECODE (RST0-7 resync), 0xFF00 byte
    unstuffing.  NOT progressive, NOT arithmetic-coded, NOT subsampled
    — each unimplemented mode raises with the marker that triggered it.

    The encoder is spec-written (FDCT -> quant -> zigzag -> DC
    difference + AC run-length -> Huffman -> stuffed entropy stream),
    so tests exercise the REAL decode pipeline end to end: Huffman
    tables parsed from DHT, coefficients entropy-decoded, dequantized,
    inverse-DCT'd, level-shifted, clipped.  On block-constant tiles
    with DC quant step 1 the codec is EXACTLY lossless (a flat block
    is DC-only and 8*(c-128) is an integer), which is what lets a SQL
    oracle verify the full machinery bit-for-bit; lossy behavior on
    general images is covered by round-trip PSNR tests.

    Returns ``(encode_jpeg, decode_jpeg)``:
      encode_jpeg(pixels: np.uint8 [h,w] or [h,w,3], quant=None) -> bytes
      decode_jpeg(data: bytes) -> np.uint8 array [h,w] or [h,w,3]
    """
    import numpy as np

    # ---- 8-point orthonormal DCT (matches T.81 coefficient scaling) --
    _x = np.arange(8)
    _T = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * 0.5
    _T[0, :] = 1 / (2 * np.sqrt(2.0))

    ZIGZAG = np.array([
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ])

    # all-ones quant table: DC step 1 -> flat blocks round-trip exactly
    FLAT_Q = np.ones(64, dtype=np.int64)

    # Annex K Table K.3 (luminance DC): BITS, HUFFVAL
    DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    DC_VALS = list(range(12))
    # Annex K Table K.5 (luminance AC)
    AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
    AC_VALS = [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ]

    def _build_codes(bits, vals):
        """(code, length) per symbol, canonical JPEG ordering."""
        codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                codes[vals[k]] = (code, length)
                code += 1
                k += 1
            code <<= 1
        return codes

    DC_ENC = _build_codes(DC_BITS, DC_VALS)
    AC_ENC = _build_codes(AC_BITS, AC_VALS)

    class _BitWriter:
        def __init__(self):
            self.out = bytearray()
            self.acc = 0
            self.n = 0

        def put(self, code, length):
            self.acc = (self.acc << length) | (code & ((1 << length) - 1))
            self.n += length
            while self.n >= 8:
                b = (self.acc >> (self.n - 8)) & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.n -= 8
            self.acc &= (1 << self.n) - 1

        def flush(self):
            if self.n:
                self.put(0x7F, 8 - self.n)  # pad with 1s per spec

    def _category(v):
        return int(v).bit_length() if v > 0 else int(-v).bit_length()

    def _mag_bits(v, size):
        return v if v >= 0 else v + (1 << size) - 1  # one's complement

    def _rgb_to_ycbcr(px):
        r = px[..., 0].astype(np.float64)
        g = px[..., 1].astype(np.float64)
        b = px[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        return [y, cb, cr]

    def _ycbcr_to_rgb(y, cb, cr):
        r = y + 1.402 * (cr - 128)
        g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
        b = y + 1.772 * (cb - 128)
        return np.clip(
            np.round(np.stack([r, g, b], axis=-1)), 0, 255
        ).astype(np.uint8)

    def _emit_block(bw, blk, q, pred, ci):
        """FDCT -> quant -> zigzag -> DC diff + AC runs -> Huffman."""
        F = _T @ blk @ _T.T
        zz = np.round(F.ravel()[ZIGZAG] / q).astype(np.int64)
        diff = int(zz[0] - pred[ci])
        pred[ci] = int(zz[0])
        size = _category(diff) if diff else 0
        c, ln = DC_ENC[size]
        bw.put(c, ln)
        if size:
            bw.put(_mag_bits(diff, size), size)
        run = 0
        last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
        for i in range(1, last_nz + 1):
            v = int(zz[i])
            if v == 0:
                run += 1
                continue
            while run > 15:
                c, ln = AC_ENC[0xF0]  # ZRL
                bw.put(c, ln)
                run -= 16
            size = _category(v)
            c, ln = AC_ENC[(run << 4) | size]
            bw.put(c, ln)
            bw.put(_mag_bits(v, size), size)
            run = 0
        if last_nz < 63:
            c, ln = AC_ENC[0x00]  # EOB
            bw.put(c, ln)

    def _box2(plane):
        """2x2 box average with edge replication to even dims."""
        H, W = plane.shape
        p = np.pad(plane, ((0, H % 2), (0, W % 2)), mode="edge")
        return (
            p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
        ) / 4.0

    def encode_jpeg(pixels, quant=None, subsample="444"):
        """subsample: '444' (no chroma subsampling) or '420' (2x2 luma
        MCUs with box-averaged chroma — the dominant real-world
        layout; color inputs only)."""
        px = np.asarray(pixels)
        if px.dtype != np.uint8:
            raise ValueError("pixels must be uint8")
        color = px.ndim == 3
        if color and px.shape[2] != 3:
            raise ValueError("color images must be [h, w, 3]")
        if subsample not in ("444", "420"):
            raise ValueError("subsample must be '444' or '420'")
        sub420 = color and subsample == "420"
        h, w = px.shape[:2]
        q = FLAT_Q if quant is None else np.asarray(quant, dtype=np.int64)
        planes = _rgb_to_ycbcr(px) if color else [px.astype(np.float64)]
        ncomp = len(planes)
        if sub420:
            samp = [(2, 2), (1, 1), (1, 1)]
            planes = [planes[0], _box2(planes[1]), _box2(planes[2])]
        else:
            samp = [(1, 1)] * ncomp
        max_h = max(s[0] for s in samp)
        max_v = max(s[1] for s in samp)
        mcus_w = -(-w // (8 * max_h))
        mcus_h = -(-h // (8 * max_v))

        bw = _BitWriter()
        pred = [0] * ncomp
        for my in range(mcus_h):
            for mx in range(mcus_w):
                for ci, plane in enumerate(planes):
                    hi, vi = samp[ci]
                    ph, pw = plane.shape
                    for v in range(vi):
                        for u in range(hi):
                            by = (my * vi + v) * 8
                            bx = (mx * hi + u) * 8
                            yy = np.minimum(
                                np.arange(by, by + 8), ph - 1
                            )
                            xx = np.minimum(
                                np.arange(bx, bx + 8), pw - 1
                            )
                            _emit_block(
                                bw,
                                plane[np.ix_(yy, xx)] - 128.0,
                                q,
                                pred,
                                ci,
                            )
        bw.flush()

        def seg(marker, payload):
            return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(
                2, "big"
            ) + payload

        out = bytearray(b"\xff\xd8")  # SOI
        out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in q))  # DQT
        sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        sof += bytes([ncomp])
        for ci in range(ncomp):
            hi, vi = samp[ci]
            sof += bytes([ci + 1, (hi << 4) | vi, 0])  # id, sampling, quant 0
        out += seg(0xC0, sof)  # SOF0 baseline
        out += seg(
            0xC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS)
        )  # DHT DC class 0 id 0
        out += seg(0xC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
        sos += bytes([0, 63, 0])  # spectral selection (baseline)
        out += seg(0xDA, sos)
        out += bw.out
        out += b"\xff\xd9"  # EOI
        return bytes(out)

    # ------------------------------ decoder --------------------------
    class _BitReader:
        def __init__(self, data, pos):
            self.d = data
            self.p = pos
            self.acc = 0
            self.n = 0

        def bit(self):
            if self.n == 0:
                if self.p >= len(self.d):
                    raise ValueError("entropy stream truncated")
                b = self.d[self.p]
                self.p += 1
                if b == 0xFF:
                    if self.p >= len(self.d):
                        raise ValueError("entropy stream truncated")
                    nxt = self.d[self.p]
                    if nxt == 0x00:
                        self.p += 1  # stuffed
                    else:
                        raise ValueError("marker inside entropy data")
                self.acc = b
                self.n = 8
            self.n -= 1
            return (self.acc >> self.n) & 1

        def bits(self, k):
            v = 0
            for _ in range(k):
                v = (v << 1) | self.bit()
            return v

        def align_to_marker(self):
            self.n = 0

    def _build_decode_tree(bits, vals):
        """code-int keyed by (length, code) -> symbol."""
        table = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                table[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        return table

    def _read_symbol(br, table):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def _extend(v, size):
        return v if v >= (1 << (size - 1)) else v - (1 << size) + 1

    def decode_jpeg(data):
        if data[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG (missing SOI)")
        pos = 2
        qtabs = {}
        dc_tabs, ac_tabs = {}, {}
        h = w = None
        comps = []  # (id, hsamp, vsamp, qid)
        restart = 0
        while pos < len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"expected marker at {pos}")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                break
            if marker in (0xC2, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9,
                          0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise NotImplementedError(
                    f"non-baseline SOF marker 0xFF{marker:02X} "
                    "(progressive/arithmetic JPEG not implemented)"
                )
            ln = int.from_bytes(data[pos:pos + 2], "big")
            body = data[pos + 2:pos + ln]
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(body):
                    pq, tq = body[i] >> 4, body[i] & 0xF
                    if pq != 0:
                        raise NotImplementedError("16-bit quant tables")
                    qtabs[tq] = np.frombuffer(
                        body[i + 1:i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
            elif marker == 0xC0:  # SOF0
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                n = body[5]
                comps = []
                for ci in range(n):
                    cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                    hi, vi = samp >> 4, samp & 0xF
                    if (hi, vi) not in ((1, 1), (2, 2)):
                        raise NotImplementedError(
                            f"sampling {hi}x{vi} (4:4:4 and 4:2:0 "
                            "supported)"
                        )
                    comps.append((cid, qid, hi, vi))
            elif marker == 0xC4:  # DHT (possibly several)
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0xF
                    bits = list(body[i + 1:i + 17])
                    nv = sum(bits)
                    vals = list(body[i + 17:i + 17 + nv])
                    tab = _build_decode_tree(bits, vals)
                    (dc_tabs if tc == 0 else ac_tabs)[th] = tab
                    i += 17 + nv
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(body[:2], "big")
            elif marker == 0xDA:  # SOS -> entropy data follows
                ns = body[0]
                sel = {}
                for ci in range(ns):
                    cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                    sel[cid] = (tt >> 4, tt & 0xF)
                br = _BitReader(data, pos + ln)
                ncomp = len(comps)
                max_h = max(c[2] for c in comps)
                max_v = max(c[3] for c in comps)
                mcus_w = -(-w // (8 * max_h))
                mcus_h = -(-h // (8 * max_v))
                planes = [
                    np.zeros(
                        (mcus_h * 8 * vi, mcus_w * 8 * hi),
                        dtype=np.float64,
                    )
                    for (_, _, hi, vi) in comps
                ]
                pred = [0] * ncomp
                mcu = 0
                for my in range(mcus_h):
                    for mx in range(mcus_w):
                        if restart and mcu and mcu % restart == 0:
                            br.align_to_marker()
                            m = data[br.p:br.p + 2]
                            if not (m[0] == 0xFF and 0xD0 <= m[1] <= 0xD7):
                                raise ValueError("expected RST marker")
                            br.p += 2
                            pred = [0] * ncomp
                        for ci, (cid, qid, hi, vi) in enumerate(comps):
                            dct, act = sel[cid]
                            for v in range(vi):
                                for u in range(hi):
                                    zz = np.zeros(64, dtype=np.int64)
                                    size = _read_symbol(br, dc_tabs[dct])
                                    diff = (
                                        _extend(br.bits(size), size)
                                        if size
                                        else 0
                                    )
                                    pred[ci] += diff
                                    zz[0] = pred[ci]
                                    i = 1
                                    while i < 64:
                                        sym = _read_symbol(
                                            br, ac_tabs[act]
                                        )
                                        if sym == 0x00:  # EOB
                                            break
                                        run, size = sym >> 4, sym & 0xF
                                        if size == 0:
                                            if run != 15:
                                                raise ValueError(
                                                    "bad AC symbol"
                                                )
                                            i += 16  # ZRL
                                            continue
                                        i += run
                                        if i >= 64:
                                            raise ValueError(
                                                "AC overflow"
                                            )
                                        zz[i] = _extend(
                                            br.bits(size), size
                                        )
                                        i += 1
                                    F = np.zeros(64, dtype=np.float64)
                                    F[ZIGZAG] = zz * qtabs[qid]
                                    blk = (
                                        _T.T @ F.reshape(8, 8) @ _T
                                        + 128.0
                                    )
                                    by = (my * vi + v) * 8
                                    bx = (mx * hi + u) * 8
                                    planes[ci][
                                        by:by + 8, bx:bx + 8
                                    ] = blk
                        mcu += 1
                # upsample subsampled components to full resolution
                full = []
                for ci, (_, _, hi, vi) in enumerate(comps):
                    p = planes[ci]
                    if hi != max_h or vi != max_v:
                        p = np.repeat(
                            np.repeat(p, max_v // vi, axis=0),
                            max_h // hi,
                            axis=1,
                        )
                    full.append(p[:h, :w])
                if ncomp == 1:
                    return np.clip(np.round(full[0]), 0, 255).astype(
                        np.uint8
                    )
                return _ycbcr_to_rgb(full[0], full[1], full[2])
            pos += ln
        raise ValueError("no SOS segment found")

    return encode_jpeg, decode_jpeg


def build_mjpeg_codec():
    """MJPEG-in-AVI (round 7): baseline-JPEG frames inside the RIFF/AVI
    container — the cheap closure of the "compressed video" boundary
    (r6 VERDICT item 6).  Composes the two codecs this repo already
    implements from their public specs: each frame is a complete
    T.81 baseline JPEG (build_jpeg_codec) carried as a '00dc'
    (compressed) movi chunk with fccHandler/biCompression 'MJPG', the
    layout every MJPEG-producing camera and ffmpeg write.  Only
    inter-frame-predicted codecs (H.264 etc.) remain gated.

    Factory form: closures pickle by value for Spark workers.

    encode_mjpeg(frames, fps) -> bytes, ``frames`` a list of np.uint8
    [h,w] (grayscale) or [h,w,3] (color) arrays of one shape.
    decode_mjpeg_meta(buf) -> dict(width, height, n_frames, fps,
    duration_us, sum_pix, min_pix, max_pix) — the stats computed over
    the DECODED pixels of every frame (a real entropy-decode + IDCT
    per frame, not a container skim), oracle-exact on flat tiles.
    """
    import struct

    import numpy as np

    encode_jpeg, decode_jpeg = build_jpeg_codec()

    def _chunk(cid: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return cid + struct.pack("<I", len(data)) + data + pad

    def _list(ltype: bytes, payload: bytes) -> bytes:
        return _chunk(b"LIST", ltype + payload)

    def encode_mjpeg(frames, fps: int = 25) -> bytes:
        h, w = frames[0].shape[:2]
        for f in frames:
            assert f.shape[:2] == (h, w)
        jpegs = [encode_jpeg(f) for f in frames]
        n = len(jpegs)
        maxbuf = max(len(j) for j in jpegs)
        avih = struct.pack(
            "<14I",
            1_000_000 // fps, maxbuf * fps,
            0, 0,  # padding; flags=0 (no idx1 -> no AVIF_HASINDEX)
            n, 0, 1, maxbuf,
            w, h, 0, 0, 0, 0,
        )
        strh = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"vids", b"MJPG", 0, 0, 0, 0,
            1, fps,  # dwScale / dwRate -> fps
            0, n, maxbuf, 0, 0,
            0, 0, w, h,
        )
        strf = struct.pack(
            "<IiiHHIIiiII",
            40, w, h, 1, 24,
            int.from_bytes(b"MJPG", "little"),  # biCompression fourcc
            w * h * 3, 0, 0, 0, 0,
        )
        hdrl = _list(
            b"hdrl",
            _chunk(b"avih", avih)
            + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
        )
        movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
        body = b"AVI " + hdrl + movi
        return b"RIFF" + struct.pack("<I", len(body)) + body

    def decode_mjpeg_meta(buf: bytes):
        if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI container")
        avih = None
        fps = None
        fourcc = None
        jpegs = []

        def walk(data, pos, end):
            nonlocal avih, fps, fourcc
            end = min(end, len(data))  # declared sizes lie on truncation
            while pos + 8 <= end:
                cid = data[pos : pos + 4]
                size = struct.unpack_from("<I", data, pos + 4)[0]
                body_start = pos + 8
                if body_start + size > len(data):
                    raise ValueError(
                        f"truncated AVI: chunk {cid!r} claims {size} "
                        f"bytes past end of buffer"
                    )
                if cid == b"LIST":
                    walk(data, body_start + 4, body_start + size)
                elif cid == b"avih":
                    avih = struct.unpack_from("<14I", data, body_start)
                elif cid == b"strh":
                    s = struct.unpack_from(
                        "<4s4sIHHIIIIIIIIhhhh", data, body_start
                    )
                    if s[0] == b"vids":
                        fourcc = s[1]
                        if s[6]:
                            fps = s[7] // s[6]  # dwRate / dwScale
                elif cid == b"00dc":
                    jpegs.append(data[body_start : body_start + size])
                pos = body_start + size + (size & 1)

        walk(buf, 12, len(buf))
        if avih is None:
            raise ValueError("missing avih header")
        if fourcc != b"MJPG":
            raise ValueError(
                f"not an MJPEG stream (fccHandler {fourcc!r}); "
                "uncompressed AVI decodes via build_avi_codec"
            )
        n_frames, width, height = avih[4], avih[8], avih[9]
        if len(jpegs) != n_frames:
            raise ValueError(
                f"frame count mismatch: header {n_frames}, "
                f"movi {len(jpegs)}"
            )
        pix = []
        for j in jpegs:
            p = decode_jpeg(j)
            if p.shape[:2] != (height, width):
                raise ValueError(
                    f"frame decodes to {p.shape[:2]}, header says "
                    f"{(height, width)}"
                )
            pix.append(p.astype(np.int64).ravel())
        allpix = (
            np.concatenate(pix) if pix else np.zeros(0, dtype=np.int64)
        )
        fps = fps or (1_000_000 // avih[0] if avih[0] else 0)
        return {
            "width": width,
            "height": height,
            "n_frames": n_frames,
            "fps": fps,
            "duration_us": n_frames * 1_000_000 // fps if fps else 0,
            "sum_pix": int(allpix.sum()),
            "min_pix": int(allpix.min()) if allpix.size else 0,
            "max_pix": int(allpix.max()) if allpix.size else 0,
        }

    return encode_mjpeg, decode_mjpeg_meta
