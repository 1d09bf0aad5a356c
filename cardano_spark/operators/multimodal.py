"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns with a typed metadata
struct alongside; decode / feature-extract runs as Arrow-batched
``mapInPandas`` (the Spark-idiomatic shape for per-blob Python work
— one Python worker call per ~10k-row Arrow batch, never per row).

Codec status: PNG and WAV decode FOR REAL via the stdlib
(:func:`decode_media` — full chunk walk, IHDR parse, IDAT zlib
decompression with scanline-length validation; ``wave`` for WAV).
Formats needing external codec libraries (mp4, jpeg, ...) raise
``NotImplementedError`` — :func:`decode_stub` keeps the
deterministic-fake path for them so the Spark-side plumbing —
schema, batching, partitioning — stays fully real and
oracle-checkable either way (q33 = fake path, q46 = real path).

Scale notes: payloads never pass through the driver; Arrow transfers
them batch-wise to Python workers. At 100 TB you'd store payloads in
parquet binary columns (or file paths + ``spark.read.format("binaryFile")``)
partitioned by media type so each task decodes one co-located batch.
"""

from __future__ import annotations

import hashlib
import io
import math
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cardano_spark.functions.scalars import sql_ident

#: bytes per synthetic "frame" — stands in for a media codec's frame/
#: chunk structure so the fan-out shape (1 blob -> N frames) is real.
FRAME_BYTES = 256

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize the multimodal layout from the documents table:
    an opaque binary payload (utf-8 bytes of the text — a stand-in
    for real media bytes) plus a typed metadata struct."""
    # (SQL-text construction, guide §1/§5; named_struct ≡ F.struct
    # with those field names, CASE ≡ the when-chain — same values.)
    text_col = sql_ident(text_col)
    return df.selectExpr(
        "doc_id",
        f"encode({text_col}, 'utf-8') AS payload",
        "named_struct("
        "'media_type', CASE WHEN doc_id % 3 = 0 THEN 'image/png'"
        " WHEN doc_id % 3 = 1 THEN 'audio/wav'"
        " ELSE 'video/mp4' END, "
        f"'declared_bytes', octet_length({text_col})) AS meta",
    )


def decode_stub(payload: bytes, media_type: str, deterministic_fake: bool):
    """Decode one media blob. Real decoding needs codec libraries not
    present in this environment; the deterministic fake derives
    features from the raw bytes instead."""
    if not deterministic_fake:
        raise NotImplementedError(
            "media decoding requires image/audio codec libraries; "
            "run with deterministic_fake=True for the plumbing path"
        )
    return {
        "n_bytes": len(payload),
        "n_frames": max(1, math.ceil(len(payload) / FRAME_BYTES)),
        "content_md5": hashlib.md5(payload).hexdigest(),
    }


# ---------------------------------------------------------------------------
# Real stdlib codecs (PNG, WAV) + deterministic synthesizers
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

MEDIA_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def synthesize_png(width: int, height: int, byte_val: int) -> bytes:
    """A fully valid 8-bit RGB PNG (signature, IHDR, one zlib IDAT of
    filter-0 scanlines, IEND) — a real file any viewer opens."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(
        b"\x00" + bytes([byte_val]) * (width * 3) for _ in range(height)
    )
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_wav(n_channels: int, sample_rate: int, n_frames: int) -> bytes:
    """A valid 16-bit PCM WAV of silence (stdlib ``wave`` writer)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * (n_frames * n_channels))
    return buf.getvalue()


def decode_media(payload: bytes, media_type: str) -> dict:
    """REAL decode for the formats the stdlib can parse.

    - ``image/png``: validates the signature, walks the chunk stream,
      parses IHDR (width/height/bit-depth/color-type), zlib-inflates
      the concatenated IDAT stream and checks it holds exactly
      ``height`` filter-prefixed scanlines — a malformed or truncated
      payload raises instead of returning garbage features.
    - ``audio/wav``: stdlib ``wave`` (RIFF header + fmt chunk).
    - anything else: ``NotImplementedError`` (external codec needed;
      use :func:`decode_stub`'s deterministic fake for plumbing).
    """
    if media_type == "image/png":
        if payload[:8] != _PNG_SIG:
            raise ValueError("bad PNG signature")
        width = height = bit_depth = color_type = None
        idat = b""
        off = 8
        while off + 8 <= len(payload):
            (length,) = struct.unpack(">I", payload[off : off + 4])
            tag = payload[off + 4 : off + 8]
            data = payload[off + 8 : off + 8 + length]
            if tag == b"IHDR":
                width, height, bit_depth, color_type = struct.unpack(
                    ">IIBB", data[:10]
                )
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            off += 12 + length  # len + tag + data + crc
        if width is None:
            raise ValueError("PNG missing IHDR")
        if bit_depth == 8:
            raw = zlib.decompress(idat)
            expect = height * (1 + width * _PNG_CHANNELS[color_type])
            if len(raw) != expect:
                raise ValueError(
                    f"PNG pixel stream {len(raw)}B != expected {expect}B"
                )
        return {
            "width": width,
            "height": height,
            "n_channels": _PNG_CHANNELS[color_type],
            "sample_rate": None,
            "n_samples": None,
        }
    if media_type == "audio/wav":
        with wave.open(io.BytesIO(payload)) as w:
            return {
                "width": None,
                "height": None,
                "n_channels": w.getnchannels(),
                "sample_rate": w.getframerate(),
                "n_samples": w.getnframes(),
            }
    raise NotImplementedError(
        f"no stdlib decoder for {media_type}; external codec required"
    )


def synthesize_png_gradient(did: int) -> bytes:
    """A valid 8-bit RGB PNG whose pixel at (x, y) has all three
    channels equal to ``(did*7 + x*3 + y*5) % 256`` — non-constant so
    a resample that reads the wrong source pixel changes the checksum.
    Dims follow the q46 rule: width ``1 + did%16``, height
    ``1 + did%8``."""
    width, height = 1 + did % 16, 1 + did % 8
    raw = b"".join(
        b"\x00"
        + bytes(
            v
            for x in range(width)
            for v in [(did * 7 + x * 3 + y * 5) % 256] * 3
        )
        for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def synthesize_wav_pcm(did: int) -> bytes:
    """A valid 16-bit mono PCM WAV with a deterministic non-silent
    signal: sample ``i`` is ``(did*31 + i*7) % 32768`` (always
    non-negative, so int16 round-trips exactly). Rate/length follow
    the q46 rule: rate ``8000 + (did%5)*1000``, ``100 + did%50``
    frames."""
    n = 100 + did % 50
    pcm = struct.pack(
        "<%dh" % n, *((did * 31 + i * 7) % 32768 for i in range(n))
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000 + (did % 5) * 1000)
        w.writeframes(pcm)
    return buf.getvalue()


def _png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit PNG into raw pixels: (width, height, channels,
    row-major sample bytes). Only filter type 0 (None) scanlines are
    supported — the synthesizers emit exactly that; a real corpus
    needs Paeth/Sub/Up unfiltering from a codec library, which is the
    documented NotImplementedError boundary."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    width = height = color_type = None
    idat = b""
    off = 8
    while off + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[off : off + 4])
        tag = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        if tag == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", data[:10])
            if bit_depth != 8:
                raise NotImplementedError("only 8-bit PNGs supported")
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        off += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(idat)
    stride = 1 + width * channels
    if len(raw) != height * stride:
        raise ValueError("PNG pixel stream length mismatch")
    out = bytearray()
    for y in range(height):
        row = raw[y * stride : (y + 1) * stride]
        if row[0] != 0:
            raise NotImplementedError(
                f"PNG filter type {row[0]} needs a codec library"
            )
        out += row[1:]
    return width, height, channels, bytes(out)


def resize_image_nn(payload: bytes, out_w: int, out_h: int) -> bytes:
    """REAL nearest-neighbor resize: decode the PNG to pixels, map
    output pixel (u, v) to source pixel ``(u*w_src // out_w,
    v*h_src // out_h)`` (floor mapping — the convention the oracle
    reproduces arithmetically), re-encode as PNG."""
    w, h, ch, px = _png_pixels(payload)
    rows = []
    for v in range(out_h):
        y = v * h // out_h
        row = bytearray(b"\x00")
        for u in range(out_w):
            x = u * w // out_w
            base = (y * w + x) * ch
            row += px[base : base + ch]
        rows.append(bytes(row))
    ihdr = struct.pack(">IIBBBBB", out_w, out_h, 8, 2 if ch == 3 else 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _png_chunk(b"IEND", b"")
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_channels", T.LongType()),
        T.StructField("px_sum", T.LongType()),
    ]
)


def image_resize_features(ids: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Synthesize gradient PNGs executor-side, resize for real
    (decode -> NN resample -> re-encode), then RE-DECODE the resized
    bytes and checksum the pixels (``px_sum`` = sum of every sample
    byte). A wrong index mapping, a bad re-encode, or a corrupt IDAT
    all change ``px_sum`` — the oracle predicts it arithmetically from
    the synthesis rule. Arrow-batched mapInPandas; payloads never
    visit the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                resized = resize_image_nn(
                    synthesize_png_gradient(did), out_w, out_h
                )
                w, h, ch, px = _png_pixels(resized)
                rows.append((did, w, h, ch, sum(px)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "n_channels", "px_sum"]
            )

    return ids.select("doc_id").mapInPandas(run, RESIZE_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("n_sampled", T.LongType()),
        T.StructField("amp_sum", T.LongType()),
    ]
)


def audio_frame_sample_features(ids: DataFrame, stride: int) -> DataFrame:
    """Synthesize PCM WAVs executor-side, then REALLY frame-sample:
    RIFF/fmt parse via the stdlib ``wave`` reader, int16 decode of the
    payload, keep every ``stride``-th frame, and sum the kept
    amplitudes. The oracle reproduces ``amp_sum`` from the synthesis
    rule with a generate_series sum, so endianness or off-by-one
    stride bugs hash-mismatch. Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                with wave.open(io.BytesIO(synthesize_wav_pcm(did))) as w:
                    rate = w.getframerate()
                    frames = w.readframes(w.getnframes())
                samples = struct.unpack("<%dh" % (len(frames) // 2), frames)
                kept = samples[::stride]
                rows.append((did, rate, len(kept), sum(kept)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sample_rate", "n_sampled", "amp_sum"]
            )

    return ids.select("doc_id").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def synthesize_media(ids: DataFrame) -> DataFrame:
    """Deterministic synthetic media source: even doc_ids get a real
    PNG (width 1+id%16, height 1+id%8, RGB), odd ones a real WAV
    (mono, rate 8000+(id%5)*1000, 100+id%50 frames). Runs as
    Arrow-batched mapInPandas — payload bytes are born executor-side
    and never visit the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                if did % 2 == 0:
                    rows.append(
                        (
                            did,
                            "image/png",
                            synthesize_png(1 + did % 16, 1 + did % 8, did * 7 % 256),
                        )
                    )
                else:
                    rows.append(
                        (
                            did,
                            "audio/wav",
                            synthesize_wav(1, 8000 + (did % 5) * 1000, 100 + did % 50),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "media_type", "payload"])

    return ids.select("doc_id").mapInPandas(
        run, "doc_id long, media_type string, payload binary"
    )


def decode_media_features(df: DataFrame) -> DataFrame:
    """Real-decode feature extraction over (doc_id, media_type,
    payload) via Arrow-batched mapInPandas; output MEDIA_DECODE_SCHEMA
    (format-inapplicable fields are typed NULLs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_media(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "width": pd.array([f["width"] for f in feats], dtype="Int64"),
                    "height": pd.array([f["height"] for f in feats], dtype="Int64"),
                    "n_channels": pd.array(
                        [f["n_channels"] for f in feats], dtype="Int64"
                    ),
                    "sample_rate": pd.array(
                        [f["sample_rate"] for f in feats], dtype="Int64"
                    ),
                    "n_samples": pd.array(
                        [f["n_samples"] for f in feats], dtype="Int64"
                    ),
                }
            )

    return df.mapInPandas(run, MEDIA_DECODE_SCHEMA)


def extract_features(df: DataFrame, deterministic_fake: bool = True) -> DataFrame:
    """Feature extraction over the payload column via Arrow-batched
    ``mapInPandas``. Input: (doc_id, payload, meta); output:
    FEATURE_SCHEMA rows, one per blob."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m, deterministic_fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.Series([f["n_bytes"] for f in feats], dtype="int64"),
                    "n_frames": pd.Series(
                        [f["n_frames"] for f in feats], dtype="int64"
                    ),
                    "content_md5": [f["content_md5"] for f in feats],
                }
            )

    flat = df.select("doc_id", "payload", F.col("meta.media_type").alias("media_type"))
    return flat.mapInPandas(run, FEATURE_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
    ]
)


def image_ahash(payload: bytes, grid: int = 8) -> tuple[int, int, int, int]:
    """Average-hash perceptual fingerprint of a decoded image: the
    classic aHash (downsample to ``grid`` x ``grid``, threshold each
    cell against the mean, pack the bits) in EXACT integer
    arithmetic — brightness is the raw channel sum, downsampling is
    the same floor-mapped nearest-neighbor as :func:`resize_image_nn`
    (``(u*w) // grid``), and the mean test is cross-multiplied
    (``s * grid^2 > total``) so no division ever happens. The 64-bit
    hash returns as two POSITIVE 32-bit halves (hi, lo) — sign-free
    in every engine, and a (hi, lo) group key works everywhere.

    Returns (width, height, ahash_hi, ahash_lo)."""
    w, h, ch, px = _png_pixels(payload)
    cells = grid * grid
    s = []
    for v in range(grid):
        y = v * h // grid
        for u in range(grid):
            x = u * w // grid
            base = (y * w + x) * ch
            s.append(sum(px[base : base + ch]))
    total = sum(s)
    ah = 0
    for i, sv in enumerate(s):
        if sv * cells > total:
            ah |= 1 << i
    return w, h, ah >> 32, ah & 0xFFFFFFFF


def image_ahash_features(
    ids: DataFrame, seed_mod: int | None = None
) -> DataFrame:
    """Synthesize gradient PNGs executor-side (seed =
    ``100 + (doc_id % seed_mod) * 17`` when ``seed_mod`` is set — the
    planted-duplicate rule the q122 oracle reproduces — else
    ``doc_id``), decode for REAL, and emit the aHash fingerprint.
    Arrow-batched mapInPandas; payloads never visit the driver. The
    perceptual-dedup step is then a plain groupBy on (hi, lo) — the
    exact-dedup shape applied to image content instead of text."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                seed = (
                    100 + (did % seed_mod) * 17 if seed_mod is not None else did
                )
                w, h, hi, lo = image_ahash(synthesize_png_gradient(seed))
                rows.append((did, w, h, hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ahash_hi", "ahash_lo"]
            )

    return ids.select("doc_id").mapInPandas(run, AHASH_SCHEMA)


AUDIO_FP_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("fp_hi", T.LongType()),
        T.StructField("fp_lo", T.LongType()),
    ]
)


def audio_fingerprint(payload: bytes, frames: int = 64) -> tuple[int, int, int]:
    """Perceptual audio fingerprint — :func:`image_ahash`'s rule
    applied to the time axis (the energy-profile family behind
    Chromaprint-style matchers, reduced to its integer core): decode
    the PCM for REAL (RIFF parse via the stdlib ``wave`` reader,
    little-endian int16 unpack), split the sample stream into
    ``frames`` floor-mapped segments (``f*n//frames`` — the same
    boundary rule as the aHash downsample, segments may be empty when
    n < frames), and set bit ``f`` iff the segment's amplitude sum
    beats the global mean, cross-multiplied (``e * frames > total``)
    so no division ever happens. EXACT integer arithmetic end to end
    — int16 sums of any real-world length stay far under 2^53 — and
    the 64-bit fingerprint returns as two POSITIVE 32-bit halves, the
    q122 sign-free convention, so :func:`cardano_spark.operators.
    dedup.split64_hamming_pairs` consumes it directly.

    Returns (n_samples, fp_hi, fp_lo)."""
    with wave.open(io.BytesIO(payload)) as w:
        data = w.readframes(w.getnframes())
    samples = struct.unpack("<%dh" % (len(data) // 2), data)
    n = len(samples)
    total = sum(samples)
    bits = 0
    for f in range(frames):
        e = sum(samples[f * n // frames : (f + 1) * n // frames])
        if e * frames > total:
            bits |= 1 << f
    return n, bits >> 32, bits & 0xFFFFFFFF


def audio_fingerprint_features(
    ids: DataFrame,
    seed_base: int = 132,
    seed_step: int = 50,
    seed_mod: int = 4,
) -> DataFrame:
    """Synthesize PCM WAVs executor-side (seed = ``seed_base +
    seed_step * (doc_id % seed_mod)`` — a step of 50 keeps every
    class at the same sample count ``100 + seed%50``, so the classes
    are RENDITIONS of the same length whose energy profiles differ by
    a global level shift; the q124 oracle reproduces the rule), decode
    for REAL, and emit the 64-frame energy fingerprint. Arrow-batched
    mapInPandas; payloads never visit the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                seed = seed_base + seed_step * (did % seed_mod)
                n, hi, lo = audio_fingerprint(synthesize_wav_pcm(seed))
                rows.append((did, n, hi, lo))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "fp_hi", "fp_lo"]
            )

    return ids.select("doc_id").mapInPandas(run, AUDIO_FP_SCHEMA)


VIDEO_MAGIC = b"RAWV"

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("ahash_hi", T.LongType()),
        T.StructField("ahash_lo", T.LongType()),
    ]
)


def synthesize_video(did: int, n_frames: int | None = None) -> bytes:
    """A deterministic VIDEO container in the length-prefixed frame
    form every real wrapper reduces to once a codec library has done
    its work (magic + uint32 frame count + per frame uint32 length +
    payload — the reduced-to-its-integer-core analogue of an MJPEG
    stream, the q46 stub-boundary discipline made REAL one level up):
    frame ``f`` is a genuine :func:`synthesize_png_gradient` PNG at
    seed ``did + 29*f``, so consecutive frames differ and a sampler
    that decodes the wrong frame changes the hash. Frame count
    ``4 + did % 5`` unless given."""
    n = (4 + did % 5) if n_frames is None else int(n_frames)
    parts = [VIDEO_MAGIC, struct.pack(">I", n)]
    for f in range(n):
        frame = synthesize_png_gradient(did + 29 * f)
        parts.append(struct.pack(">I", len(frame)))
        parts.append(frame)
    return b"".join(parts)


def parse_video(payload: bytes) -> list[bytes]:
    """Parse the container for REAL: magic, frame count, each
    length-prefixed frame; trailing bytes are an error (a truncated
    or overlong stream must fail loudly, not yield a short video)."""
    if payload[:4] != VIDEO_MAGIC:
        raise ValueError("not a RAWV container")
    (n,) = struct.unpack(">I", payload[4:8])
    frames: list[bytes] = []
    off = 8
    for _ in range(n):
        (ln,) = struct.unpack(">I", payload[off : off + 4])
        off += 4
        frames.append(payload[off : off + ln])
        off += ln
    if off != len(payload):
        raise ValueError("trailing bytes after last frame")
    return frames


def video_frame_sample_features(ids: DataFrame, stride: int = 2) -> DataFrame:
    """Video FRAME-SAMPLING — the prompt-level multimodal operation
    still missing after images (decode/resize/aHash) and audio
    (frame-sample/fingerprint): synthesize the container
    executor-side, parse it for REAL, decode every ``stride``-th
    frame (``f = 0, stride, 2*stride, ...`` — the keyframe-ish
    sampling a training pipeline runs so a 10-minute clip costs a
    handful of frame embeddings, not 18k), and emit each sampled
    frame's EXACT-integer aHash (:func:`image_ahash` — the q122
    arithmetic, so a DuckDB oracle re-derives every output hash in
    closed form from (doc_id, frame_idx)).

    Arrow-batched ``mapInPandas`` over the id column only — payloads
    are built, parsed and decoded inside the executor and never visit
    the driver or an exchange; output is one slim row per SAMPLED
    frame. This is the one budgeted Python boundary shape
    (tests/test_plan_audit.py PYTHON_BUDGET)."""
    if stride < 1:
        raise ValueError("stride must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                frames = parse_video(synthesize_video(did))
                for f in range(0, len(frames), stride):
                    w, h, hi, lo = image_ahash(frames[f])
                    rows.append((did, len(frames), f, w, h, hi, lo))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "frame_idx",
                    "width", "height", "ahash_hi", "ahash_lo",
                ],
            )

    return ids.select("doc_id").mapInPandas(run, VIDEO_FRAME_SCHEMA)
