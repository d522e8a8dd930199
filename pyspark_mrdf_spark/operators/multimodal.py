"""Multimodal column handling: opaque ``binary`` payloads + typed metadata.

North-star "multimodal columns" for a training-data pipeline: images /
audio / video ride through the engine as ``BinaryType`` columns with a
typed metadata struct; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so the payload bytes never leave
the executors and the work parallelizes per input partition.

``decode_image`` is a REAL codec: a dependency-free 24-bit BMP parser
(the container ships no image libraries, and BMP needs none), with
``decode_pixel_features`` running it as the Spark kernel over payload
columns. Formats that do need a codec library (PNG/JPEG/WAV/MP4) slot
into the same function without touching the Spark plumbing; the
byte-level ``decode_features`` kernel remains as the codec-free
feature path the q61 oracle checks. Everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape — is identical between
the two.

Payloads are derived deterministically from ``documents.text`` (UTF-8
bytes) because the harness ships no binary fixtures; at 100 TB the
same plumbing reads parquet ``binary`` columns written by an upstream
crawler (scan → mapInPandas stays identical, and Parquet stores the
bytes unencoded either way).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

FRAME_BYTES = 256

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("max_byte", IntegerType(), False),
        StructField("min_byte", IntegerType(), False),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("frame", BinaryType(), False),
    ]
)


def attach_payloads(docs: DataFrame) -> DataFrame:
    """documents → multimodal table: (doc_id, modality, payload, meta).

    All JVM-side Column expressions (no UDF): payload = UTF-8 bytes of
    the text; modality assigned round-robin by doc_id; ``meta`` is the
    typed metadata struct (mime, byte_len, width, height, sample_rate,
    n_frames) an upstream decoder would have recorded."""
    payload = F.encode("text", "UTF-8")
    byte_len = F.octet_length(payload).cast("bigint")
    mod3 = F.col("doc_id") % 3
    modality = (
        F.when(mod3 == 0, F.lit("image"))
        .when(mod3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(mod3 == 0, F.lit("image/png"))
        .when(mod3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            byte_len.alias("byte_len"),
            (64 + F.col("doc_id") % 64).cast("int").alias("width"),
            (64 + (F.col("doc_id") * 7) % 64).cast("int").alias("height"),
            (8000 + 1000 * (F.col("doc_id") % 5)).cast("int").alias("sample_rate"),
            F.ceil(byte_len / FRAME_BYTES).cast("bigint").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode: dependency-free 24-bit uncompressed BMP
    parser → (height, width, 3) uint8 RGB array.

    BMP (BITMAPFILEHEADER + BITMAPINFOHEADER, BI_RGB) is the one
    mainstream raster format decodable without a codec library, which
    this container does not ship; richer codecs (PNG/JPEG via pillow,
    frames via ffmpeg) slot into this same function without touching
    any Spark plumbing. Handles bottom-up (positive height) and
    top-down (negative height) row order and the 4-byte row padding
    the format mandates. Raises ``ValueError`` on anything that is not
    a 24bpp BI_RGB BMP."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (planes={planes}, bpp={bpp}, "
            f"compression={compression}); only 24bpp BI_RGB is implemented"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad BMP dimensions {width}x{height}")
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} bytes, need {need}")
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * height, offset=data_offset)
    rows = rows.reshape(height, stride)[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        rows = rows[::-1]  # stored bottom-up
    return rows[..., ::-1].copy()  # BGR -> RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of ``decode_image`` for tests and payload synthesis:
    (height, width, 3) uint8 RGB → 24bpp bottom-up BI_RGB BMP bytes."""
    import struct

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) pixels, got {px.shape}")
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB->BGR, bottom-up
    data = body.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


def synth_bmp_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a deterministic gradient BMP per document —
    the binary-fixture synthesizer for the pixel-path oracle (q81).

    Image shape and pixel values are pure arithmetic in ``doc_id`` so a
    SQL oracle can recompute the decoded per-channel means exactly:

      w = 16 + doc_id % 16,  h = 8 + (7·doc_id) % 16
      R(y,x) = doc_id % 128 + x          (max 127+30 < 256, no wrap)
      G(y,x) = (7·doc_id) % 128 + y
      B(y,x) = (13·doc_id) % 64 + x + y

    so mean_R = doc_id % 128 + (w−1)/2 etc., and the ×1000 fixed-point
    means are exact integers ((w−1)·500 — float64 division is exact for
    half-integer quotients). Odd widths make ``w·3 mod 4 ≠ 0``, so the
    BMP 4-byte row padding and the bottom-up row order both sit on the
    encode→decode path the query exercises."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            payloads: list[bytes] = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 16 + d % 16
                h = 8 + (d * 7) % 16
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                px = np.empty((h, w, 3), dtype=np.uint8)
                px[..., 0] = d % 128 + x + 0 * y
                px[..., 1] = (d * 7) % 128 + y + 0 * x
                px[..., 2] = (d * 13) % 64 + x + y
                ids.append(d)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(_synth, schema)


PIXEL_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_r_e3", LongType(), False),
        StructField("mean_g_e3", LongType(), False),
        StructField("mean_b_e3", LongType(), False),
    ]
)


def decode_pixel_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-image features from ACTUALLY-DECODED pixels: (doc_id, width,
    height, per-channel mean ×1000 as int64 — fixed-point, so the
    values are engine-portable like every other checked aggregate).

    Same mapInPandas shape as ``decode_features`` but the kernel body
    is the real ``decode_image`` codec: Arrow batch in, decoded NumPy
    pixel block per row, feature frame out; payload bytes never leave
    the executors and the work parallelizes per input partition."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                px = decode_image(bytes(payload))
                means = px.reshape(-1, 3).mean(axis=0)
                rows.append(
                    (
                        int(doc_id),
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(round(means[0] * 1000)),
                        int(round(means[1] * 1000)),
                        int(round(means[2] * 1000)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "mean_r_e3", "mean_g_e3", "mean_b_e3"],
            )

    return df.select("doc_id", payload_col).mapInPandas(_decode, PIXEL_FEATURE_SCHEMA)


# --- perceptual image hashing (dHash) -------------------------------
#
# Image dedup at corpus scale is perceptual-hash dedup: a crawler
# re-encodes, resizes, and brightness-shifts the same picture, so byte
# hashes (q40) never match — but a difference hash over a coarse
# grayscale grid is invariant to all three, and near-duplicate frames
# land within a small Hamming radius. The pipeline below mirrors the
# text SimHash family exactly (48-bit signature, 3×16-bit pigeonhole
# bands, bit_count verify on candidates only), so the candidate
# generation is an equi-join — never an image-pair cross join.

DHASH_GRID_ROWS = 6
DHASH_GRID_COLS = 9  # 9 columns -> 8 difference bits/row -> 48 bits

DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("dhash", LongType(), False),
    ]
)

PATTERN_N_GROUPS = 40
PATTERN_CELL_LO = 20
PATTERN_CELL_SPAN = 200


def _pattern_cell_value(key: str) -> int:
    """md5-portable cell intensity in [20, 220): first 8 md5 hex chars
    of ``key`` as an integer, mod 200 — the same
    ``CAST(concat('0x', substr(md5(k), 1, 8)) AS BIGINT) % 200`` any
    SQL engine derives, so an oracle can replay every pixel."""
    import hashlib

    h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16)
    return PATTERN_CELL_LO + h % PATTERN_CELL_SPAN


def synth_pattern_bmp_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): pattern BMPs with a PLANTED near-duplicate
    structure for the perceptual-hash path (q121).

    Docs sharing ``doc_id % 40`` render the same 6×9 cell pattern
    (cell intensity = md5-derived int in [20,220), R=G=B), but each
    doc varies everything a byte hash would see and a perceptual hash
    must ignore:

      - size:        w = 9·(2 + d%3), h = 6·(2 + (d//3)%3) — the two
                     scales are INDEPENDENT across docs (w from d mod 3,
                     h from the next ternary digit), so same-group pairs
                     include anisotropic resizes (w up 2×, h up 3×)
      - brightness:  +(d % 20) on every channel (max 219+19 < 256)
      - content:     docs with d % 5 == 0 get ONE cell
                     (r,c) = ((d//5)%6, (d//5)%9) replaced by an
                     md5-derived per-doc value — flips ≤2 dHash bits

    so same-group pairs are near-dups (Hamming ≤ 4 between two
    perturbed members), cross-group pairs are ~24 bits apart. Widths
    18/27/36 put the 27-px odd-stride case on the 4-byte row-padding
    path, as q81 does. Every quantity is closed-form in doc_id and
    md5, so a SQL oracle recomputes the exact hash."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            payloads: list[bytes] = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g = d % PATTERN_N_GROUPS
                cells = np.empty((DHASH_GRID_ROWS, DHASH_GRID_COLS), dtype=np.int64)
                for r in range(DHASH_GRID_ROWS):
                    for c in range(DHASH_GRID_COLS):
                        cells[r, c] = _pattern_cell_value(f"cell:{g}:{r}:{c}")
                if d % 5 == 0:
                    pr, pc = (d // 5) % DHASH_GRID_ROWS, (d // 5) % DHASH_GRID_COLS
                    cells[pr, pc] = _pattern_cell_value(f"pert:{d}")
                w = DHASH_GRID_COLS * (2 + d % 3)
                h = DHASH_GRID_ROWS * (2 + (d // 3) % 3)
                val = cells + d % 20  # per-doc brightness shift
                # expand cells to pixels (blocks are exact multiples)
                gray = np.repeat(
                    np.repeat(val, h // DHASH_GRID_ROWS, axis=0),
                    w // DHASH_GRID_COLS,
                    axis=1,
                ).astype(np.uint8)
                px = np.stack([gray, gray, gray], axis=2)
                ids.append(d)
                payloads.append(encode_bmp(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(_synth, schema)


def image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    grid_rows: int = DHASH_GRID_ROWS,
    grid_cols: int = DHASH_GRID_COLS,
) -> DataFrame:
    """Difference hash over ACTUALLY-DECODED pixels: (doc_id, width,
    height, dhash) where dhash packs ``grid_rows × (grid_cols-1)``
    bits (default 6×8 = 48, matching the SimHash band machinery).

    The classic dHash resize-to-9×8-then-compare, made engine-exact:
    grayscale is the INTEGER channel sum (no luma-weight float), the
    grid "resize" is block MEANS with floor boundaries
    ``x0 = c·w // grid_cols``, and each bit compares adjacent block
    means by integer cross-multiplication (``sum_r·area_l >
    sum_l·area_r``) — no division anywhere, so the hash is
    bit-reproducible on any engine, any partitioning. Invariant to
    uniform brightness shifts and to any resize that preserves
    block-mean order (exact for block-constant content)."""
    if grid_cols < 2:
        raise ValueError(f"image_dhash: grid_cols must be >= 2, got {grid_cols}")
    bit_idx = (
        np.arange(grid_rows)[:, None] * (grid_cols - 1) + np.arange(grid_cols - 1)[None, :]
    ).astype(np.int64)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                px = decode_image(bytes(payload))
                h, w = px.shape[:2]
                if h < grid_rows or w < grid_cols:
                    raise ValueError(
                        f"image_dhash: image {w}x{h} smaller than the "
                        f"{grid_cols}x{grid_rows} hash grid (doc {int(doc_id)})"
                    )
                gray = px.astype(np.int64).sum(axis=2)  # R+G+B, exact
                yb = (np.arange(grid_rows) * h) // grid_rows
                xb = (np.arange(grid_cols) * w) // grid_cols
                block = np.add.reduceat(np.add.reduceat(gray, yb, axis=0), xb, axis=1)
                area = np.outer(
                    np.diff(np.append(yb, h)), np.diff(np.append(xb, w))
                ).astype(np.int64)
                bits = (block[:, 1:] * area[:, :-1] > block[:, :-1] * area[:, 1:]).astype(
                    np.int64
                )
                rows.append((int(doc_id), int(w), int(h), int((bits << bit_idx).sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "dhash"])

    return df.select("doc_id", payload_col).mapInPandas(_hash, DHASH_SCHEMA)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Real audio decode: dependency-free PCM16 RIFF/WAVE parser →
    (samples int16 flat channel-interleaved, sample_rate, n_channels).

    WAV/PCM is the audio analogue of 24bpp BMP — the one mainstream
    container decodable without a codec library (which this container
    does not ship); compressed formats (MP3/AAC/FLAC) slot into this
    same function without touching the Spark plumbing. Walks the RIFF
    chunk list honoring the format's word alignment (an odd-sized
    chunk carries one pad byte — the quirk the synthesizer plants a
    'junk' chunk to exercise, like q81's odd-width BMP rows exercise
    4-byte padding). Raises ``ValueError`` on anything that is not
    16-bit integer PCM."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if pos + 8 + size > len(payload):
            raise ValueError(f"truncated WAV chunk {tag!r} at offset {pos}")
        if tag == b"fmt ":
            fmt = payload[pos + 8 : pos + 8 + size]
        elif tag == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError(f"fmt chunk too short ({len(fmt)} bytes)")
    audio_format, n_channels, sample_rate, _rate, _align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format != 1 or bits != 16:
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits}); "
            "only 16-bit integer PCM is implemented"
        )
    if n_channels < 1:
        raise ValueError(f"bad channel count {n_channels}")
    if len(data) % (2 * n_channels):
        raise ValueError(
            f"data chunk ({len(data)} bytes) not a whole number of "
            f"{n_channels}-channel 16-bit frames"
        )
    return np.frombuffer(data, dtype="<i2"), sample_rate, n_channels


def encode_wav(
    samples: np.ndarray,
    sample_rate: int,
    n_channels: int = 1,
    junk: bytes | None = None,
) -> bytes:
    """Inverse of ``decode_wav`` for tests and payload synthesis:
    int16 flat interleaved samples → PCM16 RIFF/WAVE bytes. ``junk``
    inserts an extra chunk before ``data`` (odd lengths get the
    mandated pad byte) so decoders must actually walk the chunk
    list."""
    import struct

    s = np.asarray(samples, dtype="<i2")
    if s.ndim != 1 or len(s) % n_channels:
        raise ValueError(f"{len(s)} samples not divisible into {n_channels} channels")
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * 2 * n_channels, 2 * n_channels, 16
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if junk is not None:
        chunks += b"junk" + struct.pack("<I", len(junk)) + junk + (b"\x00" * (len(junk) & 1))
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synth_wav_payloads(docs: DataFrame) -> DataFrame:
    """(doc_id, payload): a deterministic PCM16 WAV per document — the
    binary-fixture synthesizer for the audio-path oracle (q112),
    mirroring ``synth_bmp_payloads``.

    Waveform values are pure integer arithmetic in ``doc_id`` so a SQL
    oracle can recompute the decoded stats exactly:

      m        = 64 + d % 64 total samples
      channels = 2 if d even else 1   (m is even whenever d is)
      rate     = 8000 + 1000·(d % 5)
      s[i]     = (31·d + 297·i² + 17·i) mod 2048 − 1024,  i = 0..m−1

    The quadratic term makes the waveform wrap the modulus every few
    samples, so the zero-crossing count varies 26–67 across documents
    (a linear ramp wraps ≤2 times and crossings degenerate to ~1 —
    too weak a signal to verify a codec with).

    Every third document carries an odd-length 'junk' chunk before
    'data', putting RIFF word alignment on the decode path the query
    exercises (the BMP analogue: odd widths → 4-byte row padding)."""
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            payloads: list[bytes] = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                m = 64 + d % 64
                i = np.arange(m, dtype=np.int64)
                s = (31 * d + 297 * i * i + 17 * i) % 2048 - 1024
                ids.append(d)
                payloads.append(
                    encode_wav(
                        s.astype(np.int16),
                        sample_rate=8000 + 1000 * (d % 5),
                        n_channels=2 if d % 2 == 0 else 1,
                        junk=b"\x01\x02\x03" if d % 3 == 0 else None,
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(_synth, schema)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("sample_rate", IntegerType(), False),
        StructField("n_channels", IntegerType(), False),
        StructField("n_frames", LongType(), False),
        StructField("min_amp", IntegerType(), False),
        StructField("max_amp", IntegerType(), False),
        StructField("sum_abs", LongType(), False),
        StructField("zero_cross", LongType(), False),
    ]
)


def decode_audio_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-clip features from ACTUALLY-DECODED PCM samples: header
    fields (rate, channels, frame count) plus integer amplitude stats
    (min/max, sum of |amplitude|, zero crossings over the interleaved
    stream) — all int64-exact, so the values are engine-portable like
    every other checked aggregate.

    Same mapInPandas shape as ``decode_pixel_features`` but the kernel
    body is the real ``decode_wav`` codec; payload bytes never leave
    the executors and the work parallelizes per input partition."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                s, rate, nch = decode_wav(bytes(payload))
                a = s.astype(np.int64)
                nonneg = a >= 0
                rows.append(
                    (
                        int(doc_id),
                        int(rate),
                        int(nch),
                        len(a) // nch,
                        int(a.min()) if a.size else 0,
                        int(a.max()) if a.size else 0,
                        int(np.abs(a).sum()),
                        int(np.count_nonzero(nonneg[:-1] != nonneg[1:])),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return df.select("doc_id", payload_col).mapInPandas(_decode, AUDIO_FEATURE_SCHEMA)


def decode_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic-fake "decode": byte-level features per payload.

    mapInPandas kernel — one Arrow batch in, one feature frame out;
    NumPy over the raw bytes stands in for the codec (see module
    docstring). Scales with input partitions; no shuffle."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                b = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (
                        int(doc_id),
                        int(b.size),
                        int(b.sum()),
                        int(b.max()) if b.size else 0,
                        int(b.min()) if b.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "byte_sum", "max_byte", "min_byte"]
            )

    return df.select("doc_id", payload_col).mapInPandas(_decode, FEATURE_SCHEMA)


def embed_payloads(df: DataFrame, dim: int = 64, payload_col: str = "payload") -> DataFrame:
    """Multimodal → vector bridge: (doc_id, embedding array<float>) —
    the shape of batch model inference in a training-data pipeline.

    The "model" is a deterministic fake (L2-normalized ``dim``-bucket
    byte histogram of the real payload), standing in for an ONNX/torch
    encoder exactly like ``decode_features`` stands in for a codec:
    identical Spark plumbing (Arrow batches in, fixed-width float
    vectors out, no shuffle, scales with input partitions), so the
    output feeds ``knn_search`` / ``ann_ivf`` / ``embedding_near_dups``
    unchanged. Identical payloads ⇒ identical embeddings — near-dup
    laws hold end-to-end (tested)."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("embedding", ArrayType(FloatType(), False), False),
        ]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for payload in pdf[payload_col]:
                b = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(b % dim, minlength=dim).astype(np.float64) if b.size else np.zeros(dim)
                n = np.linalg.norm(h)
                out.append((h / n if n else h).astype(np.float32))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].astype("int64"), "embedding": out}
            )

    return df.select("doc_id", payload_col).mapInPandas(_embed, schema)


def frame_sample(
    df: DataFrame,
    frame_bytes: int = FRAME_BYTES,
    every_n: int = 4,
    payload_col: str = "payload",
) -> DataFrame:
    """Video-style frame sampling: split each payload into fixed-size
    frames, keep every ``every_n``-th → (doc_id, frame_idx, frame).

    The row-explode happens inside the executor (mapInPandas), so a
    1 GB video becomes frames without ever concatenating driver-side;
    downstream per-frame decode is another mapInPandas over the
    ``frame`` binary column."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids: list[int] = []
            idxs: list[int] = []
            frames: list[bytes] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                n_frames = (len(payload) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("doc_id", payload_col).mapInPandas(_frames, FRAME_SCHEMA)


# --- thumbnail (resize) --------------------------------------------------
#
# The resize leg of decode -> transform -> feature: nearest-neighbor
# downsampling by an integer stride (thumb[i, j] = source[i*s, j*s]).
# Nearest-neighbor is THE deterministic resize — no resampling kernel,
# no float filtering — so the transformed pixels stay pure arithmetic
# in the source and a SQL oracle can replay the features closed-form.

THUMBNAIL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("mean_r_e3", LongType(), False),
        StructField("mean_g_e3", LongType(), False),
        StructField("mean_b_e3", LongType(), False),
    ]
)


def thumbnail_pixel_features(
    df: DataFrame, stride: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Decode each BMP payload, nearest-neighbor-downsample by
    ``stride``, and emit the thumbnail's dims + per-channel fixed-point
    means: (doc_id, width, height, mean_{r,g,b}_e3).

    Thumbnail dims are ceil(source/stride) (row/col 0 always kept).
    Means are ``(1000·sum) // n`` — floor division, the documented
    semantics an oracle must mirror (for the gradient fixtures the
    quotient is exact, so floor never actually rounds).

    Same scale shape as ``decode_pixel_features``: one mapInPandas
    pass, payloads never leave the executors; the decoded block is
    sliced ``px[::s, ::s]`` before any arithmetic, so feature cost
    drops by ~s² exactly as a production thumbnailer's would."""
    if stride < 1:
        raise ValueError(f"stride={stride} must be >= 1")

    def _thumb(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                px = decode_image(bytes(payload))[::stride, ::stride]
                n = px.shape[0] * px.shape[1]
                sums = px.reshape(-1, 3).astype(np.int64).sum(axis=0)
                rows.append(
                    (
                        int(doc_id),
                        int(px.shape[1]),
                        int(px.shape[0]),
                        int(1000 * sums[0]) // n,
                        int(1000 * sums[1]) // n,
                        int(1000 * sums[2]) // n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "mean_r_e3", "mean_g_e3", "mean_b_e3",
                ],
            )

    return df.select("doc_id", payload_col).mapInPandas(_thumb, THUMBNAIL_SCHEMA)
