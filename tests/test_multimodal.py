"""Multimodal binary-column pipeline: payload attach, deterministic-fake
decode, frame sampling — kernels checked against plain-Python
recomputation of the same bytes, stub contract checked explicitly."""

from __future__ import annotations

import pytest

from pyspark_mrdf_spark.io import load_table
from pyspark_mrdf_spark.operators.multimodal import (
    attach_payloads,
    decode_features,
    decode_image,
    frame_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").limit(50).cache()


def test_payload_roundtrip_bytes(spark, docs):
    mm = attach_payloads(docs)
    rows = mm.join(docs.select("doc_id", "text"), "doc_id").collect()
    assert len(rows) > 0
    for r in rows:
        assert bytes(r["payload"]) == r["text"].encode("utf-8")
        assert r["meta"]["byte_len"] == len(r["text"].encode("utf-8"))
        assert r["modality"] in ("image", "audio", "video")


def test_decode_features_match_python(spark, docs):
    mm = attach_payloads(docs)
    feats = {r["doc_id"]: r for r in decode_features(mm).collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode("utf-8")
        f = feats[r["doc_id"]]
        assert f["n_bytes"] == len(b)
        assert f["byte_sum"] == sum(b)
        assert f["max_byte"] == max(b)
        assert f["min_byte"] == min(b)


def test_frame_sample_reassembles(spark, docs):
    mm = attach_payloads(docs)
    frames = frame_sample(mm, frame_bytes=256, every_n=4).collect()
    by_doc: dict[int, dict[int, bytes]] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = bytes(r["frame"])
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode("utf-8")
        n_frames = (len(b) + 255) // 256
        expect = {i: b[i * 256 : (i + 1) * 256] for i in range(0, n_frames, 4)}
        assert by_doc[r["doc_id"]] == expect


def test_frame_binary_is_decodable_downstream(spark, docs):
    # frames are themselves binary columns: a second mapInPandas pass
    # over them must see the same bytes (schema plumbing end-to-end)
    mm = attach_payloads(docs)
    frames = frame_sample(mm, frame_bytes=64, every_n=2)
    feats = decode_features(
        frames.selectExpr("doc_id", "frame AS payload"), payload_col="payload"
    )
    total = feats.groupBy().sum("n_bytes").collect()[0][0]
    assert total > 0


def test_decode_image_rejects_non_bmp():
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n")


def test_bmp_roundtrip_and_row_padding():
    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import encode_bmp

    rng = np.random.default_rng(3)
    # width 5 -> 15-byte rows pad to 16: exercises the stride logic
    px = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_bmp(px)), px)
    # top-down variant (negative height) decodes to the same pixels
    import struct

    b = bytearray(encode_bmp(px))
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    data_offset = struct.unpack_from("<I", b, 10)[0]
    stride = (5 * 3 + 3) & ~3
    rows = bytes(b[data_offset:])
    flipped = b"".join(
        rows[i * stride : (i + 1) * stride] for i in reversed(range(7))
    )
    assert np.array_equal(decode_image(bytes(b[:data_offset]) + flipped), px)


def test_decode_pixel_features_from_real_pixels(spark):
    # q61-style features computed from ACTUALLY-DECODED pixels: BMP
    # payloads flow through the Spark kernel and the per-channel means
    # match a plain-NumPy recomputation of the same images
    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import (
        decode_pixel_features,
        encode_bmp,
    )

    rng = np.random.default_rng(11)
    images = {i: rng.integers(0, 256, size=(8 + i, 6 + i, 3), dtype=np.uint8) for i in range(4)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_bmp(px))) for i, px in images.items()],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in decode_pixel_features(df).collect()}
    assert set(got) == set(images)
    for i, px in images.items():
        means = px.reshape(-1, 3).mean(axis=0)
        r = got[i]
        assert (r["height"], r["width"]) == px.shape[:2]
        assert r["mean_r_e3"] == round(means[0] * 1000)
        assert r["mean_g_e3"] == round(means[1] * 1000)
        assert r["mean_b_e3"] == round(means[2] * 1000)


def test_synth_bmp_payloads_decode_to_closed_form_means(spark):
    # the q81 contract: synthesized gradient BMPs decode (through the
    # REAL codec) to per-channel fixed-point means that match the pure
    # arithmetic the DuckDB oracle uses — exact, no rounding tolerance
    from pyspark_mrdf_spark.operators.multimodal import (
        decode_pixel_features,
        synth_bmp_payloads,
    )

    ids = [0, 1, 5, 16, 33, 127, 128, 1000]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in decode_pixel_features(synth_bmp_payloads(docs)).collect()
    }
    assert set(got) == set(ids)
    for d in ids:
        w, h = 16 + d % 16, 8 + (d * 7) % 16
        r = got[d]
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r_e3"] == (d % 128) * 1000 + (w - 1) * 500
        assert r["mean_g_e3"] == ((d * 7) % 128) * 1000 + (h - 1) * 500
        assert r["mean_b_e3"] == ((d * 13) % 64) * 1000 + (w - 1) * 500 + (h - 1) * 500


def test_embed_payloads_feeds_vector_ops(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_mrdf_spark.io import load_table
    from pyspark_mrdf_spark.operators.dedup import embedding_near_dups
    from pyspark_mrdf_spark.operators.multimodal import attach_payloads, embed_payloads

    docs = load_table(spark, sf_dir, "documents").limit(100)
    mm = attach_payloads(docs)
    # plant an exact duplicate payload under a fresh id
    dup = mm.filter(F.col("doc_id") == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "modality", "payload", "meta"
    )
    emb = embed_payloads(mm.unionByName(dup), dim=32)
    row = emb.filter("doc_id = 0").collect()[0]
    assert len(row["embedding"]) == 32
    # identical payloads -> identical embeddings -> cosine 1.0 pair found
    pairs = embedding_near_dups(
        emb, threshold=0.999999, id_col="doc_id", vec_col="embedding", n_blocks=4
    ).collect()
    assert any(r["src"] == 0 and r["dst"] == 100000 for r in pairs)


def test_wav_roundtrip_mono_stereo_and_junk_chunk():
    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import decode_wav, encode_wav

    rng = np.random.default_rng(11)
    mono = rng.integers(-32768, 32768, size=101, dtype=np.int16)
    s, rate, nch = decode_wav(encode_wav(mono, 16000, 1))
    assert rate == 16000 and nch == 1 and np.array_equal(s, mono)
    stereo = rng.integers(-32768, 32768, size=240, dtype=np.int16)
    s, rate, nch = decode_wav(encode_wav(stereo, 44100, 2))
    assert rate == 44100 and nch == 2 and np.array_equal(s, stereo)
    # odd-length junk chunk before data: the decoder must honor RIFF
    # word alignment (1 pad byte) to find the data chunk at all
    s, rate, nch = decode_wav(encode_wav(mono, 8000, 1, junk=b"\x01\x02\x03"))
    assert rate == 8000 and np.array_equal(s, mono)


def test_decode_wav_rejects_malformed():
    import struct

    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav(b"OggS\x00\x00\x00\x00\x00\x00\x00\x00")
    good = encode_wav(np.arange(8, dtype=np.int16), 8000, 1)
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(good[:-3])
    # non-PCM format tag (fmt chunk starts at offset 12+8)
    b = bytearray(good)
    struct.pack_into("<H", b, 20, 3)  # IEEE float
    with pytest.raises(ValueError, match="only 16-bit integer PCM"):
        decode_wav(bytes(b))
    # data not a whole number of stereo frames (7 samples = 14 bytes:
    # patching the fmt chunk to claim 2 channels makes 14 % 4 != 0)
    with pytest.raises(ValueError, match="frames"):
        decode_wav(
            encode_wav(np.arange(7, dtype=np.int16), 8000, 1).replace(
                struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 2), 1
            )
        )


def test_synth_wav_payloads_decode_to_closed_form_stats(spark):
    # the q112 contract end-to-end in-process: synthesize, REALLY
    # decode, and compare against the closed-form integer arithmetic
    # the oracle uses
    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import (
        decode_audio_features,
        synth_wav_payloads,
    )

    docs = spark.range(0, 40).selectExpr("id AS doc_id")
    got = {r["doc_id"]: r for r in decode_audio_features(synth_wav_payloads(docs)).collect()}
    assert len(got) == 40
    for d in range(40):
        m = 64 + d % 64
        i = np.arange(m, dtype=np.int64)
        s = (31 * d + 297 * i * i + 17 * i) % 2048 - 1024
        nch = 2 if d % 2 == 0 else 1
        nonneg = s >= 0
        r = got[d]
        assert r["sample_rate"] == 8000 + 1000 * (d % 5)
        assert r["n_channels"] == nch
        assert r["n_frames"] == m // nch
        assert r["min_amp"] == s.min() and r["max_amp"] == s.max()
        assert r["sum_abs"] == np.abs(s).sum()
        assert r["zero_cross"] == np.count_nonzero(nonneg[:-1] != nonneg[1:])


def test_image_dhash_invariances():
    """dHash laws on the raw kernel (single image, driver-side NumPy
    through the REAL encode->decode->hash Spark kernel path pieces):
    invariant to uniform brightness shift and to block-preserving
    upscaling; sensitive to a flipped cell comparison."""
    import numpy as np

    from pyspark_mrdf_spark.operators.multimodal import (
        DHASH_GRID_COLS,
        DHASH_GRID_ROWS,
        decode_image,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    cells = rng.randint(20, 220, size=(DHASH_GRID_ROWS, DHASH_GRID_COLS)).astype(np.int64)

    def hash_of(cells, scale_y, scale_x, bright):
        gray = np.repeat(np.repeat(cells + bright, scale_y, 0), scale_x, 1).astype(np.uint8)
        px = np.stack([gray, gray, gray], axis=2)
        decoded = decode_image(encode_bmp(px))
        # replicate the kernel arithmetic exactly (block means by
        # cross-multiplication over the decoded pixels)
        g = decoded.astype(np.int64).sum(axis=2)
        h, w = g.shape
        yb = (np.arange(DHASH_GRID_ROWS) * h) // DHASH_GRID_ROWS
        xb = (np.arange(DHASH_GRID_COLS) * w) // DHASH_GRID_COLS
        block = np.add.reduceat(np.add.reduceat(g, yb, 0), xb, 1)
        area = np.outer(np.diff(np.append(yb, h)), np.diff(np.append(xb, w)))
        bits = (block[:, 1:] * area[:, :-1] > block[:, :-1] * area[:, 1:]).astype(np.int64)
        k = (
            np.arange(DHASH_GRID_ROWS)[:, None] * (DHASH_GRID_COLS - 1)
            + np.arange(DHASH_GRID_COLS - 1)[None, :]
        )
        return int((bits << k).sum())

    base = hash_of(cells, 2, 2, 0)
    assert hash_of(cells, 2, 2, 17) == base  # brightness-invariant
    assert hash_of(cells, 4, 3, 0) == base  # resize-invariant
    assert hash_of(cells, 3, 4, 11) == base  # both at once
    flipped = cells.copy()
    flipped[0, 0], flipped[0, 1] = flipped[0, 1], flipped[0, 0]
    if cells[0, 0] != cells[0, 1]:
        assert hash_of(flipped, 2, 2, 0) != base  # content-sensitive


def test_image_dhash_recovers_planted_groups(spark, sf_dir):
    """q121 end to end: every reported near-dup pair is same-group
    (doc_id % 40), unperturbed same-group members collide at Hamming 0,
    and each group's unperturbed members all pair up (pigeonhole
    banding loses nothing at distance 0)."""
    from pyspark_mrdf_spark.queries import load_all

    rows = load_all()["q121_image_dhash_near_dups"].builder(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["doc_a"] % 40 == r["doc_b"] % 40, r
        assert 0 <= r["hamming"] <= 4
    found = {(r["doc_a"], r["doc_b"]) for r in rows}
    n = load_table(spark, sf_dir, "documents").count()
    clean = [d for d in range(n) if d % 5 != 0]
    by_g: dict = {}
    for d in clean:
        by_g.setdefault(d % 40, []).append(d)
    for members in by_g.values():
        for i, a in enumerate(members):
            for b in members[i + 1 :]:
                assert (a, b) in found, (a, b)
                ham = [r["hamming"] for r in rows if (r["doc_a"], r["doc_b"]) == (a, b)]
                assert ham == [0], (a, b, ham)


def test_thumbnail_matches_numpy_reference(spark):
    # random (non-gradient) pixels, odd dims, strides 1/2/3: the
    # operator must equal the decode-then-slice NumPy reference exactly,
    # including floor semantics of the fixed-point means
    import numpy as np
    import pandas as pd

    from pyspark_mrdf_spark.operators.multimodal import (
        encode_bmp,
        thumbnail_pixel_features,
    )

    rng = np.random.default_rng(9)
    rows = []
    expected = {}  # (doc_id, stride) -> row
    imgs = {}
    for doc_id, (h, w) in enumerate([(7, 9), (8, 16), (11, 5), (1, 1)]):
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        imgs[doc_id] = px
        rows.append((doc_id, encode_bmp(px)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "payload"]))
    for stride in (1, 2, 3):
        for doc_id, px in imgs.items():
            t = px[::stride, ::stride]
            n = t.shape[0] * t.shape[1]
            s = t.reshape(-1, 3).astype(np.int64).sum(axis=0)
            expected[(doc_id, stride)] = (
                t.shape[1], t.shape[0],
                1000 * int(s[0]) // n, 1000 * int(s[1]) // n, 1000 * int(s[2]) // n,
            )
        got = {
            (r["doc_id"], stride): (
                r["width"], r["height"],
                r["mean_r_e3"], r["mean_g_e3"], r["mean_b_e3"],
            )
            for r in thumbnail_pixel_features(df, stride=stride).collect()
        }
        for k, v in got.items():
            assert v == expected[k], (k, v, expected[k])
    import pytest

    with pytest.raises(ValueError):
        thumbnail_pixel_features(df, stride=0)
