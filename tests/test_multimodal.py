"""Multimodal plumbing: binary columns + Arrow-batched kernels.
Decode is a deterministic fake; schema/partition/batch shapes real."""

import zlib

import pytest
from pyspark.sql import functions as F

from mr_lda_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, documents):
    df = mm.synthesize_media_from_documents(documents)
    df.persist().count()
    return df


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        f.name for f in mm.MEDIA_SCHEMA.fields
    ]


def test_image_features_deterministic(spark, media):
    a = {r["media_id"]: r["feature"] for r in mm.extract_image_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in mm.extract_image_features(media).collect()}
    assert a == b
    assert all(len(v) == 64 for v in a.values())
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(a) == n_images


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"abc", fake=False)
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"abc", fake=False)


def test_resize_images(spark, media):
    out = mm.resize_images(media, 8, 8).collect()
    assert out
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["payload"]) == 8 * 8 * 3


def test_sample_video_frames(spark, media):
    frames = mm.sample_video_frames(media, every_ms=1000)
    rows = frames.collect()
    assert rows
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_index"])
    durations = {
        r["media_id"]: r["duration_ms"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) == max(1, durations[mid] // 1000)


def test_extract_audio_features(spark, media):
    from pyspark.sql import functions as F

    out = mm.extract_audio_features(media).collect()
    assert out and all(len(r["feature"]) == 32 for r in out)
    n_audio = media.filter(F.col("kind") == "audio").count()
    assert len(out) == n_audio
    # Deterministic: same payload → same features.
    again = mm.extract_audio_features(media).collect()
    assert {r["media_id"]: r["feature"] for r in out} == {
        r["media_id"]: r["feature"] for r in again
    }


def test_wav_roundtrip_real_bytes():
    """encode_wav_pcm8 writes an actual RIFF/WAV the stdlib wave module
    (an independent parser) reads back sample-exact."""
    import numpy as np

    data = bytes(range(200)) * 3
    payload = mm.encode_wav_pcm8(data, sample_rate=8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    w = mm.decode_wav(payload)
    assert w["sample_rate"] == 8000
    assert w["n_channels"] == 1 and w["sample_width"] == 1
    assert w["n_frames"] == len(data)
    assert bytes(w["samples"]) == data
    # sniffing: decode_audio takes the REAL path (no fake flag needed)
    feat = mm.decode_audio(payload)
    assert feat.shape == (32,) and abs(feat.sum() - 1.0) < 1e-6


def test_png_roundtrip_real_bytes():
    """encode_png_gray8 writes a spec-valid PNG; the chunk-walking
    decoder recovers the pixels exactly, and CRCs verify."""
    import binascii
    import struct as st

    import numpy as np

    px = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    payload = mm.encode_png_gray8(px)
    assert payload[:8] == b"\x89PNG\r\n\x1a\n"
    # independently verify every chunk CRC per the PNG spec
    off = 8
    tags = []
    while off < len(payload):
        (length,) = st.unpack_from(">I", payload, off)
        tag = payload[off + 4 : off + 8]
        body = payload[off + 8 : off + 8 + length]
        (crc,) = st.unpack_from(">I", payload, off + 8 + length)
        assert binascii.crc32(tag + body) & 0xFFFFFFFF == crc, tag
        tags.append(tag)
        off += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    back = mm.decode_png_gray8(payload)
    assert (back == px).all()
    feat = mm.decode_image(payload)
    assert feat.shape == (64,)
    assert feat[1] == pytest.approx(1 / 255.0)


def test_real_media_stats_match_source_text(spark):
    """wav/png stats decoded from real payloads equal values computed
    straight from the source text — the decode is faithful."""
    docs = spark.createDataFrame(
        [(0, "abcd" * 100), (1, "xy"), (2, "zzz"), (3, "q" * 10),
         (4, "hello world")],
        "doc_id long, text string",
    )
    media = mm.real_media_from_documents(docs)
    wav = {r["media_id"]: r for r in mm.wav_waveform_stats(media).collect()}
    assert set(wav) == {1, 4}  # doc_id % 3 == 1
    t4 = "hello world".encode()
    assert wav[4]["n_frames"] == len(t4)
    assert wav[4]["mean_amp"] == pytest.approx(sum(t4) / len(t4), abs=1e-6)
    assert wav[1]["sample_rate"] == 8000
    png = {r["media_id"]: r for r in mm.png_image_stats(media).collect()}
    assert set(png) == {0, 3}
    t0 = ("abcd" * 100).encode()[:256]
    assert png[0]["width"] == 16 and png[0]["height"] == 16
    assert png[0]["mean_pixel"] == pytest.approx(sum(t0) / 256.0, abs=1e-6)
    t3 = ("q" * 10).encode()  # shorter than 256 -> zero padded
    assert png[3]["mean_pixel"] == pytest.approx(sum(t3) / 256.0, abs=1e-6)


def test_resize_png_real_roundtrip(spark):
    """Real resize path: PNG in → nearest-neighbor resample → valid
    PNG out, pixels exactly source[(2r, 2c)] for a 16→8 downscale."""
    import numpy as np

    px = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    payload = mm.encode_png_gray8(px)
    small = mm.resize_png_gray8(payload, 8, 8)
    back = mm.decode_png_gray8(small)
    assert np.array_equal(back, px[::2, ::2])
    # through the DataFrame op with fake=False (PNG sniff → real path)
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload), 16, 16, None, None)],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.resize_images(media, 8, 8, fake=False).collect()
    assert len(rows) == 1 and rows[0]["width"] == 8
    assert np.array_equal(
        mm.decode_png_gray8(bytes(rows[0]["payload"])), px[::2, ::2]
    )


def test_y4m_roundtrip_real_bytes():
    """encode_y4m_mono writes a spec-valid YUV4MPEG2 stream; the
    header/FRAME parser recovers every luma plane exactly."""
    import numpy as np

    fr = np.arange(5 * 8 * 8, dtype=np.uint8).reshape(5, 8, 8) % 251
    payload = mm.encode_y4m_mono(fr, fps_num=30, fps_den=1)
    assert payload.startswith(b"YUV4MPEG2 W8 H8 F30:1")
    v = mm.decode_y4m(payload)
    assert (v["width"], v["height"], v["fps_num"], v["fps_den"]) == (8, 8, 30, 1)
    assert np.array_equal(v["frames"], fr)


def test_y4m_rejects_non_mono_and_truncated():
    import numpy as np

    with pytest.raises(NotImplementedError):
        mm.decode_y4m(
            b"YUV4MPEG2 W8 H8 F25:1 C420jpeg\n" + b"FRAME\n" + bytes(96)
        )
    good = mm.encode_y4m_mono(np.zeros((2, 4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        mm.decode_y4m(good[:-3])  # truncated last plane
    with pytest.raises(ValueError):
        mm.decode_y4m(b"RIFFnope")


def test_y4m_real_media_stats_match_source_text(spark):
    """Video stats decoded from real Y4M payloads equal values computed
    straight from the source text (64-byte frames, zero-padded)."""
    docs = spark.createDataFrame(
        [(2, "z" * 130), (5, "ab"), (8, "")],
        "doc_id long, text string",
    )
    media = mm.real_media_from_documents(docs)
    stats = {r["media_id"]: r for r in mm.y4m_video_stats(media).collect()}
    assert set(stats) == {2, 5, 8}  # doc_id % 3 == 2
    assert stats[2]["n_frames"] == 3  # ceil(130/64)
    assert stats[2]["duration_ms"] == 3 * 40
    assert stats[2]["mean_luma"] == pytest.approx(
        130 * ord("z") / (3 * 64.0), abs=1e-6
    )
    assert stats[5]["n_frames"] == 1
    assert stats[8]["n_frames"] == 1 and stats[8]["mean_luma"] == 0.0
    # per-frame explode: frame 0 full of 'z', frame 2 only 2 bytes
    fm = {
        (r["media_id"], r["frame_index"]): r["mean_luma"]
        for r in mm.y4m_frame_means(media).collect()
    }
    assert fm[(2, 0)] == pytest.approx(ord("z"), abs=1e-6)
    assert fm[(2, 2)] == pytest.approx(2 * ord("z") / 64.0, abs=1e-6)
    assert len(fm) == 3 + 1 + 1


def test_sample_video_frames_real_y4m_path(spark):
    """sample_video_frames sniffs Y4M and emits REAL decoded planes —
    fake=False must not raise for Y4M payloads, and each sampled frame
    is byte-identical to the encoded plane it indexes."""
    import numpy as np

    fr = np.arange(50 * 16, dtype=np.uint8).reshape(50, 4, 4)
    media = spark.createDataFrame(
        [(7, "video", bytearray(mm.encode_y4m_mono(fr, fps_num=25)),
          None, None, None, 2000)],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.sample_video_frames(media, every_ms=1000, fake=False).collect()
    # 50 frames @25fps = 2000 ms -> samples at t=0 and t=1000 (frame 25)
    assert [r["frame_index"] for r in rows] == [0, 1]
    assert bytes(rows[0]["frame_payload"]) == fr[0].tobytes()
    assert bytes(rows[1]["frame_payload"]) == fr[25].tobytes()


def test_decode_rejects_unsupported_png_features():
    import struct as st

    import numpy as np

    px = np.zeros((4, 4), dtype=np.uint8)
    payload = bytearray(mm.encode_png_gray8(px))
    # flip color type to RGB in IHDR (offset: 8 sig + 8 len/tag + 9th byte)
    payload[8 + 8 + 9] = 2
    with pytest.raises(NotImplementedError):
        mm.decode_png_gray8(bytes(payload))


def test_resample_wav_real_roundtrip(spark):
    """Real audio resample: WAV in → every-2nd-sample decimation →
    playable WAV out at half the sample rate."""
    import numpy as np

    data = bytes(range(200))
    payload = mm.encode_wav_pcm8(data, sample_rate=8000)
    small = mm.resample_wav_pcm8(payload, 2)
    w = mm.decode_wav(small)
    assert w["sample_rate"] == 4000 and w["n_frames"] == 100
    assert bytes(w["samples"]) == data[::2]
    media = spark.createDataFrame(
        [(1, "audio", bytearray(payload), None, None, 8000, 25)],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.resample_audio(media, 2, fake=False).collect()
    assert len(rows) == 1 and rows[0]["sample_rate"] == 4000
    assert bytes(
        mm.decode_wav(bytes(rows[0]["payload"]))["samples"]
    ) == data[::2]


def test_png_rgb_all_filters_roundtrip():
    """RGB8 encode/decode across the full RFC 2083 filter set,
    including a forced all-Paeth file (VERDICT r5 item #6)."""
    import numpy as np

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    # default cycling filters: row r uses filter r % 5 (row 4 = Paeth)
    assert np.array_equal(mm.decode_png(mm.encode_png_rgb8(px)), px)
    # every filter forced on every row, individually
    for f in range(5):
        payload = mm.encode_png_rgb8(px, row_filters=[f] * 8)
        assert np.array_equal(mm.decode_png(payload), px), f
    # non-square + gray through the general decoder
    g = rng.integers(0, 256, (3, 7), dtype=np.uint8)
    assert np.array_equal(mm.decode_png(mm.encode_png_gray8(g)), g)
    # truncated pixel stream is a hard error, not garbage pixels
    bad = bytearray(mm.encode_png_rgb8(px))
    with pytest.raises((ValueError, zlib.error)):
        mm.decode_png(bytes(bad[: len(bad) - 20]))


def test_png_gray8_entry_rejects_rgb():
    import numpy as np

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    with pytest.raises(NotImplementedError):
        mm.decode_png_gray8(mm.encode_png_rgb8(px))


def test_media_payload_uses_code_points_not_utf8(spark):
    """ADVICE r6: payload samples are CHARACTER-indexed code points mod
    256 — the oracle's ord(substr(..)) % 256 — so a non-ASCII char
    contributes ONE sample, not its multi-byte UTF-8 expansion."""
    text = "café世"  # é = U+00E9 (2 UTF-8 bytes), 世 = U+4E16 (3)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    media = mm.real_media_from_documents(docs)  # doc 1 -> audio/WAV
    wav = mm.wav_waveform_stats(media).collect()[0]
    cps = [ord(c) % 256 for c in text]
    assert wav["n_frames"] == len(text)  # 5 chars, not 8 utf-8 bytes
    assert wav["mean_amp"] == pytest.approx(sum(cps) / len(cps), abs=1e-6)


def test_png_dhash_perceptual_property(spark):
    """Identical images hash identically; a tiny brightness wiggle on
    ONE pixel flips at most 2 of the 56 gradient bits (the perceptual
    locality that makes dHash a near-dup fingerprint, unlike the
    avalanche of a cryptographic hash)."""
    from mr_lda_spark.operators import multimodal as mm
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    base = "x" * 300
    # doc_ids divisible by 3 become images in real_media_from_documents
    tweaked = base[:50] + "y" + base[51:]
    docs = spark.createDataFrame(
        [(0, base), (3, base), (6, tweaked)],
        "doc_id long, text string",
    )
    media = mm.real_media_from_documents(docs)
    got = {r["media_id"]: r["dhash"] for r in mm.png_dhash(media).collect()}
    assert got[0] == got[3]
    hamming = bin(got[0] ^ got[6]).count("1")
    assert hamming <= 2


def test_wav_fingerprint_locality(spark):
    """Identical audio fingerprints collide; one flipped sample moves
    at most the 2 energy comparisons its window touches."""
    from mr_lda_spark.operators import multimodal as mm
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    base = "abcdefgh" * 50  # 400 samples -> 7 windows
    tweak = base[:100] + "z" + base[101:]
    docs = spark.createDataFrame(
        [(1, base), (4, base), (7, tweak)], "doc_id long, text string"
    )
    media = mm.real_media_from_documents(docs)
    got = {
        r["media_id"]: r for r in mm.wav_fingerprint(media).collect()
    }
    assert got[1]["fingerprint"] == got[4]["fingerprint"]
    assert got[1]["n_windows"] == 7
    flipped = bin(got[1]["fingerprint"] ^ got[7]["fingerprint"]).count("1")
    assert flipped <= 2


def test_y4m_scene_cuts_planted_cut(spark):
    """A video whose frames repeat has zero cuts; planting one
    radically different frame produces exactly the two expected cut
    boundaries (in and out)."""
    from mr_lda_spark.operators import multimodal as mm
    from mr_lda_spark.session import ensure_package_shipped

    ensure_package_shipped(spark)
    frame_a = "m" * 64
    frame_b = "!" * 64  # |ord('m')-ord('!')| = 76 per px -> SAD 4864
    static = frame_a * 5
    cutty = frame_a * 2 + frame_b + frame_a * 2
    docs = spark.createDataFrame(
        [(2, static), (5, cutty)], "doc_id long, text string"
    )
    media = mm.real_media_from_documents(docs)
    got = {
        r["media_id"]: r for r in mm.y4m_scene_cuts(media).collect()
    }
    assert got[2]["n_cuts"] == 0 and got[2]["total_sad"] == 0
    assert got[5]["n_cuts"] == 2
    assert got[5]["max_sad"] == 64 * abs(ord("m") - ord("!"))


def test_png_dhash_rejects_overflow_grid(spark):
    from mr_lda_spark.operators import multimodal as mm

    docs = spark.createDataFrame([(0, "x" * 300)], "doc_id long, text string")
    with pytest.raises(ValueError, match="int64"):
        mm.png_dhash(mm.real_media_from_documents(docs), grid=9)
