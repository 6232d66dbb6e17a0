"""Multimodal plumbing + real byte codecs: schema, batch shape, decode
determinism, and PPM/WAV roundtrips (VERDICT r2 #9)."""

from __future__ import annotations

import numpy as np
import pytest

from detecting_and_addressing_change_spark.multimodal.binary_ops import (
    decode_ppm,
    decode_wav_pcm16,
    encode_ppm,
    encode_wav_pcm16,
    extract_features,
    synth_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synth_media(spark, n=30)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(r["feat_dim"] == 16 and len(r["feature"]) == 16 for r in rows)
    # deterministic: same payload -> same feature
    rows2 = {r["media_id"]: r["feature"] for r in extract_features(
        synth_media(spark, n=30), dim=16).collect()}
    for r in rows:
        assert rows2[r["media_id"]] == r["feature"]


def test_metadata_only_ops_never_touch_bytes(spark):
    media = synth_media(spark, n=64)
    wide = media.filter("meta.width is not null and meta.width > 5")
    # column pruning: the binary column must not appear in the read schema
    assert wide.select("media_id", "meta.width").count() > 0


def test_ppm_roundtrip():
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 256, size=(5, 7, 3)).astype(np.uint8)
    data = encode_ppm(arr)
    assert data.startswith(b"P6")
    np.testing.assert_array_equal(decode_ppm(data), arr)


def test_ppm_header_comments():
    arr = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    data = b"P6\n# a netpbm comment\n2 2\n255\n" + arr.tobytes()
    np.testing.assert_array_equal(decode_ppm(data), arr)


def test_wav_roundtrip():
    rng = np.random.RandomState(1)
    s = rng.randint(-32768, 32767, size=100).astype(np.int16)
    data = encode_wav_pcm16(16000, s)
    rate, got = decode_wav_pcm16(data)
    assert rate == 16000
    np.testing.assert_array_equal(got, s)
    assert len(data) == 44 + 200  # canonical 44-byte header


def test_real_decode_on_spark(spark):
    """decoder='auto': real formats produce interpretable stats (width,
    height, rate, sample count), fakes stay deterministic."""
    media = synth_media(spark, n=12)
    rows = {
        r["media_id"]: r
        for r in extract_features(media, dim=8, decoder="auto").collect()
    }
    for i, r in rows.items():
        if r["kind"] == "image":
            w, h = 4 + i % 5, 3 + i % 4
            assert r["feature"][0] == w and r["feature"][1] == h
        elif r["kind"] == "audio":
            assert r["feature"][0] == 8000 and r["feature"][1] == 32


def test_real_decoder_raises_on_unsupported():
    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        _real_decode,
    )

    # genuinely-unsupported formats still gate honestly
    with pytest.raises(NotImplementedError):
        _real_decode(b"\x00\x01", "webm", 8)
    # mp4 container parsing is real now — garbage bytes are a PARSE error
    with pytest.raises(ValueError):
        _real_decode(b"\x00\x01", "mp4", 8)


def test_mp4_skeleton_roundtrip_exact():
    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    data = encode_mp4_skeleton(
        4321,
        [
            {"kind": "video", "fourcc": "avc1", "width": 320, "height": 240},
            {"kind": "audio", "fourcc": "mp4a", "sample_rate": 16000},
        ],
    )
    m = parse_mp4_metadata(data)
    assert m["major_brand"] == "isom"
    assert m["timescale"] == 1000 and m["duration_ms"] == 4321
    assert [t["handler"] for t in m["tracks"]] == ["vide", "soun"]
    assert [t["fourcc"] for t in m["tracks"]] == ["avc1", "mp4a"]
    assert m["tracks"][0]["width"] == 320
    assert m["tracks"][0]["height"] == 240
    assert m["tracks"][0]["track_id"] == 1
    assert m["tracks"][1]["sample_rate"] == 16000
    assert m["tracks"][1]["width"] == 0


def test_mp4_real_decode_features():
    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        _real_decode,
        encode_mp4_skeleton,
    )

    data = encode_mp4_skeleton(
        2500,
        [{"kind": "video", "fourcc": "avc1", "width": 64, "height": 48}],
        timescale=90000,
    )
    f = _real_decode(data, "mp4", 8)
    # [n_tracks, timescale, duration_ms, width, height, audio_rate]
    assert list(f[:6]) == [1.0, 90000.0, 2500.0, 64.0, 48.0, 0.0]


def test_mp4_parser_strictness():
    import struct

    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    good = encode_mp4_skeleton(
        1000, [{"kind": "video", "fourcc": "avc1", "width": 8, "height": 8}]
    )
    with pytest.raises(ValueError):  # truncated mid-box
        parse_mp4_metadata(good[:-7])
    with pytest.raises(ValueError):  # no ftyp first
        parse_mp4_metadata(good[good.index(b"moov") - 4 :])
    with pytest.raises(ValueError):  # box overruns its container
        bad = struct.pack(">I", len(good) + 99) + good[4:]
        parse_mp4_metadata(bad)
    # a well-formed BOX TREE whose mvhd body is too short for its fixed
    # fields must be a ValueError, not a struct.error escaping the
    # contract (found by reasoning, pinned here; the fuzz tests cover
    # the random neighborhood)
    ftyp_len = struct.unpack(">I", good[:4])[0]
    short_mvhd = struct.pack(">I", 12) + b"mvhd" + b"\x00" * 4
    crafted = (
        good[:ftyp_len]
        + struct.pack(">I", 8 + len(short_mvhd))
        + b"moov"
        + short_mvhd
    )
    with pytest.raises(ValueError):
        parse_mp4_metadata(crafted)
    # 64-bit largesize: rewrite the moov box header as size==1 + u64
    ftyp = good[: struct.unpack(">I", good[:4])[0]]
    rest = good[len(ftyp) :]
    moov_size = struct.unpack(">I", rest[:4])[0]
    large_moov = (
        struct.pack(">I", 1)
        + rest[4:8]
        + struct.pack(">Q", moov_size + 8)
        + rest[8:moov_size]
    )
    m = parse_mp4_metadata(ftyp + large_moov + rest[moov_size:])
    assert m["duration_ms"] == 1000 and len(m["tracks"]) == 1


def test_mp4_short_fixed_fields_raise_not_sibling_parse():
    """ADVICE r10: a box whose body is too short for its fixed fields,
    FOLLOWED by sibling bytes, must raise — not silently unpack the
    sibling/header bytes as field values (struct.error only fired at
    EOF before the per-box bounds checks)."""
    import struct

    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        encode_mp4_skeleton,
        parse_mp4_metadata,
    )

    good = encode_mp4_skeleton(
        1000, [{"kind": "video", "fourcc": "avc1", "width": 8, "height": 8}]
    )
    ftyp_len = struct.unpack(">I", good[:4])[0]
    moov_off = ftyp_len
    moov_size = struct.unpack(">I", good[moov_off : moov_off + 4])[0]
    mvhd_off = moov_off + 8
    mvhd_size = struct.unpack(">I", good[mvhd_off : mvhd_off + 4])[0]
    trak_off = mvhd_off + mvhd_size
    trak_size = struct.unpack(">I", good[trak_off : trak_off + 4])[0]
    tkhd_off = trak_off + 8
    tkhd_size = struct.unpack(">I", good[tkhd_off : tkhd_off + 4])[0]
    # 4-byte tkhd body (verflags only, v0): track_id/width/height slices
    # would land on the sibling mdia's header bytes without the check
    short_tkhd = struct.pack(">I", 12) + b"tkhd" + b"\x00" * 4
    delta = tkhd_size - len(short_tkhd)
    new_trak = (
        struct.pack(">I", trak_size - delta)
        + b"trak"
        + short_tkhd
        + good[tkhd_off + tkhd_size : trak_off + trak_size]
    )
    crafted = (
        good[:moov_off]
        + struct.pack(">I", moov_size - delta)
        + b"moov"
        + good[mvhd_off : mvhd_off + mvhd_size]
        + new_trak
        + good[moov_off + moov_size :]
    )
    with pytest.raises(ValueError, match="tkhd body too short"):
        parse_mp4_metadata(crafted)
    # short ftyp body: the brand slice would read the next box's size
    # field without the check
    short_ftyp = struct.pack(">I", 10) + b"ftyp" + b"is"
    with pytest.raises(ValueError, match="ftyp body too short"):
        parse_mp4_metadata(short_ftyp + good[ftyp_len:])


def test_resize_images_real(spark):
    """Nearest-neighbor resize on real PPM bytes: exact index remap."""
    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        resize_images,
    )

    media = synth_media(spark, n=9)
    out = resize_images(media, out_w=2, out_h=2)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 9  # non-image rows pass through
    for i, r in rows.items():
        if r["kind"] != "image":
            continue
        src = {x["media_id"]: x for x in media.collect()}[i]
        arr = decode_ppm(bytes(src["data"]))
        h, w, _ = arr.shape
        yi = (np.arange(2) * h) // 2
        xi = (np.arange(2) * w) // 2
        want = arr[yi][:, xi]
        got = decode_ppm(bytes(r["data"]))
        np.testing.assert_array_equal(got, want)
        assert r["meta"]["width"] == 2 and r["meta"]["height"] == 2


def test_sample_audio_frames_real(spark):
    """Hop-strided frames over real WAV bytes: counts, offsets, RMS."""
    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        sample_audio_frames,
    )

    media = synth_media(spark, n=9)
    frames = sample_audio_frames(media, frame_len=8, hop=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    audio_ids = [r["media_id"] for r in media.collect() if r["kind"] == "audio"]
    assert set(by_media) == set(audio_ids)
    for mid, frs in by_media.items():
        # 32 samples, frame 8 hop 4 -> 7 frames
        assert sorted(r["frame_id"] for r in frs) == list(range(7))
        src = {x["media_id"]: x for x in media.collect()}[mid]
        rate, s = decode_wav_pcm16(bytes(src["data"]))
        sd = s.astype(np.float64)
        for r in frs:
            fr = sd[r["frame_id"] * 4 : r["frame_id"] * 4 + 8]
            assert abs(r["rms"] - float(np.sqrt((fr * fr).mean()))) < 1e-12
            assert r["start_ms"] == r["frame_id"] * 4 * 1000.0 / rate


def test_codec_rejects_malformed_bytes():
    """Corrupt/foreign bytes fail loudly, not with garbage output."""
    with pytest.raises(ValueError):
        decode_ppm(b"P5\n2 2\n255\n" + b"\x00" * 4)  # P5 (grayscale) magic
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"OggS" + b"\x00" * 40)
    # stereo / non-PCM fmt chunks are refused, not misread
    import struct

    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # 2 channels
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    )
    with pytest.raises(ValueError):
        decode_wav_pcm16(bad)


# ---- property tests: roundtrip over arbitrary payloads -------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        w=st.integers(1, 16),
        h=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_ppm_roundtrip_property(w, h, seed):
        rng = np.random.RandomState(seed)
        arr = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        out = decode_ppm(encode_ppm(arr))
        np.testing.assert_array_equal(out, arr)

    @given(
        n=st.integers(0, 256),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=30, deadline=None)
    def test_wav_roundtrip_property(n, rate, seed):
        rng = np.random.RandomState(seed)
        s = rng.randint(-32768, 32768, size=n).astype(np.int16)
        got_rate, got = decode_wav_pcm16(encode_wav_pcm16(rate, s))
        assert got_rate == rate
        np.testing.assert_array_equal(got, s)

    @given(
        duration=st.integers(0, 10**7),
        n_video=st.integers(0, 2),
        n_audio=st.integers(0, 2),
        w=st.integers(0, 4096),
        h=st.integers(0, 4096),
        rate=st.integers(0, 65535),
        timescale=st.sampled_from([1000, 90000, 48000]),
    )
    @settings(max_examples=40, deadline=None)
    def test_mp4_roundtrip_property(
        duration, n_video, n_audio, w, h, rate, timescale
    ):
        from detecting_and_addressing_change_spark.multimodal.binary_ops import (
            encode_mp4_skeleton,
            parse_mp4_metadata,
        )

        tracks = [
            {"kind": "video", "fourcc": "avc1", "width": w, "height": h}
        ] * n_video + [
            {"kind": "audio", "fourcc": "mp4a", "sample_rate": rate}
        ] * n_audio
        m = parse_mp4_metadata(
            encode_mp4_skeleton(duration, tracks, timescale=timescale)
        )
        assert m["timescale"] == timescale
        # encode floors duration onto the timescale grid; parse floors
        # back to ms — the composed error is < one timescale unit in ms
        assert m["duration_ms"] == (duration * timescale // 1000) * 1000 // timescale
        assert len(m["tracks"]) == n_video + n_audio
        for i, t in enumerate(m["tracks"]):
            assert t["track_id"] == i + 1
            if i < n_video:
                assert (t["handler"], t["fourcc"]) == ("vide", "avc1")
                assert (t["width"], t["height"]) == (w, h)
            else:
                assert (t["handler"], t["fourcc"]) == ("soun", "mp4a")
                assert t["sample_rate"] == rate

    @given(data=st.binary(min_size=0, max_size=300))
    @settings(max_examples=150, deadline=None)
    def test_mp4_parser_total_on_garbage(data):
        """The strict parser must be TOTAL on arbitrary bytes: either a
        well-formed dict or ValueError — never another exception type,
        never a hang (malformed sizes are bounds-checked before use)."""
        from detecting_and_addressing_change_spark.multimodal.binary_ops import (
            parse_mp4_metadata,
        )

        try:
            m = parse_mp4_metadata(data)
        except ValueError:
            return
        assert set(m) == {"major_brand", "timescale", "duration_ms", "tracks"}

    @given(cut=st.integers(0, 200), flip=st.integers(0, 200))
    @settings(max_examples=60, deadline=None)
    def test_mp4_parser_total_on_mutated_good_bytes(cut, flip):
        """Truncations and single-byte corruptions of a REAL container
        must also hit the ValueError-or-valid-dict contract."""
        from detecting_and_addressing_change_spark.multimodal.binary_ops import (
            encode_mp4_skeleton,
            parse_mp4_metadata,
        )

        good = bytearray(
            encode_mp4_skeleton(
                1234,
                [
                    {
                        "kind": "video",
                        "fourcc": "avc1",
                        "width": 32,
                        "height": 24,
                    }
                ],
            )
        )
        mutated = bytes(good[: max(8, cut % len(good))])
        try:
            parse_mp4_metadata(mutated)
        except ValueError:
            pass
        good[flip % len(good)] ^= 0xFF
        try:
            m = parse_mp4_metadata(bytes(good))
            assert isinstance(m["tracks"], list)
        except ValueError:
            pass

except ImportError:  # pragma: no cover
    pass


def test_png_roundtrip_all_filters_and_color_types():
    import numpy as np

    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for shape in [(6, 9), (6, 9, 3), (6, 9, 4)]:
        arr = rng.randint(0, 256, shape).astype(np.uint8)
        for ft in range(5):
            back = decode_png(encode_png(arr, filter_type=ft))
            assert back.shape == arr.shape
            assert (back == arr).all(), (shape, ft)


def test_png_rejects_unsupported_subset():
    import struct
    import zlib

    import numpy as np
    import pytest

    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a")
    # 16-bit depth header
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 26))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(data)
    # palette color type
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    data = _PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="color type"):
        decode_png(data)
    assert np.uint8  # silence unused-import style


def test_png_rejects_decompression_bomb():
    """ADVICE r6: a tiny PNG declaring 1x1 but carrying an IDAT that
    inflates to hundreds of MB must be rejected BEFORE materializing the
    inflated bytes, and absurd declared dimensions must fail fast."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from detecting_and_addressing_change_spark.multimodal.binary_ops import (
        _PNG_SIG,
        _png_chunk,
        decode_png,
        encode_png,
    )

    # 1x1 gray header, but IDAT inflates to 256 MB of zeros
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * (256 * 1024 * 1024)))
        + _png_chunk(b"IEND", b"")
    )
    assert len(bomb) < 300_000  # the attack: tiny on the wire
    with pytest.raises(ValueError, match="inflates past|length mismatch"):
        decode_png(bomb)

    # declared dimensions beyond the sanity cap fail before any inflate
    ihdr_huge = struct.pack(">IIBBBBB", 1 << 16, 1 << 16, 8, 0, 0, 0, 0)
    huge = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr_huge)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="sanity cap"):
        decode_png(huge)

    # a legitimate image still round-trips through the bounded path
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
    assert (decode_png(encode_png(arr)) == arr).all()
