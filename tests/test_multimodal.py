"""Codec-seam tests for the multimodal operators.

The container ships no image/audio/video codec LIBRARIES (installs are
prohibited), but PNG header metadata needs none — stdlib struct+zlib —
so the image branch's width/height/bit-depth decode runs FOR REAL here
(fixture PNGs are also written with stdlib only). Pixel/sample-level
golden tests still gate on importorskip and SKIP in this container; in
any environment with PIL/soundfile they exercise ``decode_media_real``
end to end. The always-run contract test: without the libs, non-PNG
media must fail with a clean NotImplementedError naming the fallback,
never an AttributeError or a silent wrong answer.
"""

from __future__ import annotations

import pytest

from football_etl_pipeline_spark.operators.multimodal import (
    decode_media_real,
    decode_png_header,
    make_png,
)


def test_decode_media_real_raises_clean_not_implemented_without_codecs():
    for mime in ("image/png", "audio/wav", "video/mp4"):
        try:
            decode_media_real(b"\x00" * 16, mime)
        except NotImplementedError as exc:
            assert "deterministic byte-level decode" in str(exc)
        except Exception:
            pass  # codec present: garbage bytes fail the DECODE — also fine
        else:
            pytest.fail("16 zero bytes must never decode successfully")


def test_png_header_decodes_with_stdlib_only():
    """The stdlib PNG path is real in THIS container: a valid PNG's
    width/height/bit-depth/color-type come back from the IHDR parse,
    no codec library involved."""
    payload = make_png(32, 16)
    meta = decode_png_header(payload)
    assert meta == {"width": 32, "height": 16, "bit_depth": 8, "color_type": 2}
    # and through the seam entry point (PIL absent -> header-only dict;
    # PIL present -> superset with mode/format)
    meta2 = decode_media_real(payload, "image/png")
    assert meta2["width"] == 32 and meta2["height"] == 16
    assert meta2["bit_depth"] == 8


def test_png_header_rejects_corruption():
    payload = bytearray(make_png(8, 8))
    payload[18] ^= 0xFF  # flip a width byte: CRC must catch it
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png_header(bytes(payload))
    with pytest.raises(ValueError, match="bad signature"):
        decode_png_header(b"\x00" * 40)
    with pytest.raises(ValueError, match="truncated"):
        decode_png_header(make_png(8, 8)[:20])


def test_decode_media_real_image_golden():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — absent in this container
    from football_etl_pipeline_spark.operators.multimodal import decode_media_real

    meta = decode_media_real(make_png(32, 16), "image/png")
    assert meta["width"] == 32 and meta["height"] == 16
    assert meta["mode"] == "RGB" and meta["format"] == "PNG"


def test_decode_media_real_audio_golden():
    sf = pytest.importorskip("soundfile")
    import io

    import numpy as np

    from football_etl_pipeline_spark.operators.multimodal import decode_media_real

    buf = io.BytesIO()
    sf.write(buf, np.zeros(1600, dtype="float32"), 16000, format="WAV")
    meta = decode_media_real(buf.getvalue(), "audio/wav")
    assert meta["n_samples"] == 1600
    assert meta["sample_rate"] == 16000
    assert meta["channels"] == 1


def test_wav_header_decodes_with_stdlib_only():
    """The stdlib WAV path is real in THIS container: sample rate /
    channels / bit depth / sample count come back from the RIFF chunk
    walk, no codec library involved."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_wav_header,
        make_wav,
    )

    payload = make_wav(1600, sample_rate=16000, channels=2)
    meta = decode_wav_header(payload)
    assert meta == {
        "sample_rate": 16000,
        "channels": 2,
        "bit_depth": 16,
        "n_samples": 1600,
        "duration_ms": 100,
    }
    # Through the seam entry point (soundfile absent -> header-only
    # dict; present -> superset with decoded_samples).
    meta2 = decode_media_real(payload, "audio/wav")
    assert meta2["n_samples"] == 1600 and meta2["sample_rate"] == 16000


def test_wav_header_rejects_corruption():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_wav_header,
        make_wav,
    )

    with pytest.raises(ValueError, match="RIFF/WAVE"):
        decode_wav_header(b"\x00" * 40)
    # Truncate INSIDE the data chunk: its declared size overruns.
    with pytest.raises(ValueError, match="overruns"):
        decode_wav_header(make_wav(1600)[:100])
    # Non-PCM format code must refuse, not misparse.
    import struct

    payload = bytearray(make_wav(16))
    fmt_off = payload.index(b"fmt ") + 8
    payload[fmt_off : fmt_off + 2] = struct.pack("<H", 3)  # IEEE float
    with pytest.raises(ValueError, match="only PCM"):
        decode_wav_header(bytes(payload))


def test_jpeg_header_decodes_with_stdlib_only():
    """The stdlib JPEG path is real in THIS container: SOF0 dims come
    back from the marker walk, no codec library involved."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_header,
        make_jpeg,
    )

    meta = decode_jpeg_header(make_jpeg(640, 480))
    assert meta["width"] == 640
    assert meta["height"] == 480
    assert meta["bit_depth"] == 8
    assert meta["n_components"] == 3
    assert meta["progressive"] is False
    # via the seam too (PIL absent → header metadata IS the answer)
    seam = decode_media_real(make_jpeg(33, 7), "image/jpeg")
    assert (seam["width"], seam["height"]) == (33, 7)


def test_jpeg_header_rejects_corruption():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_header,
        make_jpeg,
    )

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_header(b"\x89PNG\r\n\x1a\n")
    good = make_jpeg(8, 8)
    with pytest.raises(ValueError, match="truncated|sync|SOF"):
        decode_jpeg_header(good[:6])  # cut before SOF
    # SOS with no preceding SOF (strip the SOF segment): SOI+APP0+SOS…
    import struct

    app0_len = struct.unpack(">H", good[4:6])[0]
    sof_start = 2 + 2 + app0_len
    sof_len = struct.unpack(">H", good[sof_start + 2 : sof_start + 4])[0]
    no_sof = good[:sof_start] + good[sof_start + 2 + sof_len :]
    with pytest.raises(ValueError, match="no SOF"):
        decode_jpeg_header(no_sof)


def test_gif_header_decodes_with_stdlib_only():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_gif_header,
        make_gif,
    )

    meta = decode_gif_header(make_gif(320, 200))
    assert meta["width"] == 320
    assert meta["height"] == 200
    assert meta["version"] == "89a"
    assert meta["n_colors"] == 2
    seam = decode_media_real(make_gif(5, 9), "image/gif")
    assert (seam["width"], seam["height"]) == (5, 9)


def test_gif_header_rejects_corruption():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_gif_header,
        make_gif,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_gif_header(b"JIF89a" + b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated"):
        decode_gif_header(make_gif(4, 4)[:10])
    import struct

    zero_w = b"GIF89a" + struct.pack("<HHBBB", 0, 4, 0, 0, 0) + b"\x3b"
    with pytest.raises(ValueError, match="dimensions"):
        decode_gif_header(zero_w)


def test_mp4_header_decodes_with_stdlib_only():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_mp4_header,
        make_mp4,
    )

    meta = decode_mp4_header(make_mp4(1280, 720, duration_ms=3500))
    assert meta["width"] == 1280
    assert meta["height"] == 720
    assert meta["duration_ms"] == 3500
    assert meta["n_tracks"] == 1
    seam = decode_media_real(make_mp4(320, 240), "video/mp4")
    assert (seam["width"], seam["height"]) == (320, 240)
    assert seam["duration_ms"] == 2000


def test_mp4_header_rejects_corruption():
    import struct

    from football_etl_pipeline_spark.operators.multimodal import (
        decode_mp4_header,
        make_mp4,
    )

    # first box claims 4 GiB (size field 0xFF...) -> overrun, and a
    # well-formed but ftyp-less tree is rejected by name
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_header(b"\xff\xff\xff\xff free" + b"\x00" * 24)
    with pytest.raises(ValueError, match="ftyp"):
        decode_mp4_header(
            struct.pack(">I4s", 16, b"free") + b"\x00" * 8 + b""
        )
    good = make_mp4(4, 4)
    # truncate inside moov: the moov box overruns the container
    with pytest.raises(ValueError, match="overruns|moov"):
        decode_mp4_header(good[: len(good) - 20])
    # box with size < 8 is malformed
    bad = struct.pack(">I4s", 3, b"ftyp") + b"\x00" * 16
    with pytest.raises(ValueError, match="overruns"):
        decode_mp4_header(bad)


def test_binaryfile_media_ingestion_roundtrip(spark, tmp_path):
    """Loose media files on disk -> binaryFile source -> decoded
    headers: the file-system ingestion twin of media_table. Real
    containers (stdlib encoders) are written under a nested layout;
    read_media_files must find them recursively, infer mimes from
    extensions, honor the glob prune, and hand back payload bytes
    that header-decode identically to the originals."""
    import os

    from football_etl_pipeline_spark.operators.multimodal import (
        decode_gif_header,
        decode_png_header,
        decode_wav_header,
        make_gif,
        make_png,
        make_wav,
    )
    from football_etl_pipeline_spark.sources.connectors import (
        read_media_files,
    )

    blobs = {
        "a/img1.png": make_png(17, 9),
        "a/img2.gif": make_gif(5, 7),
        "b/nested/snd.wav": make_wav(160),
        "b/readme.txt": b"not media",
    }
    for rel, data in blobs.items():
        p = tmp_path / rel
        os.makedirs(p.parent, exist_ok=True)
        p.write_bytes(data)

    df = read_media_files(spark, str(tmp_path))
    rows = {os.path.basename(r.path): r for r in df.collect()}
    assert set(rows) == {"img1.png", "img2.gif", "snd.wav", "readme.txt"}
    assert rows["img1.png"].mime == "image/png"
    assert rows["img2.gif"].mime == "image/gif"
    assert rows["snd.wav"].mime == "audio/wav"
    assert rows["readme.txt"].mime == "application/octet-stream"
    # payload bytes identical to what was written
    for name, rel in (
        ("img1.png", "a/img1.png"),
        ("snd.wav", "b/nested/snd.wav"),
    ):
        assert bytes(rows[name].content) == blobs[rel]
        assert rows[name].length == len(blobs[rel])
    # ingested bytes header-decode exactly like the originals
    png = decode_png_header(bytes(rows["img1.png"].content))
    assert (png["width"], png["height"]) == (17, 9)
    gif = decode_gif_header(bytes(rows["img2.gif"].content))
    assert (gif["width"], gif["height"]) == (5, 7)
    decode_wav_header(bytes(rows["snd.wav"].content))
    # glob prunes at listing time — only PNGs surface
    only_png = read_media_files(spark, str(tmp_path), glob="*.png")
    assert [
        os.path.basename(r.path) for r in only_png.collect()
    ] == ["img1.png"]
    # size gate prunes before payload load
    small = read_media_files(
        spark, str(tmp_path), max_bytes=len(blobs["a/img2.gif"])
    )
    assert "img1.png" not in {
        os.path.basename(r.path) for r in small.collect()
    } or len(blobs["a/img1.png"]) <= len(blobs["a/img2.gif"])


def test_magic_sniff_signatures_match_encoders():
    """The JVM sniff CASE's magic constants must match what the stdlib
    encoders actually emit — checked byte-for-byte in pure Python so a
    signature typo can't hide behind the (also green) oracle row."""
    from football_etl_pipeline_spark.operators.multimodal import (
        make_gif,
        make_jpeg,
        make_mp4,
        make_png,
        make_wav,
    )

    png = make_png(8, 8)
    assert png[:4].hex().upper() == "89504E47"
    jpg = make_jpeg(8, 8)
    assert jpg[:3].hex().upper() == "FFD8FF"
    gif = make_gif(8, 8)
    assert gif[:4].hex().upper() == "47494638"
    wav = make_wav(160, 16000)
    assert wav[:4].hex().upper() == "52494646"
    assert wav[8:12].hex().upper() == "57415645"
    mp4 = make_mp4(8, 8)
    assert mp4[4:8].hex().upper() == "66747970"
    # and no cross-format signature collides with another's prefix
    payloads = {"png": png, "jpg": jpg, "gif": gif, "wav": wav, "mp4": mp4}
    for name, p in payloads.items():
        matches = [
            p[:4].hex().upper() == "89504E47",
            p[:3].hex().upper() == "FFD8FF",
            p[:4].hex().upper() == "47494638",
            p[:4].hex().upper() == "52494646"
            and p[8:12].hex().upper() == "57415645",
            p[4:8].hex().upper() == "66747970",
        ]
        assert sum(matches) == 1, (name, matches)


def test_mp4_brand_multitrack_and_timescale_roundtrip():
    """The video-only decode surface behind multimodal_video_meta:
    ftyp major brand, multi-track counting with zero-dim (audio/hint
    shape) extras skipped for dims, and the double floor of the
    ms→units→ms duration round-trip at a non-1000 timescale."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_mp4_header,
        make_mp4,
    )

    meta = decode_mp4_header(
        make_mp4(640, 360, duration_ms=1001, timescale=600, n_tracks=3)
    )
    assert meta["brand"] == "isom"
    assert meta["n_tracks"] == 3
    assert meta["timescale"] == 600
    # dims come from track 1; zero-dim tracks 2-3 must not clobber them
    assert (meta["width"], meta["height"]) == (640, 360)
    # 1001 ms → floor(1001*600/1000)=600 units → floor(600*1000/600)=1000 ms
    assert meta["duration_ms"] == 1000


def test_exif_roundtrip_both_endians_and_absence():
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_exif,
        make_jpeg,
        make_jpeg_exif,
    )

    for be, bo in ((False, "II"), (True, "MM")):
        meta = decode_jpeg_exif(
            make_jpeg_exif(32, 24, orientation=6, make="camX", big_endian=be)
        )
        assert meta == {
            "has_exif": True,
            "orientation": 6,
            "make": "camX",
            "byte_order": bo,
        }
    # no APP1: absence is data, not corruption
    assert decode_jpeg_exif(make_jpeg(8, 8))["has_exif"] is False
    # corrupt byte-order mark must dead-letter
    payload = bytearray(make_jpeg_exif(8, 8))
    i = bytes(payload).find(b"Exif\x00\x00") + 6
    payload[i : i + 2] = b"XX"
    with pytest.raises(ValueError, match="byte-order"):
        decode_jpeg_exif(bytes(payload))


def test_wav_junk_chunk_and_varied_depth_roundtrip():
    """The multimodal_audio_meta payload space: an odd-sized JUNK
    chunk before fmt must be skipped via the spec's word-alignment
    pad, and 8/32-bit PCM block_align math must round-trip — the
    chunk-ORDER and alignment cases a fixed-offset parser misreads."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_wav_header,
        make_wav,
    )

    for bits, junk in ((8, 1), (16, 5), (32, 13)):
        payload = make_wav(
            441, sample_rate=22050, channels=2, bits=bits, junk_bytes=junk
        )
        meta = decode_wav_header(payload)
        assert meta == {
            "sample_rate": 22050,
            "channels": 2,
            "bit_depth": bits,
            "n_samples": 441,
            "duration_ms": 441 * 1000 // 22050,
        }
    # even-sized junk: no pad byte, walk must still land on fmt
    meta = decode_wav_header(make_wav(16, junk_bytes=4))
    assert meta["n_samples"] == 16

    # inconsistent block_align (stereo declared, mono stride) refuses
    import struct

    payload = bytearray(make_wav(16, channels=2))
    fmt_off = payload.index(b"fmt ") + 8
    payload[fmt_off + 12 : fmt_off + 14] = struct.pack("<H", 2)  # mono stride
    with pytest.raises(ValueError, match="block_align"):
        decode_wav_header(bytes(payload))


def test_exif_decoder_bounds_are_valueerror_not_struct_error():
    """decode_jpeg_exif's dead-letter contract: truncated TIFF bodies
    and out-of-range offsets raise ValueError (never struct.error,
    never a silently truncated Make string)."""
    import struct

    from football_etl_pipeline_spark.operators.multimodal import (
        decode_jpeg_exif,
        make_jpeg_exif,
    )

    full = make_jpeg_exif(16, 16, orientation=3, make="cam1")
    app1_off = full.index(b"Exif\x00\x00")
    tiff_off = app1_off + 6

    def with_tiff(tiff: bytes) -> bytes:
        app1 = b"Exif\x00\x00" + tiff
        return (
            full[: app1_off - 4]
            + b"\xff\xe1"
            + struct.pack(">H", 2 + len(app1))
            + app1
            + b"\xff\xd9"
        )

    tiff = full[tiff_off:]
    tiff = tiff[: tiff.index(b"\xff\xd9")] if b"\xff\xd9" in tiff else tiff
    # IFD0 offset pointing past the body
    bad_ifd = tiff[:4] + struct.pack("<I", 10_000) + tiff[8:]
    with pytest.raises(ValueError, match="IFD0 offset"):
        decode_jpeg_exif(with_tiff(bad_ifd))
    # entry-count claiming more entries than the body holds
    bad_count = tiff[:8] + struct.pack("<H", 500) + tiff[10:]
    with pytest.raises(ValueError, match="entry table overruns"):
        decode_jpeg_exif(with_tiff(bad_count))
    # Make value offset overrunning the body: grow n without growing
    # the payload (entry layout: tag..HHI at IFD0+2, value slot at +8)
    ifd0 = 8
    e = ifd0 + 2  # first entry = Make in make_jpeg_exif's layout
    bad_make = bytearray(tiff)
    bad_make[e + 4 : e + 8] = struct.pack("<I", 60_000)
    with pytest.raises(ValueError, match="Make value offset"):
        decode_jpeg_exif(with_tiff(bytes(bad_make)))


def test_gif_animation_roundtrip_and_corruption():
    """The block-list walk: animated GIFs round-trip frame count /
    loop / summed delay; static GIFs decode as 1 frame with NULL loop;
    malformed block chains dead-letter with ValueError."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_gif_animation,
        make_gif,
        make_gif_animated,
    )

    meta = decode_gif_animation(
        make_gif_animated(16, 16, n_frames=3, delay_cs=7, loop=2)
    )
    assert meta == {
        "n_frames": 3,
        "loop_count": 2,
        "total_duration_cs": 21,
        "animated": True,
    }
    static = decode_gif_animation(make_gif(16, 16))
    assert static == {
        "n_frames": 1,
        "loop_count": None,
        "total_duration_cs": 0,
        "animated": False,
    }
    # zero-loop (infinite) is data, not absence
    assert decode_gif_animation(
        make_gif_animated(8, 8, n_frames=1, delay_cs=4, loop=0)
    )["loop_count"] == 0

    payload = make_gif_animated(16, 16, n_frames=2, delay_cs=5, loop=1)
    with pytest.raises(ValueError, match="missing trailer"):
        decode_gif_animation(payload[:-1])
    with pytest.raises(ValueError, match="unknown block introducer"):
        bad = bytearray(payload)
        bad[bad.index(b"\x2c")] = 0x7E
        decode_gif_animation(bytes(bad))
    with pytest.raises(ValueError, match="sub-block"):
        # truncate inside the last frame's LZW sub-block chain
        decode_gif_animation(payload[: len(payload) - 3])


def test_gif_animation_every_truncation_is_valueerror():
    """Exhaustive truncation sweep: cutting an animated GIF at ANY
    byte boundary must either decode (impossible here — the trailer
    is gone) or raise ValueError, never IndexError / struct.error —
    the dead-letter sweep catches only ValueError, so any other
    exception class would crash the task instead of classifying the
    payload as malformed (round-14 ADVICE item)."""
    from football_etl_pipeline_spark.operators.multimodal import (
        decode_gif_animation,
        make_gif_animated,
    )

    payload = make_gif_animated(16, 16, n_frames=2, delay_cs=5, loop=1)
    for cut in range(len(payload)):
        with pytest.raises(ValueError):
            decode_gif_animation(payload[:cut])


def test_png_pixel_decode_roundtrip_and_corruption():
    """decode_png_pixels must return exactly the pattern the encoder
    wrote (lossless round trip — what makes the aHash oracle able to
    recompute hashes from the formula), and malformed payloads must
    dead-letter with ValueError."""
    from football_etl_pipeline_spark.operators.multimodal import (
        AHASH_W,
        _ahash_pattern_val,
        decode_png_pixels,
        make_png_pattern,
    )

    payload = make_png_pattern(35)
    rows = decode_png_pixels(payload)
    assert len(rows) == AHASH_W and len(rows[0]) == AHASH_W
    for y in (0, 7, 31):
        for x in (0, 13, 31):
            assert rows[y][x] == _ahash_pattern_val(35, x, y)

    with pytest.raises(ValueError):
        decode_png_pixels(payload[:50])  # chunk overrun
    with pytest.raises(ValueError, match="inflate|overruns|IEND"):
        bad = bytearray(payload)
        idat = bad.index(b"IDAT") + 4
        bad[idat + 10] ^= 0xFF  # corrupt the deflate stream
        decode_png_pixels(bytes(bad))
    with pytest.raises(ValueError, match="filter"):
        # rebuild with a non-zero filter byte on row 0
        import struct
        import zlib

        from football_etl_pipeline_spark.operators.multimodal import (
            PNG_SIGNATURE,
        )

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data))
            )

        ihdr = struct.pack(">IIBBBBB", AHASH_W, AHASH_W, 8, 2, 0, 0, 0)
        raw = bytearray(zlib.decompress(
            payload[payload.index(b"IDAT") + 4:].rsplit(b"IEND")[0][:-4]
        ))
        raw[0] = 2  # "Up" filter — unsupported
        decode_png_pixels(
            PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )


def test_ahash_banding_full_recall_vs_bruteforce(spark):
    """The recall pin the verdict asked for: the REGISTERED banded
    query must return EXACTLY the brute-force all-pairs Hamming ≤ T
    set computed by a direct Python reference over the same ids —
    the 8-band pigeonhole guarantee (any pair differing in ≤ 7 of 64
    bits shares an untouched 8-bit band), made empirical."""
    from football_etl_pipeline_spark.operators.multimodal import (
        AHASH_HAMMING_T,
        ahash_64,
        decode_png_pixels,
        make_png_pattern,
        multimodal_image_ahash_neardup,
    )
    from football_etl_pipeline_spark.operators.registry import (
        release_persists,
    )

    sf = "/root/testdata/sf0.01"
    ids = [i for i in range(500) if (i % 20) % 5 == 0]
    H = {i: ahash_64(decode_png_pixels(make_png_pattern(i))) for i in ids}

    def ham(a, b):
        return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")

    truth = {
        (a, b, ham(H[a], H[b]))
        for ai, a in enumerate(ids)
        for b in ids[:ai]
        if ham(H[a], H[b]) <= AHASH_HAMMING_T
    }
    assert truth, "fixture must plant near-dups"
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in multimodal_image_ahash_neardup(spark, sf).collect()
    }
    release_persists()
    assert got == truth
    # and the fixture plants pairs that are genuinely NEAR the
    # threshold, not only identical images
    assert any(h > 0 for _, _, h in truth)


def test_wav_sample_decode_roundtrip_and_corruption():
    """decode_wav_samples must return exactly the square wave the
    encoder wrote (lossless int16 round trip — what lets the aHash-
    style audio oracle recompute features from frame arithmetic), and
    unsupported/malformed payloads must dead-letter with ValueError."""
    from football_etl_pipeline_spark.operators.multimodal import (
        AUDIO_FRAME,
        _audio_frame_amp,
        decode_wav_samples,
        make_wav,
        make_wav_tone,
    )

    s = decode_wav_samples(make_wav_tone(35))
    assert len(s) == 800 + 35 % 97
    for i in (0, 1, 80, 333, len(s) - 1):
        a = _audio_frame_amp(35, i // AUDIO_FRAME)
        assert s[i] == (a if i % 2 == 0 else -a)

    with pytest.raises(ValueError, match="16-bit mono"):
        decode_wav_samples(make_wav(64, channels=2))
    with pytest.raises(ValueError, match="overruns"):
        decode_wav_samples(make_wav_tone(35)[:-10])


def test_audio_energy_features_match_direct_python(spark):
    """The registered query's features must equal a direct Python
    reference over the same synthetic payloads (the aHash recall-pin
    discipline applied to audio)."""
    from football_etl_pipeline_spark.operators.multimodal import (
        AUDIO_CLIP,
        AUDIO_FRAME,
        AUDIO_SILENCE_THRESH,
        decode_wav_samples,
        make_wav_tone,
        multimodal_audio_energy,
    )

    sf = "/root/testdata/sf0.01"
    got = {
        r.media_id: (
            r.n_samples, r.n_silent_frames, r.n_clipped_samples,
            r.peak_amplitude, r.sum_sq,
        )
        for r in multimodal_audio_energy(spark, sf).collect()
    }
    assert got, "fixture must produce wav rows"
    for mid in list(got)[:10]:
        s = decode_wav_samples(make_wav_tone(mid))
        n_frames = (len(s) + AUDIO_FRAME - 1) // AUDIO_FRAME
        silent = sum(
            1 for f in range(n_frames)
            if max(abs(x) for x in s[f * AUDIO_FRAME:(f + 1) * AUDIO_FRAME])
            < AUDIO_SILENCE_THRESH
        )
        clipped = sum(1 for x in s if abs(x) >= AUDIO_CLIP)
        expect = (
            len(s), silent, clipped,
            max(abs(x) for x in s), sum(x * x for x in s),
        )
        assert got[mid] == expect, mid
    # the fixture plants all three frame classes
    assert any(v[1] > 0 for v in got.values())  # silence exists
    assert any(v[2] > 0 for v in got.values())  # clipping exists


def test_every_decoder_truncation_is_valueerror_corpus_wide():
    """The GIF-animation lesson made permanent and corpus-wide: for
    EVERY stdlib encode/decode pair, cutting the payload at ANY byte
    boundary must raise ValueError (or NotImplementedError at the
    codec seam) — never struct.error / IndexError / zlib.error — so
    the dead-letter sweep classifies malformed media instead of
    crashing the task. Found the WAV fmt-chunk short-unpack this way
    (round 14); keeps every future decoder honest."""
    from football_etl_pipeline_spark.operators import multimodal as m

    # (decoder, payload, prefix_ok): HEADER decoders read a fixed
    # prefix window by design, so decoding a long-enough truncation
    # is legitimate; CONTENT decoders (pixels/samples/frame walks)
    # must consume the whole container — for them a successful decode
    # of any strict prefix means a bounds check was LOST.
    pairs = [
        (m.decode_png_header, m.make_png(16, 16), True),
        (m.decode_png_pixels, m.make_png_pattern(35), False),
        (m.decode_jpeg_header, m.make_jpeg(64, 48), True),
        (
            m.decode_jpeg_exif,
            m.make_jpeg_exif(16, 16, orientation=3, make="cam1"),
            True,
        ),
        (m.decode_gif_header, m.make_gif(16, 16), True),
        (m.decode_gif_animation, m.make_gif_animated(16, 16, 3, 7, 2),
         False),
        (m.decode_wav_header, m.make_wav(64, junk_bytes=5), True),
        (m.decode_wav_samples, m.make_wav_tone(35), False),
        (m.decode_mp4_header, m.make_mp4(320, 240, 1000), True),
        (m.decode_mp4_frames, m.make_mp4_frames(35), False),
    ]
    for fn, payload, prefix_ok in pairs:
        for cut in range(len(payload)):
            try:
                fn(payload[:cut])
            except (ValueError, NotImplementedError):
                continue
            except Exception as exc:  # pragma: no cover - failure path
                pytest.fail(
                    f"{fn.__name__} cut at {cut}: {type(exc).__name__}:"
                    f" {exc}"
                )
            if not prefix_ok:
                pytest.fail(
                    f"{fn.__name__} decoded a truncated prefix (cut at"
                    f" {cut} of {len(payload)}) without error"
                )
    # and the one non-truncation shape the sweep can't reach: a
    # COMPLETE data chunk with an odd byte length (round-14 review)
    import struct as _struct

    wav = bytearray(m.make_wav_tone(35))
    doff = wav.index(b"data")
    (dlen,) = _struct.unpack("<I", wav[doff + 4 : doff + 8])
    wav[doff + 4 : doff + 8] = _struct.pack("<I", 3)
    odd = bytes(wav[: doff + 8]) + bytes(wav[doff + 8 : doff + 8 + 3])
    riff_len = len(odd) - 8
    odd = odd[:4] + _struct.pack("<I", riff_len) + odd[8:]
    with pytest.raises(ValueError, match="odd"):
        m.decode_wav_samples(odd)


def test_pattern_formulas_match_duckdb_sql():
    """The aHash pixel formula and the audio frame-amplitude formula
    exist twice by necessity (Python for the real encode/decode path,
    SQL inside the oracle) — pin the two spellings equal over a grid
    of inputs so an edit to one can't silently desync the other (the
    round-14 ADVICE lesson about copied oracle fragments)."""
    import duckdb

    from football_etl_pipeline_spark.operators.multimodal import (
        AUDIO_CLIP,
        _ahash_pattern_val,
        _audio_frame_amp,
    )

    con = duckdb.connect()
    rows = con.execute(
        """
        WITH g AS (
          SELECT i.g AS mid, x.g AS x, y.g AS y,
                 i.g // 15 AS fam, (i.g // 5) % 3 AS v,
                 ((y.g // 4) * 8 + x.g // 4) AS blk
          FROM generate_series(0, 495, 5) i(g),
               generate_series(0, 31, 3) x(g),
               generate_series(0, 31, 3) y(g)
        ),
        s1 AS (
          SELECT *, (fam*2654435761 + blk*1315423911) % 4294967296 AS h1
          FROM g
        ),
        s3 AS (
          SELECT *, (xor(h1 >> 16, h1) * 73244475) % 4294967296 AS h3
          FROM s1
        ),
        e AS (
          SELECT *,
                 (xor(h3 >> 16, h3)
                  + CASE WHEN blk % (CASE v WHEN 0 THEN 29 WHEN 1 THEN 23
                                     ELSE 17 END)
                              = (v*7 + fam) % (CASE v WHEN 0 THEN 29
                                               WHEN 1 THEN 23 ELSE 17 END)
                         THEN 1 ELSE 0 END
                  + CASE WHEN v = 2 AND fam % 3 = 0 AND blk = fam % 64
                         THEN 1 ELSE 0 END) % 2 AS eff
          FROM s3
        )
        SELECT mid, x, y,
               eff*140 + (x % 4)*7 + (y % 4)*11
               + ((x*y + fam) % 13)*3 AS val
        FROM e
        """
    ).fetchall()
    assert rows
    for mid, x, y, val in rows:
        assert val == _ahash_pattern_val(mid, x, y), (mid, x, y)

    arows = con.execute(
        f"""
        SELECT i.g AS mid, f.g AS f,
               CASE WHEN (f.g + i.g) % 11 = 0 THEN {AUDIO_CLIP}
                    WHEN (f.g + i.g) % 4 = 0 THEN 0
                    ELSE (i.g * 31 + f.g * 17) % 12000 + 500 END AS amp
        FROM generate_series(0, 495, 5) i(g),
             generate_series(0, 12) f(g)
        """
    ).fetchall()
    for mid, f, amp in arows:
        assert amp == _audio_frame_amp(mid, f), (mid, f)


def test_mp4_frame_decode_roundtrip_and_cuts():
    """decode_mp4_frames must return exactly the raw frame track the
    encoder wrote (lossless round trip — what lets the video oracle
    recompute sums from frame arithmetic), the per-frame sums must
    match the closed form 256*fill + texture, and the planted scene
    cuts must clear the threshold while within-scene jitter stays
    far below it."""
    from football_etl_pipeline_spark.operators.multimodal import (
        VIDEO_CUT_SUM_THRESH,
        VIDEO_FRAME_BYTES,
        _VIDF_TEXTURE_SUM,
        _video_frame_fill,
        decode_mp4_frames,
        decode_mp4_header,
        make_mp4_frames,
    )

    for mid in (4, 35, 123, 4004):
        payload = make_mp4_frames(mid)
        # the metadata rung still reads the same container
        head = decode_mp4_header(payload)
        assert head["width"] == head["height"] == 16
        frames = decode_mp4_frames(payload)
        assert len(frames) == 8 + mid % 7
        prev = None
        saw_cut = saw_still = False
        for f, fr in enumerate(frames):
            assert len(fr) == VIDEO_FRAME_BYTES
            s = sum(fr)
            want = (
                VIDEO_FRAME_BYTES * _video_frame_fill(mid, f)
                + _VIDF_TEXTURE_SUM
            )
            assert s == want, (mid, f)
            if prev is not None:
                d = abs(s - prev)
                if d > VIDEO_CUT_SUM_THRESH:
                    saw_cut = True
                else:
                    saw_still = True
                    # within-scene jitter is ≤ 6 fill units
                    assert d <= VIDEO_FRAME_BYTES * 6
            prev = s
        assert saw_cut and saw_still, mid

    # misaligned mdat dead-letters (complete container, bad track)
    import struct

    p = bytearray(make_mp4_frames(35))
    # chop one byte off the mdat while fixing its declared size
    moff = p.index(b"mdat") - 4
    (msize,) = struct.unpack(">I", p[moff : moff + 4])
    p[moff : moff + 4] = struct.pack(">I", msize - 1)
    with pytest.raises(ValueError, match="aligned"):
        decode_mp4_frames(bytes(p[:-1]))
