"""Real image kernels (PIL-backed decode/featurize/resize) — gated like the
Kafka integration test: runs only where PIL is importable. The sandbox has
no PIL, so these skip there; the stub-path contract is covered by
tests/test_multimodal.py either way."""

from __future__ import annotations

import pytest

from emdatapipelines_spark.llmdata.multimodal import HAS_PIL

pytestmark = pytest.mark.skipif(not HAS_PIL, reason="PIL not installed (optional dependency)")


def _png_bytes(w=8, h=6, color=(200, 10, 10)):
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (w, h), color).save(buf, format="PNG")
    return buf.getvalue()


def _media(spark):
    rows = [
        (1, "image/png", bytearray(_png_bytes()), None, None, None, None),
        (2, "image/png", bytearray(b"not a real image"), None, None, None, None),
        (3, "text/plain", bytearray(b"hello"), None, None, None, None),
    ]
    return spark.createDataFrame(
        rows,
        "media_id long, mime_type string, payload binary, width int, height int, "
        "duration_ms int, byte_size long",
    )


def test_pil_featurize_decodes_real_images(spark):
    from emdatapipelines_spark.llmdata.multimodal import decode_and_featurize

    out = {r["media_id"]: r for r in decode_and_featurize(_media(spark), 8, kernel="pil").collect()}
    assert out[1]["decode_status"] == "ok_pil"
    feat = out[1]["feature"]
    assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-9  # normalized histogram
    assert out[2]["decode_status"] == "decode_failed"  # corrupt image flagged, not failed
    assert out[3]["decode_status"] == "ok"  # non-image falls through to stub path


def test_pil_resize_reencodes_to_target_dims(spark):
    import io

    from PIL import Image

    from emdatapipelines_spark.llmdata.multimodal import resize_images

    out = {r["media_id"]: r for r in resize_images(_media(spark), 16, 12, kernel="pil").collect()}
    assert out[1]["resize_status"] == "ok_pil"
    with Image.open(io.BytesIO(bytes(out[1]["payload"]))) as im:
        assert im.size == (16, 12)
    assert out[2]["resize_status"] == "decode_failed"
    assert out[3]["resize_status"] == "skipped_not_image"
