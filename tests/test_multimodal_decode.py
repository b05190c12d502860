"""Real-decoder readiness tests (VERDICT r8 item 5).

The container ships no Pillow, so the real image-decode path cannot run
here — but the call site must stay covered and collectable so the moment a
decoder appears the end-to-end path is tested with ZERO code change:

- test_decode_meta_real_roundtrip: skipped without Pillow; drives a real
  1x1 PNG through decode_meta_real's mapInPandas/Arrow plumbing.
- test_decode_image_honest_gate: always runs; pins the documented
  NotImplementedError (or, with Pillow present, a successful decode) so
  the gate can never silently turn into a wrong-answer path.
"""

import pytest

from hpmr_spark.multimodal.decode_stub import HAVE_PIL, decode_image

# Smallest valid 1x1 8-bit grayscale PNG (public-domain byte layout:
# signature + IHDR + IDAT(zlib deflate of one 0x00-filtered row) + IEND).
PNG_1X1 = bytes.fromhex(
    "89504e470d0a1a0a"
    "0000000d49484452000000010000000108000000003a7e9b55"
    "0000000a4944415478da6364000000060003"  # deflate of b"\x00\x00"
    "366e8aec"
    "0000000049454e44ae426082"
)


def test_decode_image_honest_gate():
    if HAVE_PIL:
        img = decode_image(PNG_1X1)
        assert (img.width, img.height) == (1, 1)
    else:
        with pytest.raises(NotImplementedError):
            decode_image(PNG_1X1)


@pytest.mark.skipif(not HAVE_PIL, reason="container ships no Pillow")
def test_decode_meta_real_roundtrip(spark):
    from hpmr_spark.multimodal.binary_columns import decode_meta_real

    df = spark.createDataFrame([(1, PNG_1X1)], ["doc_id", "payload"])
    rows = {r["doc_id"]: r for r in decode_meta_real(df).collect()}
    assert rows[1]["width"] == 1
    assert rows[1]["height"] == 1
    assert rows[1]["format"] == "png"
