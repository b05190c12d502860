"""Decoder stubs for multimodal payloads.

The execution container ships no image/audio libraries; real decoding is
gated behind import-try. The fallback is a DETERMINISTIC fake decoder —
metadata derived from the payload bytes by integer arithmetic — so the Spark
plumbing (schema, Arrow batches, partitioning) is fully testable and
oracle-checkable. Replace with Pillow/torchaudio/PyAV in production; the
mapInPandas call sites don't change.
"""

from __future__ import annotations

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic fake metadata: derived from byte length and first bytes.
    Mirrors the DuckDB oracle arithmetic in operators/multimodal_queries.py."""
    n = len(payload)
    first = payload[0] if n else 0
    return {
        "byte_len": n,
        "format": ["raw", "png", "jpeg", "webp"][first % 4],
        "width": 16 * (n % 64 + 1),
        "height": 9 * (n % 64 + 1),
        "n_frames": n // 1024 + 1,
    }


def decode_image(payload: bytes):
    """Real decode path — unavailable here by design."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires Pillow, which this container does not ship; "
            "use fake_decode_meta for plumbing tests"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover
