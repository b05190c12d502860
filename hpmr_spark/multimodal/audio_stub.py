"""Audio-shaped multimodal pipeline: chunk payloads into fixed windows and
feature-extract per window in Python (mapInPandas) — the torchaudio/librosa
call-site shape with a deterministic stand-in feature.

The fake feature (md5-derived energy) lets the DuckDB oracle verify the
ENTIRE distributed pipeline — chunking arithmetic, Arrow batch alignment,
per-chunk Python execution — with only the DSP kernel stubbed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK = 256  # chars per analysis window

AUDIO_FEATURES_SCHEMA = "doc_id long, chunk_idx long, chunk_fp string, energy_ppm long"


def chunk_features(payload: str, doc_id: int) -> list[dict]:
    out = []
    n_chunks = len(payload) // CHUNK + 1
    for i in range(n_chunks):
        chunk = payload[i * CHUNK : (i + 1) * CHUNK]
        fp = hashlib.md5(chunk.encode("utf-8")).hexdigest()
        out.append(
            {
                "doc_id": doc_id,
                "chunk_idx": i,
                "chunk_fp": fp,
                "energy_ppm": int(fp[:15], 16) % 1_000_000,
            }
        )
    return out


def audio_features(docs: DataFrame) -> DataFrame:
    """One row per (doc, window): fingerprint + fake energy. Swap
    chunk_features' body for a real DSP kernel (same schema) in production."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rows.extend(chunk_features(text, doc_id))
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(extract, AUDIO_FEATURES_SCHEMA)
