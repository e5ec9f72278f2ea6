"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns.  The Spark-side plumbing
(schema, Arrow batch shape, partition sizing) is real and tested; the
actual media decode is STUBBED — this container has no image/audio
libraries — behind ``_decode_media_stub``, a deterministic fake clearly
marked as such.  Swap the stub for PIL/ffmpeg calls on a real cluster;
nothing else changes.

Pattern: ``mapInPandas`` with Arrow batches so payload bytes cross into
Python once per batch (vectorized), never per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "id long, n_bytes long, header string, fake_width int, fake_height int, "
    "feature array<float>"
)


def _decode_media_stub(payload: bytes | None) -> tuple[str, int, int, list[float]]:
    """STUB media decode: deterministic fake.

    Real implementation would be e.g. PIL.Image.open(BytesIO(payload)).
    The fake derives stable pseudo-metadata from the payload bytes so
    tests are deterministic and the full pipeline shape is exercised.
    """
    if payload is None or len(payload) == 0:
        return "", 0, 0, [0.0] * 8
    header = payload[:8].hex()
    w = 64 + payload[0] % 64
    h = 64 + payload[-1] % 64
    arr = np.frombuffer(payload[:256].ljust(256, b"\0"), dtype=np.uint8)
    feat = (arr.reshape(8, 32).mean(axis=1) / 255.0).astype(np.float32)
    return header, int(w), int(h), feat.tolist()


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary payload → metadata + feature vector, Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                header, w, h, feat = _decode_media_stub(payload)
                rows.append(
                    (
                        i,
                        len(payload) if payload is not None else 0,
                        header,
                        w,
                        h,
                        feat,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "n_bytes", "header", "fake_width", "fake_height", "feature"],
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)
