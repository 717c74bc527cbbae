"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step itself is STUBBED — image/audio codec libraries are not
in this container — behind ``decoder=`` injection: pass a real decoder
(e.g. PIL/torchaudio wrapper) in production, or use
``deterministic_fake_decoder`` (seed-stable features derived from the
bytes) in tests. The Spark-side contract — schema, partition sizing,
UDF signature, Arrow batch shape — is real and tested.

Schema convention:
    media(media_id long, kind string, payload binary,
          meta struct<width:int, height:int, sample_rate:int,
                      n_frames:int, codec:string>)
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("codec", T.StringType()),
])

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", MEDIA_META),
])

Decoder = Callable[[bytes, dict], np.ndarray]


def real_decoder(payload: bytes, meta: dict) -> np.ndarray:  # pragma: no cover
    """Placeholder for a codec-backed decoder (PIL / libsndfile / ffmpeg).

    Those libraries are not available in this environment; inject your
    own ``Decoder`` in production.
    """
    raise NotImplementedError(
        "no media codec available in this environment; pass decoder= explicitly"
    )


def deterministic_fake_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Seed-stable stand-in: derives a float32 array purely from the
    payload bytes (sha256-expanded), honoring meta dims when present, so
    tests exercise the full Spark plumbing with reproducible values."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "little")
    rng = np.random.default_rng(seed)
    w = (meta or {}).get("width") or 8
    hgt = (meta or {}).get("height") or 8
    return rng.standard_normal((int(hgt), int(w))).astype(np.float32)


def extract_features(
    media: DataFrame,
    feature_dim: int = 16,
    decoder: Optional[Decoder] = None,
    batch_limit: int = 256,
) -> DataFrame:
    """media -> (media_id, kind, feature array<float>, decode_error string).

    Decode + pool inside ``mapInPandas`` with a capped Arrow batch size
    (media payloads are large; ``batch_limit`` rows per pandas batch
    keeps executor memory bounded — set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` accordingly).
    Decode failures land in ``decode_error`` instead of failing the job.
    """
    dec = decoder or real_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats, errs = [], []
                for payload, meta in zip(chunk["payload"], chunk["meta"]):
                    try:
                        arr = dec(bytes(payload) if payload is not None else b"",
                                  dict(meta) if meta is not None else {})
                        flat = np.asarray(arr, dtype=np.float32).ravel()
                        # mean-pool into fixed dim (pad with zeros)
                        pooled = np.zeros(feature_dim, dtype=np.float32)
                        n = min(feature_dim, len(flat))
                        if len(flat):
                            splits = np.array_split(flat, feature_dim)
                            pooled = np.array(
                                [s.mean() if len(s) else 0.0 for s in splits],
                                dtype=np.float32,
                            )
                        feats.append(pooled.tolist())
                        errs.append(None)
                    except Exception as e:  # noqa: BLE001 - error column by design
                        feats.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "kind": chunk["kind"].to_numpy(),
                    "feature": feats,
                    "decode_error": errs,
                })

    return media.mapInPandas(
        run, schema="media_id long, kind string, feature array<float>, decode_error string"
    )


def resize_images(media: DataFrame, width: int, height: int,
                  decoder: Optional[Decoder] = None) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-emit as binary (float32
    raw). Same plumbing contract as extract_features."""
    dec = decoder or real_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    arr = dec(bytes(payload) if payload is not None else b"",
                              dict(meta) if meta is not None else {})
                    arr = np.atleast_2d(np.asarray(arr, dtype=np.float32))
                    yi = np.clip((np.arange(height) * arr.shape[0] / height), 0, arr.shape[0] - 1).astype(int)
                    xi = np.clip((np.arange(width) * arr.shape[1] / width), 0, arr.shape[1] - 1).astype(int)
                    payloads.append(arr[np.ix_(yi, xi)].tobytes())
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    payloads.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({
                "media_id": pdf["media_id"].to_numpy(),
                "payload": payloads,
                "width": width,
                "height": height,
                "decode_error": errs,
            })

    return media.mapInPandas(
        run,
        schema="media_id long, payload binary, width int, height int, decode_error string",
    )


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explode frame indices
    0, every_n, 2*every_n, ... (JVM-side; the decode of each sampled
    frame goes through extract_features)."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(1))
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return media.withColumn("frame_idx", F.explode(idx))


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (binary payload from hash)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), (8, 6, 16000, 30, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
