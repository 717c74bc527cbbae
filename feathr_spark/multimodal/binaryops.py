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


# ---------------------------------------------------------------------------
# real decoders for stdlib-decodable formats (no codec library needed)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed BMP (8-bit grayscale-palette or 24/32-bit
    BGR) to a float32 grayscale (H, W) array in [0, 255].

    Pure struct/numpy parse of the Windows BITMAPINFOHEADER layout —
    needs no imaging library, so the multimodal decode path is provable
    end-to-end in this container. Compressed BMPs (BI_RLE*) raise.
    """
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    _planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    flip = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_bytes = ((width * bpp // 8) + 3) & ~3  # rows padded to 4 bytes
    need = data_off + row_bytes * height
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_bytes * height, offset=data_off)
    rows = raw.reshape(height, row_bytes)
    if bpp == 8:
        gray = rows[:, :width].astype(np.float32)
    else:
        nch = bpp // 8
        px = rows[:, : width * nch].reshape(height, width, nch).astype(np.float32)
        # BMP stores BGR(A); ITU-R 601 luma
        gray = 0.114 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.299 * px[:, :, 2]
    return gray[::-1] if flip else gray


def encode_bmp(gray: np.ndarray) -> bytes:
    """Encode a (H, W) array in [0, 255] as a 24-bit uncompressed BMP —
    the inverse of :func:`decode_bmp`, used to synthesize real image
    bytes for tests and benchmarks without external data."""
    import struct

    arr = np.clip(np.asarray(gray, dtype=np.float32), 0, 255).astype(np.uint8)
    h, w = arr.shape
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    bgr = np.repeat(arr[::-1, :, None], 3, axis=2)  # bottom-up, B=G=R=gray
    body[:, : w * 3] = bgr.reshape(h, w * 3)
    data = body.tobytes()
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return hdr + info + data


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM/PGM (P6/P5, maxval<=255) to float32 grayscale."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, i, n = [], 2, len(payload)
    while len(tokens) < 3 and i < n:
        c = payload[i:i + 1]
        if c == b"#":
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not payload[j:j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    nch = 3 if payload[:2] == b"P6" else 1
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * nch, offset=i)
    if nch == 1:
        return raw.reshape(h, w).astype(np.float32)
    px = raw.reshape(h, w, 3).astype(np.float32)
    return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]


def real_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Format-sniffing decoder for the formats decodable without codec
    libraries: uncompressed BMP and binary PPM/PGM. Anything else
    (JPEG/PNG/audio/video) raises — inject a PIL/ffmpeg-backed
    ``Decoder`` in production; this container has no codec libs."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] in (b"P6", b"P5"):
        return decode_ppm(payload)
    raise NotImplementedError(
        "payload is not BMP/PPM and no media codec is available in this "
        "environment; pass decoder= explicitly"
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


def image_stats(media: DataFrame, decoder: Optional[Decoder] = None,
                batch_limit: int = 256) -> DataFrame:
    """media -> (media_id, width, height, mean_pixel, std_pixel,
    decode_error) by actually decoding each payload (default decoder
    handles BMP/PPM natively). Same bounded-Arrow-batch contract as
    :func:`extract_features`."""
    dec = decoder or real_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                w, h, mu, sd, errs = [], [], [], [], []
                for payload, meta in zip(chunk["payload"], chunk["meta"]):
                    try:
                        arr = np.atleast_2d(dec(
                            bytes(payload) if payload is not None else b"",
                            dict(meta) if meta is not None else {}))
                        h.append(int(arr.shape[0])); w.append(int(arr.shape[1]))
                        mu.append(float(arr.mean())); sd.append(float(arr.std()))
                        errs.append(None)
                    except Exception as e:  # noqa: BLE001 - error column by design
                        w.append(None); h.append(None)
                        mu.append(None); sd.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "mean_pixel": pd.array(mu, dtype="float64"),
                    "std_pixel": pd.array(sd, dtype="float64"),
                    "decode_error": errs,
                })

    return media.mapInPandas(
        run,
        schema=("media_id long, width int, height int, mean_pixel double, "
                "std_pixel double, decode_error string"),
    )


def make_bmp_media(spark, n: int = 32, seed: int = 7) -> DataFrame:
    """Deterministic table of REAL image bytes: each row is a valid
    24-bit BMP whose pixels derive from a seeded gradient+hash pattern,
    so the default :func:`real_decoder` path is exercised end-to-end
    with no external data or codec library."""
    rows = []
    for i in range(n):
        w, h = 4 + (i % 5) * 3, 3 + (i % 4) * 2
        base = int.from_bytes(hashlib.sha256(f"{seed}:{i}".encode()).digest()[:4], "little")
        yy, xx = np.mgrid[0:h, 0:w]
        gray = ((yy * 17 + xx * 31 + base) % 256).astype(np.float32)
        rows.append((i, "image", bytearray(encode_bmp(gray)),
                     (w, h, None, None, "bmp")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests (binary payload from hash)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        kind = ["image", "audio", "video"][i % 3]
        rows.append((i, kind, bytearray(payload), (8, 6, 16000, 30, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
