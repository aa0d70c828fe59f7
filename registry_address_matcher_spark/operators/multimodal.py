"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side machinery (schemas, partition-friendly batch iteration,
Arrow-batched UDF signatures) is real and tested; the actual media decode
is STUBBED behind ``decode_stub=True`` (deterministic fake) or raises
``NotImplementedError`` — the image/audio libraries are not in this
container. At deploy time the stub body is replaced by e.g. PIL/ffmpeg
calls inside the same ``mapInPandas`` iterator; nothing else changes.

Design notes for 100 TB of media:

* binary payloads ride in their own column so column pruning keeps
  metadata-only queries from ever reading the bytes;
* ``mapInPandas`` (iterator form) processes one Arrow batch at a time —
  peak memory is one batch of payloads, not a partition;
* ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch size;
  for multi-MB payloads set it low (the session default here is 10k,
  callers repartition by bytes when payloads are large).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for a real decoder: derives (w, h, feature)
    from the payload's sha256 so tests are stable and collision-free."""
    d = hashlib.sha256(payload or b"").digest()
    w = 64 + d[0]
    h = 64 + d[1]
    feat = (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    return w, h, feat


def _pil_image_module():
    """PIL is an OPTIONAL dependency — absent in this container. Imported
    inside the executor-side function so the driver never needs it."""
    try:
        from PIL import Image  # type: ignore

        return Image
    except ImportError:
        return None


def _pil_decode(Image, payload: bytes) -> tuple[int, int, np.ndarray]:
    """Real decode: dimensions + a 32-dim grayscale thumbnail feature
    (8x4 resize, [-1, 1] normalized) — same shape contract as the stub."""
    import io

    img = Image.open(io.BytesIO(payload))
    w, h = img.size
    thumb = np.asarray(img.convert("L").resize((8, 4)), dtype=np.float32)
    return w, h, (thumb.reshape(-1) - 128.0) / 128.0


def decode_images(df: DataFrame, decode_stub: bool | None = None) -> DataFrame:
    """payload -> (width, height, feature[32]) via iterator mapInPandas.

    decode_stub=None (default): use PIL when importable on the executor,
    else fall back to the deterministic stub. True forces the stub;
    False requires PIL and raises if it is missing.

    Streaming iterator: one Arrow batch of payloads in memory at a time.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil_image_module()
        use_stub = decode_stub if decode_stub is not None else Image is None
        if not use_stub and Image is None:
            raise NotImplementedError(
                "real image decode requires PIL — not installed on this executor"
            )
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "feature": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if use_stub:
                    w, h, feat = _fake_decode(payload)
                else:
                    w, h, feat = _pil_decode(Image, payload)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["feature"].append(feat.tolist())
            yield pd.DataFrame(rows)

    pruned = df.select("media_id", "payload")
    return pruned.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def sample_video_frames(df: DataFrame, every_n: int = 10, decode_stub: bool = True) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled frame index.

    The stub derives frame count from payload length; a real build reads
    container metadata instead. Explodes JVM-side (no Python for the
    fan-out), decodes per-frame features in one Arrow pass."""
    frames = df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.length("payload") / 1000).cast("int"), F.lit(1)) - 1,
                F.lit(every_n),
            )
        ).alias("frame_idx"),
        "payload",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError("real video decode requires ffmpeg")
            out = {"media_id": [], "frame_idx": [], "feature": []}
            for mid, idx, payload in zip(pdf["media_id"], pdf["frame_idx"], pdf["payload"]):
                d = hashlib.sha256((payload or b"") + int(idx).to_bytes(4, "big")).digest()
                out["media_id"].append(mid)
                out["frame_idx"].append(int(idx))
                out["feature"].append(
                    ((np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0).tolist()
                )
            yield pd.DataFrame(out)

    schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )
    return frames.mapInPandas(run, schema)


def media_metadata_stats(df: DataFrame, numeric_cols: tuple[str, ...] = ()) -> DataFrame:
    """Metadata-only aggregate — must NOT read the payload column (column
    pruning keeps the binary out of the scan; asserted in tests via the
    physical plan's ReadSchema). ``numeric_cols`` adds avg/max per typed
    metadata column (width, duration, ...)."""
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.length("mime")), 6).alias("avg_mime_len"),
    ]
    for c in numeric_cols:
        aggs.append(F.round(F.avg(c), 6).alias(f"avg_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy("kind").agg(*aggs)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randint(0, 256, size=rng.randint(500, 5000), dtype=np.uint8))
        rows.append(
            {
                "media_id": f"m{i:05d}",
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "meta": {"source": f"synth{i % 5}"},
            }
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
