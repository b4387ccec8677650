"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata.

Engine extension (no reference-parity item — the reference's nearest
analog is `bytea`): the Spark-native pattern for multimodal corpora is

- payload: ``binary`` column, immutable blob, never interpreted by the
  engine itself;
- metadata: a typed struct column (width/height/channels/sample_rate/
  n_frames/format) that all partitioning, filtering, and planning run
  on — so Catalyst prunes/pushes down on metadata without touching
  payloads;
- decode / feature-extract / resize / frame-sample as Arrow-batched
  ``mapInPandas`` stages — payloads cross the JVM→Python boundary once
  per batch, not once per row.

Codec stubs: the image/audio libraries are not available in this
container, so the decode kernels run a clearly-marked deterministic
fake (seeded by the payload hash). The Spark-side plumbing — schemas,
batch iteration, partitioning, UDF signatures — is real and is what
these operators test. Swap ``_decode_pixels_stub`` for a PIL/ffmpeg
call to productionize.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ])),
])


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from the documents table
    (the container ships no real binaries). Payload = the utf-8 text
    bytes; metadata follows closed-form expressions of the id so a SQL
    oracle can replay every metadata-level operator."""
    i = F.col(id_col).cast("long")
    kind = F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (i % 3 + 1).cast("int"))
    return docs.select(
        i.alias("media_id"),
        kind.alias("kind"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            (F.lit(64) + (i % 8) * 16).cast("int").alias("width"),
            (F.lit(48) + (i % 6) * 16).cast("int").alias("height"),
            F.when(i % 3 == 0, 3).otherwise(1).cast("int").alias("channels"),
            F.when(kind == "audio", 16000).otherwise(0).cast("int").alias("sample_rate"),
            F.when(kind == "video", (i % 240 + 1)).otherwise(1).cast("int").alias("n_frames"),
            F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")), (i % 3 + 1).cast("int"))
             .alias("format"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# decode kernels (STUB — deterministic fake in place of PIL/ffmpeg)

def _decode_pixels_stub(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB decoder: a real deployment calls PIL.Image.open /
    libavcodec here. The fake derives pixels deterministically from the
    payload bytes so tests are reproducible and content-sensitive."""
    seed = np.frombuffer(payload[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
    rng = np.random.default_rng(int(seed))
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def decode_real(payload: bytes, fmt: str) -> np.ndarray:
    """The production decode path. Raises until a codec library is
    installed — gated so the engine never silently fakes real data."""
    raise NotImplementedError(
        "real media decode requires PIL/soundfile/ffmpeg, which this "
        "environment does not ship; the *_stub kernels are used instead")


# ---------------------------------------------------------------------------
# operators

IMAGE_STATS_SCHEMA = (
    "media_id long, n_pixels long, mean_value double, std_value double, min_value int, max_value int"
)


def image_stats(media: DataFrame) -> DataFrame:
    """Decode each image payload (stub kernel) and emit per-image pixel
    statistics. Arrow-batched mapInPandas: one Python roundtrip per
    batch of payloads."""
    imgs = media.filter(F.col("kind") == "image").select(
        "media_id", "payload", "meta.width", "meta.height", "meta.channels")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode_pixels_stub(bytes(r.payload), r.width, r.height, r.channels)
                rows.append((r.media_id, int(px.size), float(px.mean()),
                             float(px.std()), int(px.min()), int(px.max())))
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_pixels", "mean_value", "std_value", "min_value", "max_value"])

    return imgs.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize plumbing: decode → resample → re-encode per batch. The
    stub resamples the fake pixel grid by nearest-neighbor and returns
    the raw bytes as the new payload; metadata is rewritten for real."""
    imgs = media.filter(F.col("kind") == "image")
    schema = MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for r in pdf.itertuples(index=False):
                m = r.meta
                px = _decode_pixels_stub(bytes(r.payload), m["width"], m["height"], m["channels"])
                yi = (np.arange(out_h) * m["height"] // out_h)
                xi = (np.arange(out_w) * m["width"] // out_w)
                resized = px[yi][:, xi]
                meta = dict(m)
                meta.update(width=out_w, height=out_h, format="raw")
                out.append((r.media_id, r.kind, resized.tobytes(), meta))
            yield pd.DataFrame(out, columns=["media_id", "kind", "payload", "meta"])

    return imgs.mapInPandas(batches, schema=schema)


def frame_index(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling plan for video payloads: explode sampled frame
    indices 0, n, 2n, ... JVM-side (no Python) — the per-frame decode
    is a downstream mapInPandas over (media_id, frame_no) batches."""
    vids = media.filter(F.col("kind") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
    return vids.select("media_id", F.explode(idx).alias("frame_no"),
                       F.col("meta.n_frames").alias("n_frames"))


FEATURE_SCHEMA = "media_id long, feature array<double>"


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: decode (stub) → pooled feature vector per
    payload. Deterministic per payload content; batch-shaped like a
    real vision-encoder inference stage (vectorized over the batch)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples(index=False):
                px = _decode_pixels_stub(bytes(r.payload), 8, max(dim // 8, 1) * 8, 1)
                vec = px.reshape(dim, -1).mean(axis=1) / 255.0
                rows.append((r.media_id, [float(x) for x in vec]))
            yield pd.DataFrame(rows, columns=["media_id", "feature"])

    return media.select("media_id", "payload").mapInPandas(batches, schema=FEATURE_SCHEMA)
