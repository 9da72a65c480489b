"""Multimodal column plumbing (extension surface, SURVEY.md 2b).

Image/audio/video payloads are opaque `binary` columns with a typed
metadata struct; decode/feature-extraction runs as Arrow-batched
`mapInPandas` so the Python boundary is crossed once per batch, not
per row. The media codecs themselves are NOT in this container, so
the decode step is a clearly marked stub: `decode_features(...,
real_codec=True)` raises NotImplementedError, while the default
deterministic fake keeps every piece of the Spark-side plumbing
(schema, partitioning, batch shape, null handling) real and tested.

At 100 TB: payloads stay columnar in parquet (binary column chunks),
the scan prunes metadata-only queries to the metadata columns, and
decode parallelism = partition count; there is no shuffle anywhere
in this pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Here the payload is the UTF-8 bytes of the text (the container
    has no media files); for real corpora the column would come
    straight from parquet/lance as `binary`."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("content_sha256"),
        ).alias("meta"),
    )


def fake_decode_batch(payloads: pd.Series) -> list[list[float]]:
    """Deterministic stand-in for a media codec: 4 summary floats per
    payload (length, first byte, last byte, byte-sum mod 997)."""
    out = []
    for raw in payloads:
        b = bytes(raw) if raw is not None else b""
        out.append(
            [float(len(b)), float(b[0] if b else 0), float(b[-1] if b else 0),
             float(sum(b) % 997)]
        )
    return out


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", StringType()),  # BinaryType in a real pipeline
        StructField("n_bytes", LongType()),
    ]
)


def sample_frames(payload_df: DataFrame, every_k: int = 4, frame_bytes: int = 16,
                  real_codec: bool = False) -> DataFrame:
    """Frame sampling for video-like payloads: emit every k-th
    fixed-size chunk of the payload as a 'frame' row (1 input row ->
    N output rows -- the mapInPandas shape a real ffmpeg-based
    sampler uses; here the chunker is the deterministic stand-in).
    Row explosion happens executor-side per Arrow batch; nothing is
    widened before the scan."""
    if real_codec:
        raise NotImplementedError(
            "video codecs are not installed in this environment; "
            "replace the chunker with an ffmpeg/pyav frame iterator"
        )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame": [], "n_bytes": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(raw) if raw is not None else b""
                chunks = [b[i:i + frame_bytes] for i in range(0, len(b), frame_bytes)]
                for idx, chunk in enumerate(chunks[::every_k]):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame"].append(chunk.hex())
                    out["n_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return payload_df.mapInPandas(_sample, FRAME_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("thumb", StringType()),  # BinaryType in a real pipeline
    ]
)


def resize_images(payload_df: DataFrame, width: int = 8, height: int = 8,
                  real_codec: bool = False) -> DataFrame:
    """Image resize for image-like payloads. The deterministic
    stand-in 'resizes' by striding the byte stream down to
    width*height samples; a real pipeline drops PIL/opencv into the
    same per-batch slot -- schema, batching, and partition behavior
    are identical."""
    if real_codec:
        raise NotImplementedError(
            "image codecs are not installed in this environment; "
            "replace the strider with PIL.Image.resize"
        )

    target = width * height

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for raw in pdf["payload"]:
                b = bytes(raw) if raw is not None else b""
                if len(b) == 0:
                    thumbs.append("")
                    continue
                step = max(1, len(b) // target)
                thumbs.append(b[::step][:target].hex())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "thumb": thumbs,
                }
            )

    return payload_df.mapInPandas(_resize, RESIZED_SCHEMA)


def decode_features(payload_df: DataFrame, real_codec: bool = False) -> DataFrame:
    """Arrow-batched decode: binary payload -> fixed-width feature
    vector via mapInPandas (one Python crossing per ~10k-row batch).

    real_codec=True is the integration point for an actual
    image/audio library (PIL/torchaudio/...) -- not available in this
    container, so it raises immediately rather than pretending."""
    if real_codec:
        raise NotImplementedError(
            "media codecs are not installed in this environment; "
            "plug a real decoder into fake_decode_batch's slot"
        )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": [m["modality"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "feature": fake_decode_batch(pdf["payload"]),
                }
            )

    return payload_df.mapInPandas(_decode, DECODED_FEATURE_SCHEMA)
