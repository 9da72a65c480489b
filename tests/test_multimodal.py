"""Multimodal binary-column plumbing: schema, Arrow-batched decode,
and the explicit NotImplementedError stub for real codecs."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from mapreduce_implementation_grpc_spark import registry
from mapreduce_implementation_grpc_spark.multimodal import (
    decode_features,
    fake_decode_batch,
    with_binary_payload,
)
from tests.oracle_utils import assert_matches_oracle


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [Row(doc_id=1, text="abc"), Row(doc_id=2, text=""), Row(doc_id=3, text="hello world")]
    )


def test_payload_schema_and_bytes(docs):
    p = with_binary_payload(docs)
    assert dict(p.dtypes)["payload"] == "binary"
    rows = {r.doc_id: r for r in p.collect()}
    assert bytes(rows[1].payload) == b"abc"
    assert rows[1].meta.n_bytes == 3 and rows[1].meta.modality == "text"
    assert rows[2].meta.n_bytes == 0


def test_decode_features_matches_local_computation(docs):
    out = {r.doc_id: r for r in decode_features(with_binary_payload(docs)).collect()}
    import pandas as pd

    expect = fake_decode_batch(pd.Series([b"abc", b"", b"hello world"]))
    assert out[1].feature == expect[0]
    assert out[2].feature == expect[1]
    assert out[3].feature == expect[2]
    assert out[3].n_bytes == 11


def test_real_codec_rejects_non_media_payload(docs):
    # real_codec=True now actually decodes (see test_codecs.py); over
    # text payloads it must fail loudly, not emit junk features.
    with pytest.raises(Exception, match="unknown payload format"):
        decode_features(with_binary_payload(docs), real_codec=True).collect()


def test_meta_oracle_parity(spark, sf_check):
    assert_matches_oracle(
        registry.QUERIES["multimodal_meta"](spark, sf_check),
        registry.ORACLES["multimodal_meta"],
        sf_check,
    )


def test_sample_frames_chunking(spark):
    from mapreduce_implementation_grpc_spark.multimodal import sample_frames

    docs = spark.createDataFrame([Row(doc_id=1, text="x" * 100)])
    frames = sample_frames(with_binary_payload(docs), every_k=2, frame_bytes=16).collect()
    # 100 bytes -> 7 chunks of <=16 -> every 2nd -> 4 frames
    assert [r.frame_idx for r in frames] == [0, 1, 2, 3]
    assert frames[0].n_bytes == 16
    assert frames[0].frame == ("78" * 16)  # 'x' == 0x78


def test_resize_images_fixed_output(spark):
    from mapreduce_implementation_grpc_spark.multimodal import resize_images

    docs = spark.createDataFrame([Row(doc_id=1, text="abcdefgh" * 32), Row(doc_id=2, text="")])
    out = {r.doc_id: r for r in resize_images(with_binary_payload(docs), 4, 4).collect()}
    assert len(out[1].thumb) == 2 * 16  # 16 sampled bytes, hex-encoded
    assert out[2].thumb == ""
    assert out[1].width == 4 and out[1].height == 4


def test_real_codec_media_ops_reject_non_media(spark):
    from mapreduce_implementation_grpc_spark.multimodal import resize_images, sample_frames

    docs = spark.createDataFrame([Row(doc_id=1, text="abc")])
    p = with_binary_payload(docs)
    with pytest.raises(Exception, match="not a WAV payload"):
        sample_frames(p, real_codec=True).collect()
    with pytest.raises(Exception, match="not a PNG payload"):
        resize_images(p, real_codec=True).collect()


def test_streaming_decode_features_matches_batch(spark, tmp_path):
    """The Arrow mapInPandas decode composed onto a stream must emit
    the identical feature vectors the batch path computes."""
    import json as _json
    import os as _os

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from mapreduce_implementation_grpc_spark.multimodal.binary_ops import (
        decode_features,
        with_binary_payload,
    )
    from mapreduce_implementation_grpc_spark.streaming import (
        streaming_decode_features,
    )

    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ])
    src = str(tmp_path / "mm_docs")
    _os.makedirs(src, exist_ok=True)
    rows = [(1, "the quick brown fox"), (2, "lazy dog"), (3, "x")]
    with open(_os.path.join(src, "d.json"), "w") as f:
        for doc_id, text in rows:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")

    stream = spark.readStream.schema(schema).json(src)
    q = (
        streaming_decode_features(stream)
        .writeStream.format("memory")
        .queryName("mm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.modality, r.n_bytes, tuple(r.feature))
        for r in spark.sql("select * from mm_stream").collect()
    }
    batch = spark.read.schema(schema).json(src)
    want = {
        r.doc_id: (r.modality, r.n_bytes, tuple(r.feature))
        for r in decode_features(with_binary_payload(batch)).collect()
    }
    assert got == want and len(got) == 3
