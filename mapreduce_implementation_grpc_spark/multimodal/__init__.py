from .binary_ops import (
    DECODED_FEATURE_SCHEMA,
    decode_features,
    fake_decode_batch,
    resize_images,
    sample_frames,
    with_binary_payload,
)

__all__ = [
    "DECODED_FEATURE_SCHEMA",
    "decode_features",
    "fake_decode_batch",
    "resize_images",
    "sample_frames",
    "with_binary_payload",
]
