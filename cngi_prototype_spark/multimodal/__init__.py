"""Multimodal (image/audio/video) column plumbing."""

from cngi_prototype_spark.multimodal.media import (  # noqa: F401
    decode_media,
    media_features,
    sample_frames,
)
