from snappydata_spark.sources.multimodal import (
    MULTIMODAL_SCHEMA,
    attach_payload_metadata,
    decode_images,
    extract_audio_features,
    sample_video_frames,
)

__all__ = [
    "MULTIMODAL_SCHEMA",
    "attach_payload_metadata",
    "decode_images",
    "extract_audio_features",
    "sample_video_frames",
]
