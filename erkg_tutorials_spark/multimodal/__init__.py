from erkg_tutorials_spark.multimodal.media import (
    MEDIA_SCHEMA,
    decode_features,
    resize_images,
    sample_frames,
)
