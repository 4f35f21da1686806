from csv2db_spark.multimodal.media import (  # noqa: F401
    MEDIA_META_FIELDS,
    audio_active_segments,
    audio_window_energy,
    decode_image,
    decode_image_real,
    media_stats,
    resize_image,
    sample_video_frames,
    synth_media,
)
