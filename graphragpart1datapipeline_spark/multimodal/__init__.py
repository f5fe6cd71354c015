from .assets import (  # noqa: F401
    decode_image_features,
    fake_decode_stats,
    frame_sample_plan,
    pillow_decoder,
)
