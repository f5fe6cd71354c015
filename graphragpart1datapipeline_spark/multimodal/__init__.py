from .assets import (  # noqa: F401
    decode_image_features,
    decode_payloads,
    fake_decode_stats,
    frame_sample_plan,
    pillow_decoder,
)
from .audio import (  # noqa: F401
    audio_match_pairs,
    audio_near_dup_pairs,
    decode_audio_frames,
    fake_decode_frames,
    frame_shingle_fingerprints,
)
