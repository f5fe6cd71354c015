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
from .video import (  # noqa: F401
    decode_video_frames,
    fake_decode_video,
    video_frame_hashes,
    video_near_dup_pairs,
)
