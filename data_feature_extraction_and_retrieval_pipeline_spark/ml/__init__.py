from .encoders import (  # noqa: F401
    stub_text_encoder_udf,
    stub_image_encoder_udf,
    zero_shot_tags,
    segment_image,
    decode_image_stub,
)
