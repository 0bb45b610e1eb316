from clipx.models.clip import (  # noqa: F401
    init_params,
    encode_image,
    encode_text,
    clip_forward,
)
