from fireredtts2_tpu.models.codec.model import (  # noqa: F401
    init_codec_params,
    codec_encode,
    codec_decode,
    stream_decode_init,
    stream_decode_step,
)
