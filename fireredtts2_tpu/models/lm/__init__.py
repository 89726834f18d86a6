from fireredtts2_tpu.models.lm.transformer import (  # noqa: F401
    init_transformer_params,
    init_kv_cache,
    transformer_forward,
)
from fireredtts2_tpu.models.lm.model import (  # noqa: F401
    init_lm_params,
    init_lm_state,
    lm_prefill,
    lm_decode_frame,
    lm_loss,
)
