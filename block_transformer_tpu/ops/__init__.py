from block_transformer_tpu.ops.masks import AttnMask  # noqa: F401
from block_transformer_tpu.ops.linear import apply_linear  # noqa: F401
from block_transformer_tpu.ops.quant import (  # noqa: F401
    quantize_block_transformer, quantize_model_params,
)
