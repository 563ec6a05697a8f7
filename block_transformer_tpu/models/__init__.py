from block_transformer_tpu.models.block_transformer import (  # noqa: F401
    BlockTransformerOutput, block_transformer_forward,
    init_block_transformer_params, count_params,
)
from block_transformer_tpu.models.vanilla import (  # noqa: F401
    init_vanilla_params, vanilla_forward, vanilla_loss,
)
from block_transformer_tpu.models.neox import (  # noqa: F401
    KVCache, QuantKVCache,
)
