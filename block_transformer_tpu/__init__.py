"""block_transformer_tpu: TPU-native Block Transformer framework.

A from-scratch JAX/XLA/Pallas implementation of the Block Transformer
global-to-local architecture (reference: itsnamgyu/block-transformer,
NeurIPS 2024) — functional model core, Pallas kernels, quantized hierarchical
KV-cache inference engine, pjit/shard_map multi-chip scaling, training,
and evaluation harness.
"""

__version__ = "0.1.0"

from block_transformer_tpu.config import (  # noqa: F401
    BlockTransformerConfig, EmbedderConfig, NeoXConfig, TokenDecoderConfig,
    get_config, get_vanilla_config, make_block_config,
)
