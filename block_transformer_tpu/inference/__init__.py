# NOTE: the `generate` FUNCTION is deliberately not re-exported here — it
# would shadow the `inference.generate` submodule that callers import as
# `from block_transformer_tpu.inference import generate as gen`.
from block_transformer_tpu.inference.generate import (  # noqa: F401
    GenerationResult, generate_blocks,
)
from block_transformer_tpu.inference.engine import (  # noqa: F401
    ContinuousBatchingEngine, Request,
)
