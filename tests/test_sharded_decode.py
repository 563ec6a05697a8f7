"""Multi-chip inference: generate_blocks under a (data, model) mesh with
TP-sharded params and data-sharded batch must produce exactly the same
tokens as the unsharded single-device run (XLA inserts the collectives)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tests.test_block_parity import make_cfg, VOCAB
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.inference import generate as gen
from block_transformer_tpu.parallel import sharding as sh


def test_sharded_generate_matches_single_device():
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    B, N, L = 4, 3, cfg.block_length
    ids = rng.integers(1, VOCAB, size=(B, N, L))
    att = np.ones_like(ids)
    bam = att.any(-1).astype(np.int64)

    ref = gen.generate_blocks(params, cfg, jnp.asarray(ids), jnp.asarray(att),
                              jnp.asarray(bam), max_blocks=N + 2, greedy=True)
    ref_tokens = np.asarray(ref.tokens)

    mesh = sh.make_mesh(n_data=2, n_model=4)
    with jax.sharding.set_mesh(mesh):
        sharded_params = sh.shard_params(mesh, params)
        data_sh = NamedSharding(mesh, P("data"))
        args = [jax.device_put(jnp.asarray(x), data_sh)
                for x in (ids, att, bam)]
        res = gen.generate_blocks(sharded_params, cfg, *args,
                                  max_blocks=N + 2, greedy=True)
        got_tokens = np.asarray(res.tokens)

    np.testing.assert_array_equal(got_tokens, ref_tokens)
    assert int(res.n_blocks) == int(ref.n_blocks)
