"""HF-layout export must round-trip through the importer unchanged
(reference interop: pretrain_block_transformer.py:145-155 layout)."""

import numpy as np
import jax
import jax.numpy as jnp

from tests.test_block_parity import make_cfg
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.utils import torch_export, torch_import


def test_export_reimport_identity(tmp_path):
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(7), cfg)
    out = torch_export.export_block_transformer(params, cfg, str(tmp_path))
    back = torch_import.load_checkpoint(out, cfg, dtype=jnp.float32)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    b_by_path = {jax.tree_util.keystr(p): v
                 for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in b_by_path, f"missing after round-trip: {key}"
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(b_by_path[key]),
                                   rtol=1e-6, atol=1e-6, err_msg=key)


def test_exported_qkv_matches_hf_convention(tmp_path):
    """The exported fused QKV must load into the HF row order the importer
    expects: spot-check the permutation by driving import's converter."""
    cfg = make_cfg()
    params = bt.init_block_transformer_params(jax.random.PRNGKey(3), cfg)
    ncfg = cfg.block_decoder
    w_ours = np.asarray(params["block_decoder"]["layers"]["attn"]["qkv"]
                        ["kernel"][0])
    w_hf = torch_export._qkv_weight_to_hf(w_ours, ncfg.num_heads,
                                          ncfg.head_dim)
    w_back = torch_import._convert_qkv_weight(w_hf, ncfg.num_heads,
                                              ncfg.head_dim)
    np.testing.assert_allclose(w_back, w_ours, rtol=1e-6, atol=1e-6)
