"""Genuine-HF-layout checkpoint import (VERDICT r4 item 7).

The state-dict converters in utils/torch_import.py are parity-tested
against live HF modules, but the checkpoint-*directory* path
(``load_checkpoint``) was previously only exercised against this repo's
own exporter — a shared-bug blind spot. Here the on-disk trees are
written by the *installed* ``transformers`` ``save_pretrained`` (the
same serializer the reference uses, pretrain_block_transformer.py:145-155
/ eval_zero_shot_task.py:115-129), in both reference layouts:

- per-component dirs ``{embedder,block_decoder,token_decoder}/``
- HF-Trainer combined ``checkpoint-<step>/model.safetensors`` with
  ``embedder.`` / ``block_decoder.`` / ``token_decoder.`` key prefixes
  (exactly what ``Trainer.save_model`` writes for a composite module
  with those child names)

and the loaded params must reproduce the independent torch
recomposition's composite logits. torch_export is never touched.
"""

import os

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import GPTNeoXConfig as HFConfig
from transformers import GPTNeoXForCausalLM

from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.utils import torch_import

from test_block_parity import (HID, L, RATIO, VOCAB, TorchBlockRef, make_cfg,
                               make_inputs)


def _hf_cfg():
    return HFConfig(vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=HID * 4,
                    max_position_embeddings=64, rotary_pct=0.25,
                    use_parallel_residual=True, attn_implementation="eager",
                    bos_token_id=0, eos_token_id=0)


def _save_reference_tree(ref: TorchBlockRef, root: str) -> None:
    """Write ref's weights as the reference's per-component HF dirs AND a
    combined Trainer checkpoint, via the installed transformers."""
    # block decoder: a GPTNeoXForCausalLM whose trunk is ref's block core
    # (the reference's GPTNeoXBlockDecoder IS a GPTNeoXForCausalLM
    # subclass; its save_pretrained writes the same gpt_neox.* keys)
    blk = GPTNeoXForCausalLM(_hf_cfg())
    blk.gpt_neox = ref.block_core
    blk.save_pretrained(os.path.join(root, "block_decoder"))

    # token decoder: GPTNeoXForCausalLM + the reference's expansion_layer
    # Conv1d(k=1) submodule (model/token_decoder/base.py:61-68); attaching
    # it makes save_pretrained serialize expansion_layer.* alongside
    tok = GPTNeoXForCausalLM(_hf_cfg())
    tok.gpt_neox = ref.token_core
    tok.embed_out = ref.embed_out
    tok.expansion_layer = torch.nn.Conv1d(HID, HID * RATIO, 1)
    with torch.no_grad():
        tok.expansion_layer.weight.copy_(ref.expansion.weight[:, :, None])
        tok.expansion_layer.bias.copy_(ref.expansion.bias)
    tok.save_pretrained(os.path.join(root, "token_decoder"))

    # embedder (LookupEmbedder state dict: embeddings.weight)
    from safetensors.torch import save_file
    emb_dir = os.path.join(root, "embedder")
    os.makedirs(emb_dir, exist_ok=True)
    save_file({"embeddings.weight": ref.embedder_emb.weight.detach().clone()},
              os.path.join(emb_dir, "model.safetensors"))

    # combined HF-Trainer checkpoint: one model.safetensors with child-
    # prefixed keys — what Trainer.save_model writes for the composite
    combined = {}
    combined["embedder.embeddings.weight"] = \
        ref.embedder_emb.weight.detach().clone()
    for k, v in blk.state_dict().items():
        combined[f"block_decoder.{k}"] = v.detach().clone()
    for k, v in tok.state_dict().items():
        combined[f"token_decoder.{k}"] = v.detach().clone()
    step_dir = os.path.join(root, "checkpoint-100")
    os.makedirs(step_dir, exist_ok=True)
    save_file(combined, os.path.join(step_dir, "model.safetensors"))


@pytest.fixture(scope="module")
def saved_tree(tmp_path_factory):
    ref = TorchBlockRef(seed=7)
    root = str(tmp_path_factory.mktemp("hf_ckpt"))
    _save_reference_tree(ref, root)
    return ref, root


def _assert_composite_parity(ref, params):
    cfg = make_cfg()
    ids, att, bam = make_inputs(seed=11)
    with torch.no_grad():
        want = ref(torch.tensor(ids), torch.tensor(att),
                   torch.tensor(bam)).numpy()
    out = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(att), jnp.asarray(bam))
    got = np.asarray(out.logits)
    sel = (att[:, 1:, :] * bam[:, 1:, None]).astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=3e-4, rtol=3e-4)


def test_per_component_dir_import(saved_tree):
    ref, root = saved_tree
    params = torch_import.load_checkpoint(root, make_cfg(),
                                          dtype=jnp.float32)
    _assert_composite_parity(ref, params)


def test_combined_trainer_checkpoint_import(saved_tree):
    ref, root = saved_tree
    params = torch_import.load_checkpoint(os.path.join(root, "checkpoint-100"),
                                          make_cfg(), dtype=jnp.float32)
    _assert_composite_parity(ref, params)


def test_layouts_agree_leafwise(saved_tree):
    _, root = saved_tree
    import jax
    a = torch_import.load_checkpoint(root, make_cfg(), dtype=jnp.float32)
    b = torch_import.load_checkpoint(os.path.join(root, "checkpoint-100"),
                                     make_cfg(), dtype=jnp.float32)
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb) and len(la) > 0
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
