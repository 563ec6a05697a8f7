"""Composite Block Transformer parity vs an independent torch implementation.

The torch side below recomposes the architecture's semantics (embed ->
block-decode -> shift-left -> prefix token-decode, per
/root/reference/model/block_transformer.py:50-225) from stock HF
GPTNeoXModel pieces — an independent implementation path, so agreement
pins both the math and our static-shape refactoring. n_embedding_tokens=1
(the only value the main configs and generation use).
"""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from transformers import GPTNeoXConfig as HFConfig
from transformers import GPTNeoXModel

from block_transformer_tpu.config import (BlockTransformerConfig, EmbedderConfig,
                                          NeoXConfig, TokenDecoderConfig)
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.utils import torch_import

VOCAB = 96
L = 4           # block_length
HID = 64
EMB_HID = HID // L
RATIO = 2
N_EXP = RATIO   # n_embedding_tokens == 1


def make_cfg():
    blk = NeoXConfig(vocab_size=VOCAB, hidden_size=HID, num_layers=2,
                     num_heads=4, intermediate_size=HID * 4,
                     max_position_embeddings=64)
    tok = TokenDecoderConfig(neox=blk, expansion_ratio=RATIO)
    embc = EmbedderConfig(vocab_size=VOCAB, hidden_size=EMB_HID,
                          projection_hidden_size=HID)
    return BlockTransformerConfig(block_length=L, embedder=embc,
                                  block_decoder=blk, token_decoder=tok)


class TorchBlockRef(torch.nn.Module):
    """Independent torch recomposition of the block-transformer forward."""

    def __init__(self, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        hf = HFConfig(vocab_size=VOCAB, hidden_size=HID, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=HID * 4,
                      max_position_embeddings=64, rotary_pct=0.25,
                      use_parallel_residual=True, attn_implementation="eager",
                      bos_token_id=0, eos_token_id=0)
        self.embedder_emb = torch.nn.Embedding(VOCAB, EMB_HID, padding_idx=0)
        self.block_core = GPTNeoXModel(hf).eval()
        self.token_core = GPTNeoXModel(hf).eval()
        self.token_embed_in = self.token_core.embed_in
        self.embed_out = torch.nn.Linear(HID, VOCAB, bias=False)
        self.expansion = torch.nn.Linear(HID, HID * RATIO)

    @torch.no_grad()
    def forward(self, ids, att, bam):
        B, N, Lb = ids.shape
        # embedder: lookup + concat (padding rows are zero)
        e = self.embedder_emb(ids.reshape(-1, Lb))        # [B*N, L, EMB_HID]
        be = e.reshape(B, N, HID)                          # concat projection
        # block decoder: causal over blocks (n_emb=1) with padding mask
        hid = self.block_core(inputs_embeds=be, attention_mask=bam).last_hidden_state
        # shift left
        cond = hid[:, :-1, :].reshape(B * (N - 1), 1, HID)
        ids_s = ids[:, 1:, :].reshape(B * (N - 1), Lb)
        att_s = att[:, 1:, :].reshape(B * (N - 1), Lb)
        # token decoder, prefix strategy with discard_redundant_tokens:
        # inputs [prefix(2), x1..x3], mask [1, 1, a1..a3]
        pre = self.expansion(cond.squeeze(1)).reshape(-1, RATIO, HID)
        tok = self.token_embed_in(ids_s[:, :Lb - 1])
        x = torch.cat([pre, tok], dim=1)
        m = torch.cat([torch.ones(x.shape[0], N_EXP, dtype=att_s.dtype),
                       att_s[:, :Lb - 1]], dim=1)
        h = self.token_core(inputs_embeds=x, attention_mask=m).last_hidden_state
        h = h[:, N_EXP - 1:, :]                            # [Bb, L, HID]
        logits = self.embed_out(h)
        return logits.reshape(B, N - 1, Lb, VOCAB)


def ref_to_params(ref: TorchBlockRef, cfg: BlockTransformerConfig):
    sd = {("gpt_neox." + k): v for k, v in ref.block_core.state_dict().items()}
    blk = torch_import.neox_params_from_state_dict(
        sd, cfg.block_decoder, with_embed_in=False, with_lm_head=False)
    sd = {("gpt_neox." + k): v for k, v in ref.token_core.state_dict().items()}
    sd["embed_out.weight"] = ref.embed_out.weight
    tok = torch_import.neox_params_from_state_dict(sd, cfg.token_decoder.neox)
    tok["expansion"] = {
        "kernel": jnp.asarray(ref.expansion.weight.detach().numpy().T),
        "bias": jnp.asarray(ref.expansion.bias.detach().numpy()),
    }
    embp = {"embeddings": {
        "weight": jnp.asarray(ref.embedder_emb.weight.detach().numpy())}}
    return {"embedder": embp, "block_decoder": blk, "token_decoder": tok}


def make_inputs(B=2, N=5, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(1, VOCAB, size=(B, N, L))
    att = np.ones_like(ids)
    # sequence 0: last block full padding, second-to-last partial (EOS at slot 1)
    ids[0, -1] = 0
    att[0, -1] = 0
    ids[0, -2, 1:] = 0
    att[0, -2, 2:] = 0          # EOS at slot 1 keeps attention 1
    bam = att.any(axis=-1).astype(np.int64)
    return ids, att, bam


def test_composite_logits_parity():
    cfg = make_cfg()
    ref = TorchBlockRef()
    params = ref_to_params(ref, cfg)
    ids, att, bam = make_inputs()
    with torch.no_grad():
        want = ref(torch.tensor(ids), torch.tensor(att),
                   torch.tensor(bam)).numpy()
    out = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(att), jnp.asarray(bam))
    got = np.asarray(out.logits)
    # only compare attended positions in non-padding blocks (others are
    # zero-filled / garbage in the reference too)
    sel = (att[:, 1:, :] * bam[:, 1:, None]).astype(bool)
    np.testing.assert_allclose(got[sel], want[sel], atol=3e-4, rtol=3e-4)


def test_loss_matches_manual_ce():
    cfg = make_cfg()
    ref = TorchBlockRef()
    params = ref_to_params(ref, cfg)
    ids, att, bam = make_inputs(seed=3)
    labels = np.where(att == 0, -100, ids)
    out = bt.block_transformer_forward(params, cfg, jnp.asarray(ids),
                                       jnp.asarray(att), jnp.asarray(bam),
                                       labels=jnp.asarray(labels),
                                       compute_logits=True)
    # manual masked CE over the logits (reference mean over kept tokens)
    logits = np.asarray(out.logits, np.float64)
    tgt = labels[:, 1:, :]
    w = (att[:, 1:, :] * bam[:, 1:, None] * (tgt != -100)).astype(bool)
    lp = logits - np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)),
                                axis=-1, keepdims=True)) - logits.max(-1, keepdims=True)
    ce = -np.take_along_axis(lp, np.clip(tgt, 0, None)[..., None], axis=-1)[..., 0]
    want = ce[w].mean()
    np.testing.assert_allclose(float(out.token_decoding_loss), want, rtol=1e-5)
