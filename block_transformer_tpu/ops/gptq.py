"""Calibration-based INT4/INT8 weight quantization (GPTQ-style).

Round-to-nearest INT4 fails the <=0.5% ppl gate on sharp checkpoints
(QUALITY.md round 3: every RTN INT4 config measured +0.88..+2.03% on the
10k-step TPU model). This module implements error-compensated rounding
against a calibration Hessian — the GPTQ recipe (Frantar et al., 2023):
quantize weight rows one at a time and fold each row's rounding error
into the not-yet-quantized rows through the inverse-Hessian Cholesky
factor, so the *layer output* error ||X(W - What)|| is minimized rather
than the weight error ||W - What||.

Two deliberate design constraints:

1. **The packed format is unchanged.** Output is exactly
   ``ops/quant.quantize_int4``'s split-half nibble packing with
   contiguous group-wise scales [G, N] (and ``quantize_int8``'s
   per-channel [N]), so the fused Pallas dequant-matmul kernel and every
   dispatch rule in ops/linear.py consume GPTQ-packed weights with zero
   changes — only the packing-time *rounding* differs. Act-order (rows
   processed by descending Hessian diagonal) therefore uses STATIC group
   scales and un-permutes Q at the end, so the contiguous group structure
   the kernel tiles on is preserved.
2. **Sequential propagation.** Layers are calibrated in forward order
   and each layer's Hessian is accumulated from activations produced by
   the *already-quantized* earlier layers (the full GPTQ pipeline), so
   later layers compensate earlier layers' quantization noise.

The calibration driver mirrors the teacher-forced forward of
``models/block_transformer.block_transformer_forward`` (reference
semantics: model/block_transformer.py:50-225) for the NeoX family
(gpt-neo-x block decoder + prefix token decoder — every main config).
Other families fall back to RTN.

All Hessian math runs on host (numpy): quantization is an offline
packing step, K is at most ``intermediate_size`` (8192 at 1.2B), and a
[K, K] fp64 Gram plus one Cholesky per linear is cheap next to training.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from block_transformer_tpu.ops import quant


# ---------------------------------------------------------------------------
# Core: error-compensated rounding for one weight matrix
# ---------------------------------------------------------------------------

def gptq_round(W, H, *, bits: int = 4, group_size: int = 128,
               damp: float = 0.01, act_order: bool = False):
    """GPTQ rounding of ``W [K, N]`` against input Gram ``H [K, K]``.

    Returns ``(Q int32 [K, N], scale fp32 [G, N])`` for bits=4 (grid
    [-7, 7], group-wise scales over contiguous K-row ranges, same
    structure as quant.quantize_int4) or ``(Q, scale [N])`` for bits=8
    (per-channel, same as quant.quantize_int8).

    Without ``act_order``, group scales are computed when the row sweep
    *enters* each group, from the error-compensated (current) weights —
    the standard GPTQ group treatment; the processing block size equals
    the group size so every row a scale covers is up to date when the
    scale is taken.

    ``act_order=True`` processes rows by descending Hessian diagonal
    (most-activated inputs rounded first, while the most compensation
    freedom remains) with STATIC group scales precomputed from the
    original weights per contiguous row group — so ``Q`` is un-permuted
    at the end and the scale/packing layout the Pallas kernel tiles on
    is unchanged (the standard act_order + static_groups combination).
    """
    W = np.array(W, dtype=np.float64, copy=True)
    H = np.array(H, dtype=np.float64, copy=True)
    K, N = W.shape
    assert H.shape == (K, K), (H.shape, K)
    qmax = 7 if bits == 4 else 127
    if bits == 4:
        gs = quant._int4_group_size(K, group_size)
    else:
        gs = K
    G = K // gs

    # dead inputs (never activated in calibration): quantize to 0, and
    # give them a unit diagonal so the Cholesky stays defined
    diag = np.arange(K)
    dead = np.diag(H) <= 0.0
    H[dead, dead] = 1.0
    W[dead, :] = 0.0

    perm = None
    scales = np.zeros((G, N), dtype=np.float64)
    if act_order:
        perm = np.argsort(-np.diag(H), kind="stable")
        # static scales from the ORIGINAL weights, per contiguous group
        for g in range(G):
            scales[g] = np.maximum(
                np.max(np.abs(W[g * gs:(g + 1) * gs]), axis=0), 1e-8) / qmax
        group_of = np.arange(K) // gs          # original row -> group
        W = W[perm]
        H = H[perm][:, perm]
        row_group = group_of[perm]             # sweep position -> group

    H[diag, diag] += damp * float(np.mean(np.diag(H)))

    # Cholesky factor of the INVERSE Hessian, upper form: Hinv = U.T @ U.
    # U[i, i] scales row i's error; U[i, i+1:] distributes it forward.
    Hinv = np.linalg.inv(H)
    U = np.linalg.cholesky(Hinv).T

    Q = np.zeros((K, N), dtype=np.int32)

    block = gs if (G > 1 and not act_order) else min(128, K)
    for b0 in range(0, K, block):
        b1 = min(b0 + block, K)
        Wb = W[b0:b1]
        Eb = np.zeros_like(Wb)
        for i in range(b0, b1):
            j = i - b0
            if act_order:
                s = scales[row_group[i]]
            else:
                if i % gs == 0:
                    g = i // gs
                    # group rows live inside this block (block == gs when
                    # G > 1), so Wb holds their current compensated values
                    rows = Wb[j:j + gs] if G > 1 else W
                    scales[g] = np.maximum(np.max(np.abs(rows), axis=0),
                                           1e-8) / qmax
                s = scales[i // gs]
            w = Wb[j]
            q = np.clip(np.round(w / s), -qmax, qmax)
            Q[i] = q
            err = (w - q * s) / U[i, i]
            Eb[j] = err
            if j + 1 < b1 - b0:
                Wb[j + 1:] -= np.outer(U[i, i + 1:b1], err)
        if b1 < K:
            W[b1:] -= U[b0:b1, b1:].T @ Eb

    if act_order:
        inv = np.empty_like(perm)
        inv[perm] = np.arange(K)
        Q = Q[inv]
    if bits == 8:
        return Q, scales[0].astype(np.float32)
    return Q, scales.astype(np.float32)


def pack_gptq_int4(Q, scale):
    """(Q int [K, N], scale [G, N]) -> (packed int8 [K/2, N], scale fp32)
    in quant.quantize_int4's split-half layout (byte row i = row i low
    nibble | row i+K/2 high nibble)."""
    K = Q.shape[0]
    half = K // 2
    lo = (Q[:half].astype(np.uint8)) & 0xF
    hi = ((Q[half:].astype(np.uint8)) & 0xF) << 4
    return (lo | hi).astype(np.int8), np.asarray(scale, np.float32)


def gptq_quantize_linear_weight(w, H, *, bits: int, group_size: int,
                                damp: float = 0.01, act_order: bool = False):
    """One [K, N] kernel -> quantized leaf dict entries (numpy)."""
    Q, scale = gptq_round(np.asarray(w), H, bits=bits, group_size=group_size,
                          damp=damp, act_order=act_order)
    if bits == 4:
        packed, scale = pack_gptq_int4(Q, scale)
        return {"kernel_q4": packed, "scale": scale}
    return {"kernel_q8": Q.astype(np.int8), "scale": scale}


# ---------------------------------------------------------------------------
# Calibration driver for the NeoX block-transformer family
# ---------------------------------------------------------------------------

def _gram(x, valid):
    """Masked input Gram: x [B, S, K], valid [B, S] in {0,1} ->
    fp64 [K, K] (sum over valid positions of x x^T)."""
    x = np.asarray(x, np.float64) * np.asarray(valid, np.float64)[..., None]
    x2 = x.reshape(-1, x.shape[-1])
    return x2.T @ x2


def _np_tree(node):
    if isinstance(node, dict):
        return {k: _np_tree(v) for k, v in node.items()}
    return np.asarray(node)


class _StackQuantizer:
    """Sequential per-layer GPTQ over one stacked NeoX trunk.

    ``hs``: list of per-batch hidden states [B, S, h] (jnp, fp32);
    ``valids``: matching [B, S] {0,1} position validity for the Hessian;
    ``masks_``: per-batch AttnMask for the full [S, S] attention.
    Mutates nothing; returns the quantized stacked ``layers`` node plus
    the final per-batch hidden states (computed with quantized weights).
    """

    def __init__(self, stack_params, cfg, *, bits: int, group_size: int,
                 damp: float, act_order: bool = False, log=lambda *_: None):
        self.params = stack_params          # {"layers": ..., "final_ln": ...}
        self.cfg = cfg
        self.bits = bits
        self.group_size = group_size
        self.damp = damp
        self.act_order = act_order
        self.log = log

    def _quantize(self, name, i, w, H):
        self.log(f"    layer {i} {name}: K={w.shape[0]} N={w.shape[1]} "
                 f"bits={self.bits}")
        leaf = gptq_quantize_linear_weight(
            w, H, bits=self.bits, group_size=self.group_size, damp=self.damp,
            act_order=self.act_order)
        if self.bits == 4:
            w_hat = quant.dequantize_int4(
                jnp.asarray(leaf["kernel_q4"]), jnp.asarray(leaf["scale"]),
                jnp.float32)
        else:
            w_hat = quant.dequantize_int8(
                jnp.asarray(leaf["kernel_q8"]), jnp.asarray(leaf["scale"]),
                jnp.float32)
        return leaf, w_hat

    def run(self, hs, valids, masks_, positions):
        from block_transformer_tpu.models import neox

        cfg = self.cfg
        layers = _np_tree(self.params["layers"])
        L = layers["ln1"]["scale"].shape[0]
        cos, sin = neox.rope_tables(cfg, int(np.max(positions)) + 1)
        out_layers = {name: [] for name in ("qkv", "out", "up", "down")}
        eps = cfg.layer_norm_eps

        def pl(i):
            """Per-layer fp param view (numpy -> jnp on use)."""
            def walk(node):
                if isinstance(node, dict):
                    return {k: walk(v) for k, v in node.items()}
                return jnp.asarray(node[i])
            return walk(layers)

        for i in range(L):
            p = pl(i)
            # --- QKV ------------------------------------------------------
            a_ins = [neox.layer_norm(h, p["ln1"], eps) for h in hs]
            H = sum(_gram(a, v) for a, v in zip(a_ins, valids))
            leaf, w_hat = self._quantize("qkv", i, layers["attn"]["qkv"]["kernel"][i], H)
            out_layers["qkv"].append(leaf)
            p["attn"]["qkv"]["kernel"] = w_hat

            def qkv_of(a_in, b):
                B, S = a_in.shape[0], a_in.shape[1]
                qkv = (a_in @ p["attn"]["qkv"]["kernel"]
                       + p["attn"]["qkv"]["bias"])
                qkv = qkv.reshape(B, S, 3, cfg.num_heads,
                                  cfg.head_dim).transpose(2, 0, 3, 1, 4)
                q = neox.apply_rope(qkv[0], cos, sin, positions)
                k = neox.apply_rope(qkv[1], cos, sin, positions)
                return q, k, qkv[2]

            attns = []
            for b, a_in in enumerate(a_ins):
                q, k, v = qkv_of(a_in, b)
                attns.append(neox._attention(q, k, v, masks_[b], "xla"))

            # --- attention out ---------------------------------------------
            a_flats = []
            for attn in attns:
                B, S = attn.shape[0], attn.shape[2]
                a_flats.append(attn.transpose(0, 2, 1, 3).reshape(B, S, -1))
            H = sum(_gram(a, v) for a, v in zip(a_flats, valids))
            leaf, w_hat = self._quantize("out", i, layers["attn"]["out"]["kernel"][i], H)
            out_layers["out"].append(leaf)
            p["attn"]["out"]["kernel"] = w_hat

            # --- MLP up -----------------------------------------------------
            assert cfg.use_parallel_residual, \
                "gptq driver implements the parallel-residual (Pythia) layout"
            m_ins = [neox.layer_norm(h, p["ln2"], eps) for h in hs]
            H = sum(_gram(m, v) for m, v in zip(m_ins, valids))
            leaf, w_hat = self._quantize("up", i, layers["mlp"]["up"]["kernel"][i], H)
            out_layers["up"].append(leaf)
            p["mlp"]["up"]["kernel"] = w_hat

            # --- MLP down ---------------------------------------------------
            us = [jax.nn.gelu(m @ p["mlp"]["up"]["kernel"]
                              + p["mlp"]["up"]["bias"], approximate=False)
                  for m in m_ins]
            H = sum(_gram(u, v) for u, v in zip(us, valids))
            leaf, w_hat = self._quantize("down", i, layers["mlp"]["down"]["kernel"][i], H)
            out_layers["down"].append(leaf)
            p["mlp"]["down"]["kernel"] = w_hat

            # --- advance hidden states with the fully quantized layer ------
            new_hs = []
            for h, a_flat, u in zip(hs, a_flats, us):
                attn_out = a_flat @ p["attn"]["out"]["kernel"] \
                    + p["attn"]["out"]["bias"]
                mlp_out = u @ p["mlp"]["down"]["kernel"] \
                    + p["mlp"]["down"]["bias"]
                new_hs.append(h + attn_out + mlp_out)
            hs = new_hs

        # assemble quantized stacked layers node (same tree as
        # quant.quantize_model_params on the stacked params)
        def stack_leaves(leaves):
            return {k: jnp.asarray(np.stack([lf[k] for lf in leaves]))
                    for k in leaves[0]}

        q_layers = {
            "ln1": self.params["layers"]["ln1"],
            "ln2": self.params["layers"]["ln2"],
            "attn": {
                "qkv": dict(stack_leaves(out_layers["qkv"]),
                            bias=self.params["layers"]["attn"]["qkv"]["bias"]),
                "out": dict(stack_leaves(out_layers["out"]),
                            bias=self.params["layers"]["attn"]["out"]["bias"]),
            },
            "mlp": {
                "up": dict(stack_leaves(out_layers["up"]),
                           bias=self.params["layers"]["mlp"]["up"]["bias"]),
                "down": dict(stack_leaves(out_layers["down"]),
                             bias=self.params["layers"]["mlp"]["down"]["bias"]),
            },
        }
        fin = [neox.layer_norm(h, jax.tree.map(jnp.asarray,
                                               self.params["final_ln"]),
                               self.cfg.layer_norm_eps) for h in hs]
        return q_layers, fin


def gptq_quantize_block_transformer(params, cfg, batches, *, bits: int = 4,
                                    group_size: int = 128,
                                    token_decoder_bits: int = None,
                                    lm_head_bits: int = None,
                                    skip_lm_head: bool = False,
                                    damp: float = 0.01,
                                    act_order: bool = False,
                                    verbose: bool = False):
    """Full sequential GPTQ over a block-transformer param tree.

    ``batches``: iterable of ``(input_ids, attention_mask,
    block_attention_mask)`` block-format calibration samples ([B, N, L] /
    [B, N]); a few hundred rows of the training corpus suffice.

    Returns a quantized tree in exactly ``quant.quantize_block_transformer``'s
    format (stacked ``kernel_q4/scale`` nodes + fp embedder/norms/biases),
    so generate / engine / eval consume it unchanged. Only the NeoX
    (gpt-neo-x + prefix) family is supported — the main configs; other
    families should use RTN.
    """
    from block_transformer_tpu.models import embedder as emb
    from block_transformer_tpu.models import neox
    from block_transformer_tpu.ops import masks

    assert cfg.block_decoder_cls != "gpt-neo", "gptq: NeoX family only"
    assert cfg.token_decoder.cls not in ("gpt-neo", "t5") and \
        cfg.token_decoder.decoding_strategy == "prefix", \
        "gptq: prefix NeoX token decoder only"

    log = (lambda *a: print("[gptq]", *a, flush=True)) if verbose \
        else (lambda *a: None)
    td_bits = bits if token_decoder_bits is None else token_decoder_bits
    n = cfg.n_embedding_tokens
    ph = cfg.embedder.projection_hidden_size
    L_blk = cfg.block_length
    n_exp = cfg.n_expanded_emb

    batches = [tuple(jnp.asarray(a) for a in b) for b in batches]

    # ---- block decoder ----------------------------------------------------
    hs, valids, masks_, S = [], [], [], None
    for ids, att, bam in batches:
        B, N, _ = ids.shape
        be = emb.embed_blocks(params["embedder"], cfg.embedder, L_blk, ids,
                              attention_mask=att)
        x = be.reshape(B, N * n, ph).astype(jnp.float32)
        hs.append(x)
        valids.append(jnp.repeat(bam.astype(jnp.int32), n, axis=1))
        masks_.append(masks.block_decoder_train_mask(bam, n))
        S = N * n
    positions = np.arange(S, dtype=np.int32)

    log("block decoder:", len(batches), "calibration batches")
    sq = _StackQuantizer(params["block_decoder"], cfg.block_decoder,
                         bits=bits, group_size=group_size, damp=damp,
                         act_order=act_order, log=log)
    q_bd_layers, bd_hidden = sq.run(hs, valids, masks_,
                                    jnp.asarray(positions))
    q_bd = dict(params["block_decoder"])
    q_bd["layers"] = q_bd_layers

    # ---- token decoder inputs (shift-left; block_transformer.py:118-151) --
    td_params = params["token_decoder"]
    exp_ins, exp_valids = [], []
    td_meta = []
    for (ids, att, bam), hidden in zip(batches, bd_hidden):
        B, N, _ = ids.shape
        be = emb.embed_blocks(params["embedder"], cfg.embedder, L_blk, ids,
                              attention_mask=att)
        ids_s = ids[:, 1:, :].reshape(B * (N - 1), L_blk)
        att_s = att[:, 1:, :].reshape(B * (N - 1), L_blk)
        blk_s = bam[:, 1:].reshape(B * (N - 1))
        block_embeddings = hidden[:, :-n, :].reshape(B * (N - 1), n, ph)
        exp_ins.append(block_embeddings)
        exp_valids.append(jnp.broadcast_to(blk_s.astype(jnp.int32)[:, None],
                                           (B * (N - 1), n)))
        td_meta.append((ids_s, att_s, blk_s))

    # expansion layer (token decoder side, quantized at td_bits)
    q_td = dict(td_params)
    use_expansion = (cfg.token_decoder.expansion_method == "expansion_layer"
                     and "expansion" in td_params
                     and "kernel" in td_params["expansion"])
    if use_expansion:
        H = sum(_gram(x, v) for x, v in zip(exp_ins, exp_valids))
        log(f"expansion: K={ph}")
        leaf = gptq_quantize_linear_weight(
            np.asarray(td_params["expansion"]["kernel"]), H, bits=td_bits,
            group_size=group_size, damp=damp, act_order=act_order)
        exp_node = {k: jnp.asarray(v) for k, v in leaf.items()}
        if "bias" in td_params["expansion"]:
            exp_node["bias"] = td_params["expansion"]["bias"]
        q_td["expansion"] = exp_node
        if td_bits == 4:
            w_hat = quant.dequantize_int4(exp_node["kernel_q4"],
                                          exp_node["scale"], jnp.float32)
        else:
            w_hat = quant.dequantize_int8(exp_node["kernel_q8"],
                                          exp_node["scale"], jnp.float32)
        exp_apply = {"kernel": w_hat}
        if "bias" in td_params["expansion"]:
            exp_apply["bias"] = td_params["expansion"]["bias"]
    else:
        exp_apply = td_params.get("expansion")

    td_hs, td_valids, td_masks = [], [], []
    for block_embeddings, (ids_s, att_s, blk_s) in zip(exp_ins, td_meta):
        Bb = ids_s.shape[0]
        if use_expansion:
            out = (block_embeddings @ exp_apply["kernel"])
            if "bias" in exp_apply:
                out = out + exp_apply["bias"]
            expanded = out.reshape(Bb, n * cfg.expansion_ratio,
                                   cfg.token_decoder.neox.hidden_size)
        else:
            expanded = jnp.repeat(block_embeddings, cfg.expansion_ratio,
                                  axis=-2)
        bos = jnp.full((Bb, 1), cfg.bos_token_id, ids_s.dtype)
        td_ids = jnp.concatenate([bos, ids_s], axis=1)
        td_att = jnp.concatenate(
            [jnp.ones((Bb, 1), att_s.dtype), att_s], axis=1)
        tok_ids = td_ids[:, 1:-1]
        tok_embeds = neox.embed_tokens(td_params, tok_ids).astype(jnp.float32)
        x = jnp.concatenate([expanded.astype(jnp.float32), tok_embeds], axis=1)
        m = masks.token_decoder_train_mask(td_att[:, 1:-1], n_prefix=n_exp)
        Std = n_exp + L_blk - 1
        adapted_att = jnp.concatenate(
            [jnp.ones((Bb, n_exp), jnp.int32),
             td_att[:, 1:-1].astype(jnp.int32)], axis=1)
        td_hs.append(x)
        td_valids.append(adapted_att * blk_s.astype(jnp.int32)[:, None])
        td_masks.append(m)

    log("token decoder:", len(batches), "calibration batches")
    sq_td = _StackQuantizer(td_params, cfg.token_decoder.neox,
                            bits=td_bits, group_size=group_size, damp=damp,
                            act_order=act_order, log=log)
    q_td_layers, td_hidden = sq_td.run(
        td_hs, td_valids, td_masks,
        jnp.arange(n_exp + L_blk - 1, dtype=jnp.int32))
    q_td["layers"] = q_td_layers

    # ---- LM head -----------------------------------------------------------
    head_bits = lm_head_bits if lm_head_bits is not None else td_bits
    if skip_lm_head:
        pass  # stays fp
    else:
        head_ins = [h[:, n_exp - 1:, :] for h in td_hidden]
        head_valids = []
        for (ids_s, att_s, blk_s) in td_meta:
            head_valids.append(att_s.astype(jnp.int32)
                               * blk_s.astype(jnp.int32)[:, None])
        H = sum(_gram(x, v) for x, v in zip(head_ins, head_valids))
        log(f"lm head: bits={head_bits}")
        leaf = gptq_quantize_linear_weight(
            np.asarray(td_params["embed_out"]["kernel"]), H, bits=head_bits,
            group_size=group_size, damp=damp, act_order=act_order)
        head_node = {k: jnp.asarray(v) for k, v in leaf.items()}
        if "bias" in td_params["embed_out"]:
            head_node["bias"] = td_params["embed_out"]["bias"]
        q_td["embed_out"] = head_node

    out = dict(params)
    out["block_decoder"] = q_bd
    out["token_decoder"] = q_td
    return out
