"""LM adapters: score flat token sequences with the block / vanilla models.

``BlockTransformerLM`` reproduces the reference's pad adapter
(lm_eval/models/block_transformer_pad.py:71-156): left-pad ``block_length-1``
pad tokens so the first content token sits in block 0's last slot (making
flattened shifted logit ``j`` predict input token ``j+1``, the HF
convention), right-pad to a block boundary, mark ONE attention bit on the
EOS slot right after each row's content (:121-129), run with
``skip_padding_blocks=False`` and truncate flattened logits to ``seq_len``
(:151). ``nopad=True`` gives the right-pad-only variant for old checkpoints
(block_transformer_nopad.py: logits truncated to ``seq_len - (block_length
- 1)``).

Scoring runs in jitted length-bucketed batches (static shapes; one compile
per bucket).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from block_transformer_tpu.config import BlockTransformerConfig, NeoXConfig
from block_transformer_tpu.eval.harness import LM
from block_transformer_tpu.models import block_transformer as bt
from block_transformer_tpu.models import vanilla as vmod


def _bucket(n: int, step: int = 128, lo: int = 128) -> int:
    return max(lo, -(-n // step) * step)


class _TokenizedLM(LM):
    """Shared batching/scoring machinery over a logits function."""

    pad_fill = 0   # batch-buffer fill token (overridden by model adapters)

    def __init__(self, tokenizer, max_length=2048, batch_size=8):
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.batch_size = batch_size

    def tok_encode(self, s: str):
        return self.tokenizer.encode(s)

    @property
    def eot_token_id(self):
        tok = self.tokenizer
        for attr in ("eos_token_id", "eot_token_id"):
            v = getattr(tok, attr, None)
            if v is not None:
                return int(v)
        return 0

    def _logits_fn(self, inps: jax.Array, lengths: jax.Array) -> jax.Array:
        raise NotImplementedError

    def _loglikelihood_tokens(self, requests) -> List[Tuple[float, bool]]:
        order = sorted(range(len(requests)),
                       key=lambda i: -(len(requests[i][0]) + len(requests[i][1])))
        out: List = [None] * len(requests)
        for i0 in range(0, len(order), self.batch_size):
            chunk = order[i0:i0 + self.batch_size]
            seqs, conts = [], []
            for i in chunk:
                ctx, cont = requests[i]
                whole = (list(ctx) + list(cont))[-(self.max_length + 1):]
                cont = cont[-self.max_length:]
                seqs.append(whole[:-1])          # model input
                conts.append(cont)
            S = _bucket(max(len(s) for s in seqs))
            B = len(seqs)
            # fill with the pad token: the block adapter sets one attention
            # bit on the slot after each row's content (the "EOS slot"),
            # which must hold pad/EOS, not token 0
            inps = np.full((B, S), self.pad_fill, np.int32)
            lengths = np.zeros((B,), np.int32)
            for r, s in enumerate(seqs):
                inps[r, :len(s)] = s
                lengths[r] = len(s)
            logits = self._logits_fn(jnp.asarray(inps), jnp.asarray(lengths))
            logits = np.asarray(logits, np.float32)   # [B, S, V]
            logp = logits - _logsumexp(logits)
            for r, i in enumerate(chunk):
                cont = conts[r]
                n = len(cont)
                start = lengths[r] - n  # logits[t] predicts input token t+1;
                # cont tokens occupy input positions [len-n, len) of the FULL
                # sequence whole; whole[:-1] is the input so position of the
                # logit predicting cont[j] is (len(whole)-n-1+j) = lengths[r]-n+j
                span = logp[r, start:start + n]
                toks = np.asarray(cont)
                ll = float(span[np.arange(n), toks].sum())
                greedy = bool((span.argmax(-1) == toks).all())
                out[i] = (ll, greedy)
        return out


def _logsumexp(x):
    m = x.max(-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(-1, keepdims=True))


class _GenerateMixin:
    """generate_until for adapters that own block-transformer params.

    Requests are grouped into (context-length bucket, max_new) batches and
    generated together: shorter contexts left-pad with attention-0 pad
    blocks, which the block decoder masks out — one jitted two-level
    generation per batch instead of per request (the round-1 serial path
    was unusable for a real triviaqa run)."""

    def generate_until(self, requests):
        from block_transformer_tpu.inference import generate as gen
        out: List = [None] * len(requests)
        parsed = []
        for i, (context, kw) in enumerate(requests):
            until = kw.get("until") or []
            max_new = int(kw.get("max_gen_toks", 64))
            ctx = self.tok_encode(context)[-(self.max_length - max_new):]
            parsed.append((i, ctx, until, max_new))

        def bucket_key(p):
            return (_bucket(len(p[1]), step=self.cfg.block_length * 16,
                            lo=self.cfg.block_length * 4), p[3])

        parsed.sort(key=lambda p: (bucket_key(p), -len(p[1])))
        b = 0
        while b < len(parsed):
            key = bucket_key(parsed[b])
            chunk = [p for p in parsed[b:b + self.batch_size]
                     if bucket_key(p) == key]
            b += len(chunk)
            Tb, max_new = key
            ids = np.full((len(chunk), Tb), self.cfg.pad_token_id, np.int32)
            for r, (_, ctx, _, _) in enumerate(chunk):
                ids[r, Tb - len(ctx):] = ctx     # right-align; left pads
            att = np.zeros_like(ids)
            for r, (_, ctx, _, _) in enumerate(chunk):
                att[r, Tb - len(ctx):] = 1
            res = gen.generate(self.params, self.cfg, ids,
                               attention_mask=att,
                               max_length=Tb + max_new)
            for r, (i, ctx, until, _) in enumerate(chunk):
                new = res[r, Tb:].tolist()
                if self.eot_token_id in new:
                    new = new[:new.index(self.eot_token_id)]
                text = self.tokenizer.decode(new)
                for stop in until:
                    idx = text.find(stop)
                    if idx >= 0:
                        text = text[:idx]
                out[i] = text
        return out


class BlockTransformerLM(_GenerateMixin, _TokenizedLM):
    def __init__(self, params, cfg: BlockTransformerConfig, tokenizer,
                 max_length=2048, batch_size=8, nopad: bool = False):
        super().__init__(tokenizer, max_length, batch_size)
        self.params = params
        self.cfg = cfg
        self.pad_fill = cfg.pad_token_id
        self.nopad = nopad
        self._jit = functools.lru_cache(maxsize=None)(self._make_fn)

    def _make_fn(self, S: int):
        cfg = self.cfg
        L = cfg.block_length
        pad_id = cfg.pad_token_id
        left = 0 if self.nopad else (L - 1)

        @jax.jit
        def fn(params, inps, lengths):
            B = inps.shape[0]
            right = (-(S + left)) % L
            right = right if right else L  # always >=1 slot for the EOS bit
            total = S + left + right
            ids = jnp.full((B, total), pad_id, jnp.int32)
            ids = jax.lax.dynamic_update_slice(ids, inps, (0, left))
            pos = jnp.arange(total, dtype=jnp.int32)[None]
            att = ((pos >= left) & (pos < left + lengths[:, None])).astype(jnp.int32)
            # one attention bit on the EOS slot after each row's content
            att = att.at[jnp.arange(B), left + lengths].set(1)
            N = total // L
            ids_b = ids.reshape(B, N, L)
            att_b = att.reshape(B, N, L)
            bam = (att_b != 0).any(-1).astype(jnp.int32)
            out = bt.block_transformer_forward(params, cfg, ids_b, att_b, bam)
            flat = out.logits.reshape(B, (N - 1) * L, -1)
            if self.nopad:
                return flat[:, :S - (L - 1), :]
            return flat[:, :S, :]

        return fn

    def _logits_fn(self, inps, lengths):
        S = inps.shape[1]
        logits = self._jit(S)(self.params, inps, lengths)
        if self.nopad:
            # re-align: nopad logits start predicting from position L-1
            L = self.cfg.block_length
            pad = jnp.zeros((inps.shape[0], L - 1, logits.shape[-1]),
                            logits.dtype)
            logits = jnp.concatenate([pad, logits], axis=1)
        return logits


class VanillaLM(_TokenizedLM):
    def __init__(self, params, cfg: NeoXConfig, tokenizer, max_length=2048,
                 batch_size=8):
        super().__init__(tokenizer, max_length, batch_size)
        self.params = params
        self.cfg = cfg

        @jax.jit
        def fn(params, inps, lengths):
            att = (jnp.arange(inps.shape[1])[None] < lengths[:, None]).astype(jnp.int32)
            return vmod.vanilla_forward(params, cfg, inps, att)

        self._fn = fn

    def _logits_fn(self, inps, lengths):
        return self._fn(self.params, inps, lengths)
