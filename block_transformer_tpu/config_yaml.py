"""Reference-YAML compatibility: load conf/trainer-style YAML files into
our dataclass configs.

Accepts the reference schema (conf/trainer/block_main_*.yaml,
vanilla_*.yaml) including the autofill rules of util/config.py:86-105
(head-dim heuristic, intermediate=4h) and the lookup-embedder hidden-size
derivation (model/embedder/lookup.py:44-53), so the shipped YAMLs describe
the same models here. Extra training keys map onto TrainerConfig.
"""

from __future__ import annotations

from typing import Optional, Tuple

import yaml

from block_transformer_tpu.config import (BlockTransformerConfig,
                                          EmbedderConfig, NeoXConfig,
                                          TokenDecoderConfig)


def _neox_from_yaml(d: dict, max_length: int, vocab_size: int) -> NeoXConfig:
    c = d.get("config", {}) or {}
    return NeoXConfig.from_hidden_layers(
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        vocab_size=c.get("vocab_size", vocab_size),
        max_position_embeddings=c.get("max_position_embeddings", max_length),
        num_heads=c.get("num_attention_heads"),
        intermediate_size=c.get("intermediate_size"),
        attn_impl="pallas" if d.get("attn_implementation") ==
        "flash_attention_2" else "xla",
    )


def load_block_config_yaml(path: str) -> BlockTransformerConfig:
    with open(path) as f:
        y = yaml.safe_load(f)
    bs = y.get("block_split") or {}
    if bs.get("distribution") == "uniform":
        kw = bs.get("distribution_kwargs") or {}
        mean = kw.get("mean", 4)
        radius = kw.get("radius", mean - 1)
        # variable blocks pad to the distribution max
        block_length = mean + radius
    else:
        block_length = y.get("block_length") or \
            bs["distribution_kwargs"]["length"]
    max_length = y.get("max_length", 2048)
    e = y["embedder"]
    vocab = (e.get("config", {}) or {}).get("vocab_size", 50304)

    bd = _neox_from_yaml(y["block_decoder"], max_length, vocab)
    tdc = y["token_decoder"]
    td_cls = tdc.get("cls", "gpt-neo-x")
    if td_cls == "t5":
        # T5 decoder shape comes from the t5 config keys (d_model/num_layers)
        tc = tdc.get("config", {}) or {}
        td_neox = NeoXConfig.from_hidden_layers(
            hidden_size=tc.get("d_model", bd.hidden_size),
            num_layers=tc.get("num_decoder_layers", tc.get("num_layers", 6)),
            vocab_size=vocab, max_position_embeddings=max_length,
            intermediate_size=tc.get("d_ff"))
    else:
        td_neox = _neox_from_yaml(tdc, max_length, vocab)
    td = TokenDecoderConfig(
        neox=td_neox,
        decoding_strategy=tdc.get("decoding_strategy", "prefix"),
        expansion_method=tdc.get("expansion_method"),
        expansion_ratio=tdc.get("expansion_ratio"),
        cls=td_cls if td_cls in ("gpt-neo-x", "t5") else "gpt-neo",
    )
    n_emb = e.get("n_embedding_tokens", 1)
    ph = bd.hidden_size
    e_cls = e.get("cls", "lookup")
    e_cfg = e.get("config", {}) or {}
    n_cls = e.get("n_cls_tokens") or 0
    # concat source length: CLS tokens for roberta_cls, block tokens else
    per = ((n_cls if e_cls == "roberta_cls" else block_length) // n_emb)
    emb = EmbedderConfig(
        cls=e_cls,
        vocab_size=vocab,
        hidden_size=e_cfg.get("hidden_size", ph // per),
        n_embedding_tokens=n_emb,
        # reference defaults a null projection_method to concat
        # (model/embedder/base.py:25-27)
        projection_method=e.get("projection_method") or "concat",
        projection_hidden_size=ph,
        encoder_layers=e_cfg.get("num_hidden_layers",
                                 e_cfg.get("num_layers", 2)),
        n_cls_tokens=n_cls,
    )
    return BlockTransformerConfig(
        block_length=block_length, embedder=emb, block_decoder=bd,
        token_decoder=td,
        block_decoder_cls=("gpt-neo" if y["block_decoder"].get("cls")
                           == "gpt-neo" else "gpt-neo-x"),
        block_decoder_window=(y["block_decoder"].get("config", {}) or {}
                              ).get("window_size", 256),
        use_token_decoding_loss=y.get("token_decoding_loss", {}).get("enable", True),
        use_block_decoding_loss=y.get("block_decoding_loss", {}).get("enable", False),
        block_decoding_loss_weight=y.get("block_decoding_loss", {}).get("weight", 1.0),
        use_auto_encoding_loss=y.get("auto_encoding_loss", {}).get("enable", False),
        auto_encoding_loss_weight=y.get("auto_encoding_loss", {}).get("weight", 1.0),
        name=y.get("name", "block"),
    )


def load_vanilla_config_yaml(path: str) -> NeoXConfig:
    """Vanilla-baseline YAML (conf/trainer/vanilla_*.yaml schema:
    ``model: gpt-neo-x`` + ``model_config`` overrides applied over the
    autofill rules, the way model/utils.py:58-84 setattr's them onto the
    base HF config) -> NeoXConfig."""
    with open(path) as f:
        y = yaml.safe_load(f)
    assert y.get("model", "gpt-neo-x") == "gpt-neo-x", y.get("model")
    c = y.get("model_config", {}) or {}
    return NeoXConfig.from_hidden_layers(
        hidden_size=c["hidden_size"],
        num_layers=c["num_hidden_layers"],
        vocab_size=c.get("vocab_size", 50304),
        max_position_embeddings=c.get("max_position_embeddings",
                                      y.get("max_length", 2048)),
        num_heads=c.get("num_attention_heads"),
        intermediate_size=c.get("intermediate_size"),
        attn_impl="pallas" if y.get("attn_implementation") ==
        "flash_attention_2" else "xla",
    )


def load_trainer_kwargs_yaml(path: str) -> dict:
    """Training hyperparameters from the same YAML -> TrainerConfig kwargs."""
    with open(path) as f:
        y = yaml.safe_load(f)
    out = {
        "learning_rate": float(y.get("learning_rate", 1e-3)),
        "adam_beta1": float(y.get("adam_beta1", 0.9)),
        "adam_beta2": float(y.get("adam_beta2", 0.95)),
        "weight_decay": float(y.get("weight_decay", 0.1)),
        "num_train_steps": int(y.get("num_train_steps", 1000)),
        "stop_steps": y.get("stop_steps"),
        "num_warmup_steps": int(y.get("num_warmup_steps", 100)),
        "total_batch_size": int(y.get("total_batch_size", 8)),
        "micro_batch_size": y.get("per_device_train_batch_size"),
        "batch_size_rampup_steps": y.get("batch_size_rampup_steps"),
        "max_length": int(y.get("max_length", 2048)),
        "save_steps": int(y.get("save_steps", 1000)),
        "logging_steps": int(y.get("logging_steps", 100)),
        "param_dtype": {"bf16": "bfloat16", "fp32": "float32"}.get(
            y.get("precision", "bf16"), "bfloat16"),
    }
    bs = y.get("block_split") or {}
    if bs.get("distribution") not in (None, "fixed"):
        out["block_split_distribution"] = bs["distribution"]
        out["block_split_kwargs"] = dict(bs.get("distribution_kwargs") or {})
    if y.get("output_dir"):
        out["output_dir"] = y["output_dir"]
    elif y.get("name"):
        out["output_dir"] = f"results/{y['name']}"
    return out
