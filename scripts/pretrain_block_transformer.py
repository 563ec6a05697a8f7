"""Block-transformer pretraining entry — analogue of the reference's
pretrain_block_transformer.py: load a trainer YAML (reference schema or a
named config), build the dataset (Pile idxmaps or a synthetic corpus for
smoke runs), optionally initialize from a vanilla checkpoint (uptraining),
and run the Trainer.

Examples:
  python scripts/pretrain_block_transformer.py --config configs/block_main_b4_5.yaml \
      --pile /data/pythia_pile_idxmaps/pile_0.87_deduped_text_document
  python scripts/pretrain_block_transformer.py --model block_main_b4_5 \
      --synthetic 10000 --steps 50       # smoke run on random data
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _maybe_force_cpu():
    import os, sys
    if os.environ.get("BT_CPU") == "1" or "--cpu" in sys.argv:
        if "--cpu" in sys.argv:
            sys.argv.remove("--cpu")
        import jax
        jax.config.update("jax_platforms", "cpu")


_maybe_force_cpu()


def build_dataset(args, block_length: int, max_length: int, vocab: int,
                  yaml_dict=None):
    from block_transformer_tpu.data.packing import PackedDataset, TokenizedCorpus
    if args.pile:
        from block_transformer_tpu.data import dispatch
        corpus = dispatch.load_corpus(args.pile)
    elif yaml_dict is not None and yaml_dict.get("dataset") and \
            not args.synthetic:
        # config-driven dispatch (dataset: pythia_pile / t5_pile / hf name)
        from block_transformer_tpu.data import dispatch
        corpus = dispatch.load_corpus_from_yaml(yaml_dict)
    else:
        rng = np.random.default_rng(0)
        n = args.synthetic
        docs = [rng.integers(1, vocab - 50, size=rng.integers(32, 512))
                for _ in range(max(n // 200, 16))]
        lengths = np.array([len(d) for d in docs], np.int64)
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        corpus = TokenizedCorpus(np.concatenate(docs), lengths, starts)
    return PackedDataset(corpus, max_length, eos_token=0, pad_token=0,
                         block_length=block_length,
                         random_pad_first_block=not args.no_random_pad,
                         pad_to_block_boundary=True, seed=args.seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="reference-style YAML")
    ap.add_argument("--model", default=None, help="named config (block_main_*)")
    ap.add_argument("--pile", default=None,
                    help="Megatron .bin/.idx prefix (pythia pile idxmaps)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="use a synthetic corpus of ~N tokens")
    ap.add_argument("--steps", type=int, default=None, help="override stop_steps")
    ap.add_argument("--max_length", type=int, default=None)
    ap.add_argument("--batch_size", type=int, default=None,
                    help="override total_batch_size")
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--no_random_pad", action="store_true")
    ap.add_argument("--from_vanilla", default=None,
                    help="vanilla checkpoint dir for uptraining init")
    ap.add_argument("--uptrain_method", default="partition",
                    choices=["skip", "partition", "duplicate"])
    args = ap.parse_args()

    from block_transformer_tpu.config import get_config
    from block_transformer_tpu.train.trainer import Trainer, TrainerConfig

    yaml_dict = None
    if args.config:
        from block_transformer_tpu import config_yaml
        import yaml as _yaml
        with open(args.config) as f:
            yaml_dict = _yaml.safe_load(f)
        cfg = config_yaml.load_block_config_yaml(args.config)
        tkw = config_yaml.load_trainer_kwargs_yaml(args.config)
    elif args.model:
        cfg = get_config(args.model)
        tkw = {"output_dir": f"results/{args.model}"}
    else:
        ap.error("one of --config / --model is required")
    if args.steps:
        tkw["stop_steps"] = args.steps
        tkw["num_train_steps"] = max(args.steps,
                                     tkw.get("num_train_steps", args.steps))
    if args.output_dir:
        tkw["output_dir"] = args.output_dir
    if args.max_length:
        tkw["max_length"] = args.max_length
    if args.batch_size:
        tkw["total_batch_size"] = args.batch_size
        tkw.pop("micro_batch_size", None)
    tcfg = TrainerConfig(**tkw)

    ds = build_dataset(args, cfg.block_length, tcfg.max_length,
                       cfg.vocab_size, yaml_dict=yaml_dict)
    trainer = Trainer(cfg, tcfg, ds)

    if args.from_vanilla:
        import jax.numpy as jnp
        from block_transformer_tpu.config import get_vanilla_config
        from block_transformer_tpu.train import uptrain, train_step as ts
        from block_transformer_tpu.utils import torch_import
        van_cfg = get_vanilla_config(os.path.basename(args.from_vanilla))
        sd = torch_import._load_safetensors_dir(args.from_vanilla)
        vp = torch_import.neox_params_from_state_dict(sd, van_cfg)
        new_params = uptrain.load_block_from_vanilla(
            trainer.state.params, cfg, vp, van_cfg, method=args.uptrain_method)
        trainer.state = ts.TrainState(params=new_params,
                                      opt_state=trainer.tx.init(new_params),
                                      step=trainer.state.step)

    state = trainer.train(resume=args.resume)
    print(f"finished at step {int(state.step)}; "
          f"checkpoints in {tcfg.output_dir}")


if __name__ == "__main__":
    main()
