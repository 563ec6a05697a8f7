"""Reference-YAML schema coverage: every shipped config loads, and the
vanilla_*.yaml files (reference conf/trainer/vanilla_*.yaml) describe the
same models as the named registry (config.py _VANILLA)."""

import glob
import os

import pytest
import yaml

from block_transformer_tpu.config import get_vanilla_config
from block_transformer_tpu.config_yaml import (load_block_config_yaml,
                                               load_trainer_kwargs_yaml,
                                               load_vanilla_config_yaml)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_YAMLS = sorted(glob.glob(os.path.join(ROOT, "configs", "*.yaml")))
VANILLA = [p for p in ALL_YAMLS if os.path.basename(p).startswith("vanilla_")]
BLOCK = [p for p in ALL_YAMLS if p not in VANILLA]


def test_config_dir_matches_reference_count():
    # reference conf/trainer has 26 files: 22 block-family + 4 vanilla
    assert len(ALL_YAMLS) == 26, [os.path.basename(p) for p in ALL_YAMLS]
    assert len(VANILLA) == 4


@pytest.mark.parametrize("path", BLOCK, ids=os.path.basename)
def test_block_yaml_loads(path):
    cfg = load_block_config_yaml(path)
    assert cfg.block_length >= 1
    kw = load_trainer_kwargs_yaml(path)
    assert kw["total_batch_size"] > 0


@pytest.mark.parametrize("path", VANILLA, ids=os.path.basename)
def test_vanilla_yaml_matches_registry(path):
    name = os.path.basename(path)[:-len(".yaml")]
    y = load_vanilla_config_yaml(path)
    r = get_vanilla_config(name)
    assert (y.hidden_size, y.num_layers, y.num_heads) == \
        (r.hidden_size, r.num_layers, r.num_heads), name
    assert y.intermediate_size == r.intermediate_size


def test_vanilla_31_is_eight_heads():
    # conf/trainer/vanilla_31.yaml sets num_attention_heads: 8 explicitly
    # (applied via setattr in model/utils.py:73-81); head_dim must be 32
    cfg = get_vanilla_config("vanilla_31")
    assert cfg.num_heads == 8 and cfg.head_dim == 32


def test_vanilla_yaml_trainer_kwargs():
    kw = load_trainer_kwargs_yaml(os.path.join(ROOT, "configs",
                                               "vanilla_160.yaml"))
    assert kw["learning_rate"] == pytest.approx(6e-4)
    assert kw["total_batch_size"] == 256


def test_vanilla_yaml_lr_values():
    # reference: 31/70 at 1e-3, 160 at 6e-4, 410 at 3e-4
    lrs = {}
    for p in VANILLA:
        with open(p) as f:
            lrs[os.path.basename(p)[:-5]] = float(
                yaml.safe_load(f)["learning_rate"])
    assert lrs == {"vanilla_31": 1e-3, "vanilla_70": 1e-3,
                   "vanilla_160": 6e-4, "vanilla_410": 3e-4}
