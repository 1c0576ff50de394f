import os

from rumpy_tpu.config import (NoneDict, dump_toml, load_config,
                              merge_overrides, to_none_dict)
from rumpy_tpu.config.loader import config_diff


def test_none_dict_missing_keys_read_none():
    cfg = to_none_dict({"model": {"name": "rcan"}})
    assert cfg["model"]["name"] == "rcan"
    assert cfg["model"]["scale"] is None
    assert cfg["training"] is None
    assert cfg.model.name == "rcan"


def test_toml_roundtrip(tmp_path):
    cfg = to_none_dict({
        "experiment": "exp1",
        "data": {"task_type": "sisr", "scale": 4,
                 "training_sets": {"data_1": {"lr": "a", "hr": "b"}}},
        "model": {"name": "rcan", "internal_params": {"n_feats": 64}},
        "training": {"num_epochs": 2, "lr": 1e-4, "flags": [1, 2, 3]},
    })
    path = os.path.join(tmp_path, "cfg.toml")
    dump_toml(cfg, path)
    loaded = load_config(path)
    assert loaded.as_plain() == cfg.as_plain()


def test_merge_overrides_none_ignored():
    cfg = to_none_dict({"model": {"name": "rcan"}, "training": {"lr": 1e-4}})
    merged = merge_overrides(cfg, {"training": {"lr": 2e-4}, "seed": None})
    assert merged["training"]["lr"] == 2e-4
    assert "seed" not in merged
    assert cfg["training"]["lr"] == 1e-4  # original untouched


def test_config_diff():
    a = {"model": {"name": "rcan", "scale": 4}}
    b = {"model": {"name": "rcan", "scale": 2}, "training": {"lr": 1}}
    d = config_diff(a, b)
    assert d["model.scale"] == {"old": 4, "new": 2}
    assert "training.lr" in d and "model.name" not in d
