"""The shipped example configs must parse and build their pipelines/
models (executable documentation)."""

import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def test_example_configs_parse():
    from rumpy_tpu.config.loader import load_config
    for name in os.listdir(EXAMPLES):
        if not name.endswith(".toml"):
            continue  # runnable example scripts live here too
        cfg = load_config(os.path.join(EXAMPLES, name))
        assert cfg is not None, name


def test_degradation_example_builds():
    from rumpy_tpu.config.loader import load_config
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    cfg = load_config(os.path.join(EXAMPLES,
                                   "degradation_pipeline.toml")).as_plain()
    pipe = ImagePipeline(cfg["pipeline"], deg_configs=cfg["deg_configs"])
    assert pipe.supports_fused()


@pytest.mark.parametrize("name,model", [
    ("train_rcan_blind_x4.toml", "rcan"),
    ("train_qrcan_meta_attention.toml", "qrcan"),
    ("train_supmoco_predictor.toml", "supmoco"),
    ("train_bobw_rcan_supmoco.toml", "contrastiveblindqrcan"),
    ("train_dan_qrcan_blind.toml", "dan"),
])
def test_training_example_models_build(name, model):
    from rumpy_tpu.config.loader import load_config
    from rumpy_tpu.registry import get_model
    cfg = load_config(os.path.join(EXAMPLES, name))
    mc = cfg["model"]
    assert mc["name"] == model
    params = dict(mc["internal_params"])
    # shrink for test speed
    for k, v in (("n_feats", 8), ("n_resgroups", 1), ("n_resblocks", 1),
                 ("dim", 16), ("K", 32)):
        if k in params:
            params[k] = v
    h = get_model(mc["name"])(**params)
    assert h is not None
    # the online-degradation spec must build a fused pipeline
    deg = cfg["data"].get("online_degradations")
    if deg:
        from rumpy_tpu.degradations.pipeline import ImagePipeline
        pipe = ImagePipeline(deg["pipeline"],
                             deg_configs=deg.get("deg_configs"))
        assert pipe.supports_fused()
