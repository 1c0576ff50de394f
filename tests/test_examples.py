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


def test_convergence_harness_config_declares_model(tmp_path):
    """Regression: write_config once built the [model] table and then
    dropped it on the floor — every 'convergence' run silently trained
    the CLI's former default architecture instead of the one the flag
    selected. Pin the model name (and the key internal switches) that
    each harness mode emits into config.toml."""
    import sys
    sys.path.insert(0, EXAMPLES)
    import convergence_run as cr
    from rumpy_tpu.config.loader import load_config

    hr = tmp_path / "hr"
    hr.mkdir()
    cases = [
        (dict(), "rcan", {}),
        (dict(bobw=True), "contrastiveblindqrcan",
         {"block_encoder_loading": True}),
        (dict(bobw=True, encoder="supmoco_fullchain_d256"),
         "contrastiveblindqrcan",
         {"pre_trained_encoder_weights": "supmoco_fullchain_d256"}),
        (dict(bobw=True, encoder="supmoco_fullchain_d256",
              finetune_encoder=True),
         "contrastiveblindqrcan", {"encoder_freeze_mode": "none"}),
        (dict(dan=True), "dan", {"mode": "v1"}),
        (dict(ikc=True), "ikc", {"correction_steps": 7}),
    ]
    for kwargs, expect_name, expect_internal in cases:
        path = cr.write_config(str(tmp_path), str(hr), epochs=2,
                               bobw=kwargs.pop("bobw", False),
                               milestones=[500], **kwargs)
        cfg = load_config(path).as_plain()
        mc = cfg.get("model") or {}
        assert mc.get("name") == expect_name, (expect_name, mc)
        internal = mc.get("internal_params") or {}
        for k, v in expect_internal.items():
            assert internal.get(k) == v, (expect_name, k, internal)
        assert internal.get("scheduler") == "multi_step_lr"


def test_convergence_harness_aug_flag(tmp_path):
    """--aug must switch on flip/rot ([data] augmentations) and the
    SimCLR colour jitter on the training set table — and stay OFF by
    default so the ablation arms remain protocol-identical."""
    import sys
    sys.path.insert(0, EXAMPLES)
    import convergence_run as cr
    from rumpy_tpu.config.loader import load_config

    hr = tmp_path / "hr"
    hr.mkdir(exist_ok=True)
    plain = load_config(cr.write_config(
        str(tmp_path), str(hr), epochs=2, bobw=False)).as_plain()
    assert not plain["data"].get("augmentations")
    assert "use_random_colour_distort" not in (
        plain["data"]["training_sets"]["data_1"])
    cfg = load_config(cr.write_config(
        str(tmp_path), str(hr), epochs=2, bobw=False,
        aug=True, aug_strength=0.5)).as_plain()
    assert cfg["data"]["augmentations"] is True
    ds = cfg["data"]["training_sets"]["data_1"]
    assert ds["use_random_colour_distort"] is True
    assert ds["colour_distortion_strength"] == 0.5


def test_encoder_probe_grid_and_pinned_degradation():
    """The discrete-grid encoder probe (examples/encoder_probe.py) must
    produce one class per (blur, noise, JPEG) cell and pin the
    degradation parameters exactly (no random ranges)."""
    import sys

    import numpy as np
    sys.path.insert(0, EXAMPLES)
    import encoder_probe as ep

    cells = ep.grid_cells()
    assert len(cells) == (len(ep.BLUR_SIGMAS) * len(ep.NOISE_SIGMAS)
                          * len(ep.JPEG_QUALITIES))
    assert len(set(cells)) == len(cells)

    files = sorted(os.path.join(ep.EVAL_HR, f)
                   for f in os.listdir(ep.EVAL_HR) if f.endswith(".png"))
    out = ep.degrade_cell(files[:1], sigma=2.2, noise=25.0, quality=30,
                          seed=7, multiples=2)
    assert len(out) == 2
    for im in out:
        assert im.dtype == np.float32 and im.min() >= 0 and im.max() <= 1
    # two draws of a fully-pinned cell differ only by the noise draw —
    # blur kernel and JPEG are deterministic, so images stay close
    assert np.abs(out[0] - out[1]).mean() < 0.1

    rng = np.random.default_rng(0)
    cs = list(ep.crops(out[0], 48, 3, rng))
    assert len(cs) == 3 and all(c.shape == (48, 48, 3) for c in cs)


def test_interface_requires_model_name(tmp_path):
    """A train-mode interface with no model name anywhere must fail
    loudly, never fall back to a default architecture."""
    import pytest

    from rumpy_tpu.interface import SISRInterface
    with pytest.raises(ValueError, match="no model name"):
        SISRInterface(model_loc=str(tmp_path), experiment="nn",
                      mode="train", scale=4, new_params={})
