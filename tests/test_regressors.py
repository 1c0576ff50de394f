"""Standard degradation-regressor family + MANet smoke/behavior tests
(reference: regression/models/standard_classifier_models, manet/)."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model


def _batch(rng, n=2, size=32, targets=4, ch=3):
    return {"lr": rng.random((n, size, size, ch)).astype(np.float32),
            "metadata": rng.random((n, targets)).astype(np.float32)}


def test_basicnn(rng):
    h = get_model("basicnn")(output_size=4)
    state = h.init_state()
    batch = _batch(rng)
    out = h.run_eval(state, batch)
    assert out.shape == (2, 4)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_resnet18_batchnorm_updates(rng):
    h = get_model("resnet")(model_type="resnet18", output_size=4)
    state = h.init_state()
    batch = _batch(rng)
    out = h.run_eval(state, batch)
    assert out.shape == (2, 4)
    # snapshot stats before the (buffer-donating) train step
    import jax
    before = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(state.extra["bstats"])]
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    # running batch stats must move with training
    after = jax.tree_util.tree_leaves(state2.extra["bstats"])
    assert any(not np.allclose(b, np.asarray(a))
               for b, a in zip(before, after))


def test_resnet_selective_softmax(rng):
    h = get_model("resnet")(model_type="resnet18", output_size=8,
                            add_softmax=True)
    h.module = h.build_module()
    # softmax_range defaults (0,441) > output; rebuild with tight range
    from rumpy_tpu.models.regressors import selective_softmax
    import jax.numpy as jnp
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    y = selective_softmax(x, (0, 5))
    assert np.allclose(np.asarray(y[:, :5]).sum(axis=1), 1.0, atol=1e-5)
    assert np.allclose(np.asarray(y[:, 5:]), np.asarray(x[:, 5:]))


def test_densenet_tiny(rng):
    h = get_model("densenet")(output_size=3, block_config=(2, 2),
                              growth_rate=8, init_features=8)
    state = h.init_state()
    batch = _batch(rng, targets=3)
    out = h.run_eval(state, batch)
    assert out.shape == (2, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_efficientnet_tiny(rng):
    h = get_model("efficientnet")(output_size=3, width_mult=0.3,
                                  depth_mult=0.3)
    state = h.init_state()
    batch = _batch(rng, targets=3)
    out = h.run_eval(state, batch)
    assert out.shape == (2, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_normalization_roundtrip(rng):
    h = get_model("basicnn")(
        output_size=4, normalization_scheme="zero_mean",
        normalization_params={"mean": 2.0, "std": 4.0})
    state = h.init_state()
    batch = _batch(rng)
    out = h.run_eval(state, batch)  # un-normalized on the way out
    assert out.shape == (2, 4)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    with pytest.raises(RuntimeError):
        get_model("basicnn")(normalization_scheme="zero_mean")


def test_occupancy_loss_semantics():
    import jax.numpy as jnp
    from rumpy_tpu.models.regressors import indicator_occupancy_loss
    pred = jnp.asarray([[0.5, 0.0, 0.3]])
    gt = jnp.asarray([[0.5, 0.2, 0.0]])
    # disagreement at positions 1 and 2
    assert float(indicator_occupancy_loss(pred, gt)) == 2.0


def test_occupancy_loss_in_training(rng):
    h = get_model("basicnn")(output_size=4, occupancy_loss=True,
                             occ_weight=0.5)
    state = h.init_state()
    _, losses = h.train_batch(state, _batch(rng))
    assert "occ-loss" in losses and "l1-loss" in losses


def test_centercrop_eval(rng):
    h = get_model("basicnn")(output_size=4, crop_size=16,
                             centercrop_patch_eval=True)
    state = h.init_state()
    batch = _batch(rng, size=48)
    out = h.run_eval(state, batch)
    assert out.shape == (2, 4)


def test_multipatch_eval(rng):
    h = get_model("resnet")(output_size=4, input_patch_num=2,
                            crop_size=16, centercrop_patch_eval=False)
    state = h.init_state()
    batch = _batch(rng, n=1, size=48)
    out = h.run_eval(state, batch)
    assert out.shape == (1, 4)


def test_manet_kernel_map(rng):
    h = get_model("manet")(kernel_size=5, sr_scale=2, nc=(8, 16), nb=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 12, 12, 3)).astype(np.float32),
             "metadata": rng.random((1, 25)).astype(np.float32)}
    out = h.run_eval(state, batch)
    assert out.shape == (1, 24, 24, 25)
    # softmax over kernel channels
    assert np.allclose(np.asarray(out).sum(axis=-1), 1.0, atol=1e-4)


def test_manet_invariant_kernel_training(rng):
    h = get_model("manet")(kernel_size=5, sr_scale=2, nc=(8, 16), nb=1,
                           invariant_kernel=True)
    state = h.init_state()
    batch = {"lr": rng.random((2, 8, 8, 3)).astype(np.float32),
             "metadata": rng.random((2, 25)).astype(np.float32)}
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_manet_nondivisible_input_padding(rng):
    h = get_model("manet")(kernel_size=5, sr_scale=2, nc=(8, 16), nb=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 11, 13, 3)).astype(np.float32)}
    out = h.run_eval(state, batch)
    assert out.shape == (1, 22, 26, 25)
