"""Model-zoo smoke tests: build each registered handler, run a train step
and an eval forward on tiny tensors, assert output shapes.

This mirrors the reference's coverage unit
(automated_testing/sisr_tests/test_model_cpu_execute.py — registry ->
interface -> handler -> arch on a 16x16 input) but additionally checks a
full optimizer step and checkpoint round-trip.
"""

import numpy as np
import pytest

from rumpy_tpu.registry import available_models, get_model


def _batch(rng, n=2, size=16, channels=3, scale=2, meta=0):
    batch = {
        "lr": rng.random((n, size, size, channels), dtype=np.float32) if False
        else rng.random((n, size, size, channels)).astype(np.float32),
        "hr": rng.random((n, size * scale, size * scale, channels)).astype(np.float32),
    }
    if meta:
        batch["metadata"] = rng.random((n, meta)).astype(np.float32)
    return batch


def test_registry_lists_models():
    models = available_models()
    for name in ["srcnn", "vdsr", "edsr", "rcan"]:
        assert name in models, f"{name} missing from registry"


def test_srcnn_shape(rng):
    h = get_model("srcnn")(scale=2)
    state = h.init_state()
    # SRCNN takes pre-interpolated Y input => output same size as input.
    batch = {"lr": rng.random((1, 16, 16, 1)).astype(np.float32),
             "hr": rng.random((1, 16, 16, 1)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 1)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert int(state2.step) == 1


def test_vdsr_residual(rng):
    h = get_model("vdsr")(scale=2, kernel_pattern=[3] * 5,
                          channel_pattern=[1] + [16] * 4 + [1])
    state = h.init_state()
    batch = {"lr": rng.random((1, 16, 16, 1)).astype(np.float32),
             "hr": rng.random((1, 16, 16, 1)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 1)


@pytest.mark.parametrize("name,kwargs", [
    ("edsr", dict(num_features=16, num_blocks=2)),
    ("rcan", dict(n_feats=16, n_resgroups=2, n_resblocks=2)),
])
@pytest.mark.parametrize("scale", [2, 4])
def test_upscaling_models(rng, name, kwargs, scale):
    h = get_model(name)(scale=scale, **kwargs)
    state = h.init_state()
    batch = _batch(rng, n=2, size=8, scale=scale)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 8 * scale, 8 * scale, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_srmd_metadata_concat(rng):
    h = get_model("srmd")(scale=2, num_metadata=4, nc=16, nb=4)
    state = h.init_state()
    batch = _batch(rng, n=1, size=8, scale=2, meta=4)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)


def test_edsrmd_metadata_concat(rng):
    h = get_model("edsrmd")(scale=2, num_metadata=4, num_features=16,
                            num_blocks=2)
    state = h.init_state()
    batch = _batch(rng, n=1, size=8, scale=2, meta=4)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_checkpoint_roundtrip(rng, tmp_path):
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1)
    state = h.init_state()
    batch = _batch(rng, n=1, size=8, scale=2)
    state, _ = h.train_batch(state, batch)
    h.save_model(state, str(tmp_path), epoch=0)
    loaded, epoch = h.load_model(str(tmp_path), epoch=0)
    assert epoch == 0
    out1 = np.asarray(h.run_eval(state, batch))
    out2 = np.asarray(h.run_eval(loaded, batch))
    np.testing.assert_allclose(out1, out2, atol=1e-6)
    # best/last selection
    h.save_model(state, str(tmp_path), epoch=3)
    _, ep = h.load_model(str(tmp_path), epoch="last")
    assert ep == 3


def test_skip_optimizer_load_across_optimizer_configs(rng, tmp_path):
    """skip_optimizer_load must work even when the loading handler's
    optax tree differs from the one the checkpoint was saved under
    (e.g. probing a scheduler-trained net with a plain-Adam handler) —
    a typed restore of the mismatched optimizer would raise."""
    h_sched = get_model("edsr")(scale=2, num_features=8, num_blocks=1,
                                scheduler="multi_step_lr",
                                scheduler_params={"milestones": [5],
                                                  "gamma": 0.5})
    state = h_sched.init_state()
    batch = _batch(rng, n=1, size=8, scale=2)
    state, _ = h_sched.train_batch(state, batch)
    h_sched.save_model(state, str(tmp_path), epoch=0)

    h_plain = get_model("edsr")(scale=2, num_features=8, num_blocks=1)
    loaded, _ = h_plain.load_model(str(tmp_path), epoch=0,
                                   skip_optimizer_load=True)
    out1 = np.asarray(h_sched.run_eval(state, batch))
    out2 = np.asarray(h_plain.run_eval(loaded, batch))
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_grad_descent_reduces_loss(rng):
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1, lr=1e-3)
    state = h.init_state()
    batch = _batch(rng, n=2, size=8, scale=2)
    losses = []
    for _ in range(5):
        state, ld = h.train_batch(state, batch)
        losses.append(float(ld["train-loss"]))
    assert losses[-1] < losses[0]
