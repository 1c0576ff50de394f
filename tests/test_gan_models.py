"""GAN family tests: RRDB generator, discriminators, phased training."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model

SMALL = dict(nf=16, nb=2, gc=8)


def _batch(rng, n=2, size=8, scale=4):
    return {"lr": rng.random((n, size, size, 3)).astype(np.float32),
            "hr": rng.random((n, size * scale, size * scale, 3)
                             ).astype(np.float32)}


def test_rrdbnet_shapes(rng):
    h = get_model("esrgan")(scale=4, pretrain_epochs=0, **SMALL)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 32, 32, 3)


def test_rrdbnet_x2_pixel_unshuffle(rng):
    h = get_model("realesrgan")(scale=2, pretrain_epochs=0, **SMALL)
    state = h.init_state()
    batch = {"lr": rng.random((1, 16, 16, 3)).astype(np.float32),
             "hr": rng.random((1, 32, 32, 3)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 32, 32, 3)


def test_pretrain_phase_no_gan_loss(rng):
    h = get_model("esrgan")(scale=4, pretrain_epochs=2, **SMALL)
    h.set_epoch(0)
    state = h.init_state()
    batch = _batch(rng)
    state, losses = h.train_batch(state, batch)
    assert float(losses["gan-loss"]) == 0.0
    assert float(losses["d-loss-real"]) == 0.0
    assert np.isfinite(float(losses["train-loss"]))


def test_gan_phase_updates_both_networks(rng):
    import jax
    h = get_model("esrgan")(scale=4, pretrain_epochs=0, lr=1e-3, **SMALL)
    h.set_epoch(0)
    state = h.init_state()
    batch = _batch(rng, size=32)  # 128x128 HR for the VGG-128 discriminator
    # copy to host before the step: donation deletes the input buffers
    d_before = [np.asarray(x).copy() for x in
                jax.tree_util.tree_leaves(state.params["discriminator"])]
    g_before = [np.asarray(x).copy() for x in
                jax.tree_util.tree_leaves(state.params["generator"])]
    state, losses = h.train_batch(state, batch)
    for k in ("train-loss", "l1-loss", "gan-loss", "d-loss-real",
              "d-loss-fake"):
        assert np.isfinite(float(losses[k])), k
    d_after = jax.tree_util.tree_leaves(state.params["discriminator"])
    g_after = jax.tree_util.tree_leaves(state.params["generator"])
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(d_before, d_after))
    assert any(not np.allclose(np.asarray(a), np.asarray(b))
               for a, b in zip(g_before, g_after))


def test_realesrgan_unet_discriminator(rng):
    h = get_model("realesrgan")(scale=4, pretrain_epochs=0, lr=1e-3, **SMALL)
    h.set_epoch(0)
    state = h.init_state()
    state, losses = h.train_batch(state, _batch(rng, size=16))
    assert np.isfinite(float(losses["train-loss"]))


def test_qrealesrgan_metadata(rng):
    h = get_model("qrealesrgan")(scale=4, pretrain_epochs=0, lr=1e-3,
                                 metadata=["sigma_x", "qpi"], **SMALL)
    h.set_epoch(0)
    state = h.init_state()
    batch = _batch(rng, size=16)
    batch["metadata"] = rng.random((2, 2)).astype(np.float32)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 64, 64, 3)
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_gan_checkpoint_roundtrip(rng, tmp_path):
    h = get_model("realesrgan")(scale=4, pretrain_epochs=0, **SMALL)
    h.set_epoch(0)
    state = h.init_state()
    state, _ = h.train_batch(state, _batch(rng, size=16))
    h.save_model(state, str(tmp_path), epoch=0)
    loaded, _ = h.load_model(str(tmp_path), epoch=0)
    batch = _batch(rng, size=16)
    np.testing.assert_allclose(np.asarray(h.run_eval(state, batch)),
                               np.asarray(h.run_eval(loaded, batch)),
                               atol=1e-6)
