"""Metabed testbed + meta-layer variant tests
(reference: attention_manipulators/mini_model.py, q_layer.py:55-233,
dgfmb_layer.py)."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model


def _batch(rng, n=2, size=8, scale=2, meta=3):
    return {"lr": rng.random((n, size, size, 3)).astype(np.float32),
            "hr": rng.random((n, size * scale, size * scale, 3)
                             ).astype(np.float32),
            "metadata": rng.random((n, meta)).astype(np.float32)}


MB_KW = dict(scale=2, num_blocks=2, num_features=16,
             metadata_bypass_len=3)


@pytest.mark.parametrize("meta_block", [
    None, "q-layer", "res-pipe-q-layer", "res-pipe-split-q-layer",
    "SFT", "da-layer", "dgfmb-layer"])
def test_metabed_meta_block_types(rng, meta_block):
    h = get_model("metabed")(meta_block=meta_block, **MB_KW)
    state = h.init_state()
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_metabed_selective_blocks(rng):
    h = get_model("metabed")(meta_block="q-layer",
                             selective_meta_blocks=[True, False], **MB_KW)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng, n=1))
    assert sr.shape == (1, 16, 16, 3)


def test_metabed_autoencoder_phases(rng):
    h = get_model("metabed")(meta_block="q-layer", use_encoder=True,
                             num_bottleneck_nodes=4,
                             encoder_pretrain_epochs=2,
                             encoder_loss_scaling=5.0, **MB_KW)
    state = h.init_state()
    batch = _batch(rng)
    h.set_epoch(0)  # pretrain phase: AE loss active
    state, losses = h.train_batch(state, batch)
    assert float(losses["scaled-l1-loss-ae"]) > 0.0
    assert np.isclose(float(losses["train-loss"]),
                      float(losses["l1-loss"])
                      + float(losses["scaled-l1-loss-ae"]), atol=1e-5)
    h.set_epoch(3)  # post-pretrain: AE loss weight drops to zero
    state, losses = h.train_batch(state, batch)
    assert float(losses["scaled-l1-loss-ae"]) == 0.0


def test_metabed_esrgan_phases(rng):
    h = get_model("metabedesrgan")(meta_block="q-layer",
                                   pretrain_epochs=1,
                                   discriminator="unet", **MB_KW)
    state = h.init_state()
    batch = _batch(rng)
    h.set_epoch(0)  # L1 pretrain
    state, losses = h.train_batch(state, batch)
    assert float(losses["gan-loss"]) == 0.0
    h.set_epoch(1)  # adversarial phase
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["d-loss-real"]))
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)


def test_res_pipes_layers_shapes(rng):
    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.attention_manipulators import (
        DGFMBLayer, ResPipesCALayer, ResPipesSplitCALayer)
    x = jnp.asarray(rng.random((2, 4, 4, 16)), jnp.float32)
    meta = jnp.asarray(rng.random((2, 3)), jnp.float32)
    for layer in (ResPipesCALayer(16, 3),
                  ResPipesCALayer(16, 3, combine_pipes="add"),
                  ResPipesSplitCALayer(16, 3),
                  DGFMBLayer(num_channels=16, degradation_full_dim=3,
                             degradation_reduced_dim=2)):
        params = layer.init(jax.random.PRNGKey(0), x, meta)
        y = layer.apply(params, x, meta)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))
