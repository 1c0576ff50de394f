"""SAN, DASR, DCLS tests."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model


def test_san(rng):
    h = get_model("san")(scale=2, n_feats=16, n_resgroups=1, n_resblocks=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "hr": rng.random((1, 16, 16, 3)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_san_chopped_eval(rng):
    h = get_model("san")(scale=2, n_feats=8, n_resgroups=1, n_resblocks=1,
                         max_combined_im_size=100)
    state = h.init_state()
    batch = {"lr": rng.random((1, 24, 24, 3)).astype(np.float32)}
    sr = h.run_eval(state, batch)  # 576 px > 100 => chopped path
    assert sr.shape == (1, 48, 48, 3)
    h2 = get_model("san")(scale=2, n_feats=8, n_resgroups=1, n_resblocks=1,
                          max_combined_im_size=10000)
    state2 = state
    sr_direct = h2.run_eval(state2, batch)
    # chopped and direct outputs agree away from tile seams
    diff = np.abs(np.asarray(sr) - np.asarray(sr_direct))
    assert np.median(diff) < 0.05


def test_qsan(rng):
    h = get_model("qsan")(scale=2, metadata=["qpi"], n_feats=16,
                          n_resgroups=1, n_resblocks=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "metadata": rng.random((1, 1)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)


def test_dasr_phases(rng):
    h = get_model("dasr")(scale=2, n_groups=1, n_blocks=1, n_feats=16,
                          contrastive_K=8, lr=1e-3)
    state = h.init_state()
    batch = {"image_query": rng.random((2, 16, 16, 3)).astype(np.float32),
             "image_key": rng.random((2, 16, 16, 3)).astype(np.float32),
             "hr": rng.random((2, 32, 32, 3)).astype(np.float32)}
    # encoder pretrain phase: contrastive only
    h.encoder_pretrain_epochs = 1
    h.set_epoch(0)
    state, losses = h.train_batch(state, batch)
    assert "pixel-loss" not in losses
    # joint phase
    h.set_epoch(1)
    state, losses = h.train_batch(state, batch)
    assert "pixel-loss" in losses
    assert np.isfinite(float(losses["train-loss"]))
    # eval path
    sr = h.run_eval(state, {"lr": rng.random((1, 8, 8, 3)
                                             ).astype(np.float32)})
    assert sr.shape == (1, 16, 16, 3)


def test_dcls_kernel_estimation(rng):
    h = get_model("dcls")(kernel_size=9, nf=16, lr=1e-3)
    state = h.init_state()
    batch = {"lr": rng.random((2, 16, 16, 3)).astype(np.float32),
             "metadata": rng.random((2, 81)).astype(np.float32)}
    k = h.run_eval(state, batch)
    assert k.shape == (2, 9, 9)
    np.testing.assert_allclose(np.asarray(k).sum((1, 2)), 1.0, atol=1e-5)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
