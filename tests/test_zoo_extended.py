"""Extended zoo smoke tests: HAN, ELAN, QHAN, QELAN, DAN."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model


def _batch(rng, n=1, size=8, scale=2, meta=0):
    b = {"lr": rng.random((n, size, size, 3)).astype(np.float32),
         "hr": rng.random((n, size * scale, size * scale, 3)
                          ).astype(np.float32)}
    if meta:
        b["metadata"] = rng.random((n, meta)).astype(np.float32)
    return b


def test_han(rng):
    h = get_model("han")(scale=2, n_feats=16, n_resgroups=2, n_resblocks=1)
    state = h.init_state()
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_elan(rng):
    h = get_model("elan")(scale=2, m_elan=2, c_elan=30,
                          window_sizes=(2, 4, 4))
    state = h.init_state()
    batch = _batch(rng, size=8)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_elan_nonmultiple_size(rng):
    # check_image_size reflect-pads to the window lcm and crops back
    h = get_model("elan")(scale=2, m_elan=2, c_elan=30,
                          window_sizes=(2, 4, 4))
    state = h.init_state()
    batch = {"lr": rng.random((1, 10, 14, 3)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 20, 28, 3)


def test_qhan(rng):
    h = get_model("qhan")(scale=2, metadata=["qpi"], n_feats=16,
                          n_resgroups=2, n_resblocks=1,
                          include_q_layer=True)
    state = h.init_state()
    batch = _batch(rng, meta=1)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_qelan(rng):
    h = get_model("qelan")(scale=2, metadata=["qpi"], m_elan=4, c_elan=30,
                           window_sizes=(2, 4, 4))
    state = h.init_state()
    batch = _batch(rng, meta=1)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_dan(rng):
    h = get_model("dan")(scale=2, nf=16, nb=2, loop=2, input_para=4,
                         kernel_size=9)
    state = h.init_state()
    batch = _batch(rng, n=2, meta=4)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert "image-loss-iter-0" in losses and "kernel-loss-iter-1" in losses


def test_danv2(rng):
    h = get_model("dan")(scale=2, mode="v2", nf=16, nb=1, ng=2, loop=2,
                         input_para=4, kernel_size=9)
    state = h.init_state()
    batch = _batch(rng, n=2, meta=4)
    batch["blur_kernels"] = rng.random((2, 9, 9)).astype(np.float32)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert "kernel-loss-iter-1" in losses


def test_danv2_residual_forms(rng):
    h = get_model("dan")(scale=2, mode="v2", nf=16, nb=1, ng=1, loop=2,
                         input_para=4, kernel_size=9,
                         residual_kernel=True, residual_sr=True)
    state = h.init_state()
    batch = _batch(rng, n=1, meta=4)
    batch["blur_kernels"] = rng.random((1, 81)).astype(np.float32)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_dan_qrcan_conjugation(rng):
    h = get_model("dan")(scale=2, mode="v1QRCAN", loop=2, input_para=4,
                         kernel_size=9,
                         generator_params=dict(n_feats=16, n_resgroups=1,
                                               n_resblocks=1))
    state = h.init_state()
    batch = _batch(rng, n=1, meta=4)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
