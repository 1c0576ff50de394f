"""Contrastive predictor tests: encoder smoke, MoCo family training steps,
queue mechanics, class labelling decision tree."""

import numpy as np
import pytest

from rumpy_tpu.models import contrastive_labelling as cl
from rumpy_tpu.registry import get_model


def _batch(rng, n=4, p=1, size=32, labels=None, vector=None):
    b = {
        "image_query": rng.random((n, size, size, 3)).astype(np.float32),
        "image_key": rng.random((n * p, size, size, 3)).astype(np.float32),
    }
    if labels is not None:
        b["labels"] = labels
    if vector is not None:
        b["vector"] = vector
    return b


def test_moco_embedding_shape(rng):
    h = get_model("moco")(K=32, dim=256)
    state = h.init_state()
    emb = h.run_embedding(state, rng.random((2, 32, 32, 3)).astype(np.float32))
    assert emb.shape == (2, 256)


def test_moco_train_step_updates_queue(rng):
    h = get_model("moco")(K=16, dim=256, lr=1e-3)
    state = h.init_state()
    q0 = np.asarray(state.extra["queue"])
    batch = _batch(rng, n=4)
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert int(state.extra["queue_ptr"]) == 4
    q1 = np.asarray(state.extra["queue"])
    assert not np.allclose(q0[:4], q1[:4])      # enqueued
    np.testing.assert_allclose(q0[4:], q1[4:])  # untouched
    # ptr wraps
    for _ in range(3):
        state, _ = h.train_batch(state, _batch(rng, n=4))
    assert int(state.extra["queue_ptr"]) == 0


def test_moco_momentum_encoder_lags(rng):
    h = get_model("moco")(K=16, m=0.999, lr=1e-2)
    state = h.init_state()
    batch = _batch(rng, n=4)
    state, _ = h.train_batch(state, batch)
    import jax
    leaves_q = jax.tree_util.tree_leaves(state.params)
    leaves_k = jax.tree_util.tree_leaves(state.extra["key_params"])
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(leaves_q, leaves_k)]
    assert max(diffs) > 0  # key encoder lags query after one step


def test_supmoco_with_labels(rng):
    h = get_model("supmoco")(K=16, num_classes=8, positives_per_class=2,
                             dropdown=4, lr=1e-3)
    state = h.init_state()
    labels = np.array([0, 1, 2, 3], np.int32)
    batch = _batch(rng, n=4, p=2, labels=labels)
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    np.testing.assert_array_equal(np.asarray(state.extra["queue_labels"][:4]),
                                  labels)


def test_supmoco_direct_loss(rng):
    h = get_model("supmoco")(K=16, num_classes=4, positives_per_class=1,
                             dropdown=3, include_direct_loss=True, lr=1e-3)
    state = h.init_state()
    batch = _batch(rng, n=4, p=1, labels=np.zeros(4, np.int32),
                   vector=rng.random((4, 3)).astype(np.float32))
    _, losses = h.train_batch(state, batch)
    assert "direct-loss" in losses


def test_weakcon_vector_queue(rng):
    h = get_model("weakcon")(K=16, vector_size=2, positives_per_class=1,
                             lr=1e-3)
    state = h.init_state()
    vec = rng.random((4, 2)).astype(np.float32)
    batch = _batch(rng, n=4, p=1, vector=vec)
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    np.testing.assert_allclose(np.asarray(state.extra["queue_vectors"][:4]),
                               vec, atol=1e-6)


def test_supcon(rng):
    h = get_model("supcon")(lr=1e-3)
    state = h.init_state()
    batch = _batch(rng, n=4, p=1, labels=np.array([0, 0, 1, 1], np.int32))
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_degradation_regressor(rng):
    h = get_model("degradationregressor")(num_targets=2, lr=1e-3)
    state = h.init_state()
    batch = {"lr": rng.random((4, 32, 32, 3)).astype(np.float32),
             "metadata": rng.random((4, 2)).astype(np.float32)}
    losses0 = None
    for _ in range(5):
        state, losses = h.train_batch(state, batch)
        if losses0 is None:
            losses0 = float(losses["train-loss"])
    assert float(losses["train-loss"]) < losses0


# ---------------------------------------------------------------------------
# Class labelling
# ---------------------------------------------------------------------------

def test_register_metadata():
    keys = ["2-realesrgannoise-gaussian_noise_scale",
            "2-realesrgannoise-poisson_noise_scale",
            "2-realesrgannoise-gray_noise",
            "3-randomcompress-jpeg_quality", "3-randomcompress-jm_qpi",
            "0-realesrganblur-kernel_type", "0-realesrganblur-sigma_x",
            "0-realesrganblur-sigma_y", "1-downsample-scale"]
    out = cl.register_metadata(keys)
    assert out == ["gaussian_noise_scale", "poisson_noise_scale",
                   "gray_noise_boolean", "jpeg_quality_factor", "jm_qpi",
                   "kernel_type", "sigma_x", "sigma_y", "scale"]


def test_partition_and_assign_classes(rng):
    keys = ["gaussian_noise_scale", "poisson_noise_scale",
            "gray_noise_boolean", "jpeg_quality_factor", "jm_qpi",
            "kernel_type", "sigma_x", "sigma_y"]
    m_map = {k: i for i, k in enumerate(keys)}
    valid, mags, num_classes = cl.partition_metadata(m_map)
    assert "noise" in valid and "compression" in valid and "blur" in valid
    assert num_classes == 2 * 2 * 2 * 2 * 7 * 3 * 3

    meta = np.zeros((3, len(keys)), np.float32)
    # ex0: gaussian color noise low, jpeg low, iso blur low sigmas
    meta[0, m_map["gaussian_noise_scale"]] = 0.2
    meta[0, m_map["jpeg_quality_factor"]] = 0.3
    # ex1: poisson gray noise, jm high, sinc blur high sigma_x
    meta[1, m_map["poisson_noise_scale"]] = 0.9
    meta[1, m_map["gray_noise_boolean"]] = 1.0
    meta[1, m_map["jm_qpi"]] = 0.8
    meta[1, m_map["kernel_type"]] = 6
    meta[1, m_map["sigma_x"]] = 0.9
    meta[2] = meta[0]
    labels = np.asarray(cl.assign_classes(meta, m_map, valid, mags,
                                          num_classes))
    assert labels[0] == labels[2]
    assert labels[0] != labels[1]
    assert (labels >= 0).all() and (labels < num_classes).all()


def test_degradation_vectors():
    keys = ["gaussian_noise_scale", "poisson_noise_scale",
            "gray_noise_boolean", "jpeg_quality_factor", "jm_qpi",
            "kernel_type", "sigma_x", "sigma_y"]
    m_map = {k: i for i, k in enumerate(keys)}
    valid = ["noise", "compression", "blur"]
    meta = np.zeros((1, len(keys)), np.float32)
    meta[0, m_map["gaussian_noise_scale"]] = 0.5
    meta[0, m_map["jm_qpi"]] = 0.7
    meta[0, m_map["sigma_x"]] = 0.3
    vec = np.asarray(cl.degradation_vectors(meta, m_map, valid))
    assert vec.shape == (1, 6)
    assert vec[0, 0] == pytest.approx(0.5)   # gaussian slot
    assert vec[0, 1] == 0                    # poisson slot empty
    assert vec[0, 3] == pytest.approx(0.7)   # jm slot
    assert vec[0, 4] == pytest.approx(0.3)   # sigma_x
