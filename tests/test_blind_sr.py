"""Best-of-Both-Worlds blind-SR pipeline tests."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model

GEN_KW = dict(n_feats=16, n_resgroups=1, n_resblocks=1)


def _batch(rng, n=2, size=8, scale=2, crops=None):
    b = {"hr": rng.random((n, size * scale, size * scale, 3)
                          ).astype(np.float32)}
    if crops:
        b["lr"] = rng.random((n, size, size, 3)).astype(np.float32)
        b["image_key"] = rng.random((n * crops, size, size, 3)
                                    ).astype(np.float32)
    else:
        b["lr"] = rng.random((n, size, size, 3)).astype(np.float32)
    return b


def test_frozen_encoder_pipeline(rng):
    h = get_model("contrastiveblindqrcan")(
        scale=2, block_encoder_loading=True, **GEN_KW)
    state = h.init_state()
    assert "frozen_encoder" in state.extra
    assert "encoder" not in state.params
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    frozen_before = np.concatenate(
        [np.asarray(x).ravel() for x in
         __import__("jax").tree_util.tree_leaves(
             state.extra["frozen_encoder"])])
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    frozen_after = np.concatenate(
        [np.asarray(x).ravel() for x in
         __import__("jax").tree_util.tree_leaves(
             state2.extra["frozen_encoder"])])
    np.testing.assert_array_equal(frozen_before, frozen_after)


def test_joint_moco_pipeline(rng):
    h = get_model("contrastiveblindqrcan")(
        scale=2, combined_loss_mode="moco", crop_count=2,
        contrastive_K=8, encoder_dim=64, block_encoder_loading=True,
        **GEN_KW)
    state = h.init_state()
    assert "queue" in state.extra
    batch = _batch(rng, crops=1)
    state, losses = h.train_batch(state, batch)
    assert {"train-loss", "pixel-loss", "contrastive-loss"} <= set(losses)
    assert np.isfinite(float(losses["train-loss"]))
    assert int(state.extra["queue_ptr"]) == 2


def test_joint_supmoco_pipeline(rng):
    h = get_model("contrastiveblindqrcan")(
        scale=2, combined_loss_mode="supmoco", crop_count=3,
        contrastive_K=8, encoder_dim=64, num_classes=4,
        block_encoder_loading=True, **GEN_KW)
    state = h.init_state()
    batch = _batch(rng, crops=2)
    batch["labels"] = np.array([0, 1], np.int32)
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    np.testing.assert_array_equal(
        np.asarray(state.extra["queue_labels"][:2]), [0, 1])


def test_contrastive_blind_qsan(rng):
    h = get_model("contrastiveblindqsan")(
        scale=2, block_encoder_loading=True, encoder_dim=64,
        n_feats=16, n_resgroups=1, n_resblocks=1)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)


def test_reducer_and_embedding_types(rng):
    h = get_model("contrastiveblindqedsr")(
        scale=2, block_encoder_loading=True, embedding_type="q",
        encoder_dim=64, reducer_layer_sizes=[32, 10],
        num_features=8, num_blocks=1)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)


def test_srmd_mode_pipeline(rng):
    h = get_model("contrastiveblindqrcan")(
        scale=2, block_encoder_loading=True, srmd_mode=True,
        encoder_dim=64, embedding_type="q", **GEN_KW)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)


def test_encoder_warm_start(rng, tmp_path):
    # Train a small moco predictor, save, then warm-start the pipeline's E.
    enc = get_model("moco")(K=8, dim=64, lr=1e-3)
    estate = enc.init_state()
    batch = {"image_query": rng.random((2, 32, 32, 3)).astype(np.float32),
             "image_key": rng.random((2, 32, 32, 3)).astype(np.float32)}
    estate, _ = enc.train_batch(estate, batch)
    enc.save_model(estate, str(tmp_path), epoch=0)

    h = get_model("contrastiveblindqrcan")(
        scale=2, encoder_dim=64,
        pre_trained_encoder_weights=str(tmp_path), **GEN_KW)
    state = h.init_state()
    import jax
    loaded = jax.tree_util.tree_leaves(state.extra["frozen_encoder"])
    trained = jax.tree_util.tree_leaves(estate.params)
    assert len(loaded) == len(trained)
    for a, b in zip(loaded, trained):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_contrastive_blind_metabed(rng):
    """ContrastiveBlindMetaBedHandler (handlers.py:406-461): Metabed
    generator with front_only meta gating under the BoBW pipeline."""
    h = get_model("contrastiveblindmetabed")(
        scale=2, num_blocks=2, num_features=8,
        block_encoder_loading=True)
    state = h.init_state()
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_contrastive_blind_metabed_none_gating(rng):
    h = get_model("contrastiveblindmetabed")(
        scale=2, num_blocks=2, num_features=8,
        selective_meta_blocks="none", block_encoder_loading=True)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)
