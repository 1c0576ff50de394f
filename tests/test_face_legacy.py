"""Face/legacy family smoke tests + VSR dataset + SwinIR."""

import os

import numpy as np
import pytest
from PIL import Image

from rumpy_tpu.registry import get_model


def test_sparnet(rng):
    h = get_model("sparnet")(scale=2, min_ch=8, max_ch=16, in_size=32,
                             out_size=32, min_feat_size=16, res_depth=1,
                             bottleneck_size=16)
    state = h.init_state()
    batch = {"lr": rng.random((1, 32, 32, 3)).astype(np.float32),
             "hr": rng.random((1, 32, 32, 3)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 32, 32, 3)
    import jax
    # host copies BEFORE train_batch: the step donates the state buffers
    before = [np.asarray(v) for v in jax.tree_util.tree_leaves(
        state.extra["vars"]["batch_stats"])]
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    # BatchNorm running stats advanced through extra['vars']
    after = jax.tree_util.tree_leaves(
        state2.extra["vars"]["batch_stats"])
    assert any(np.abs(np.asarray(a) - b).max() > 0
               for a, b in zip(after, before))


def test_qsparnet(rng):
    h = get_model("qsparnet")(scale=2, metadata=["all"], min_ch=8,
                              max_ch=16, in_size=32, out_size=32,
                              min_feat_size=16, res_depth=1,
                              bottleneck_size=16)
    assert h.num_metadata == 40
    state = h.init_state()
    batch = {"lr": rng.random((1, 32, 32, 3)).astype(np.float32),
             "metadata": rng.random((1, 40)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 32, 32, 3)


def test_rcansplit(rng):
    h = get_model("rcansplitceleb")(scale=2, n_feats=8, n_resgroups=1,
                                    n_resblocks=1)
    state = h.init_state()
    lr = rng.random((2, 8, 8, 3)).astype(np.float32)
    out_a = h.run_eval(state, {"lr": lr,
                               "metadata": np.ones((2, 1), np.float32)})
    out_b = h.run_eval(state, {"lr": lr,
                               "metadata": np.zeros((2, 1), np.float32)})
    assert out_a.shape == (2, 16, 16, 3)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))
    # mixed batch: per-allocation losses reported like the reference
    batch = {"lr": lr, "hr": rng.random((2, 16, 16, 3)).astype(np.float32),
             "metadata": np.asarray([[1.0], [0.0]], np.float32)}
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["positive-loss"]))
    assert np.isfinite(float(losses["negative-loss"]))
    np.testing.assert_allclose(
        float(losses["train-loss"]),
        float(losses["positive-loss"]) + float(losses["negative-loss"]),
        rtol=1e-5)
    # an allocation with no examples reports NaN (handlers.py:52-54) but
    # the batch still trains — and the absent expert's parameters stay
    # untouched (the reference skips that child's optimizer step; Adam
    # momentum must not make it coast)
    import jax
    state2 = h.init_state()
    # two steps first so Adam momentum is nonzero for both experts
    state2, _ = h.train_batch(state2, batch)
    state2, _ = h.train_batch(state2, batch)
    b_before = [np.asarray(v) for v in
                jax.tree_util.tree_leaves(state2.params["expert_b"])]
    state3, losses2 = h.train_batch(
        state2, {**batch, "metadata": np.ones((2, 1), np.float32)})
    assert np.isnan(float(losses2["negative-loss"]))
    assert np.isfinite(float(losses2["train-loss"]))
    b_after = jax.tree_util.tree_leaves(state3.params["expert_b"])
    assert all(np.array_equal(np.asarray(a), b)
               for a, b in zip(b_after, b_before))


def test_legacy_alias_kwargs():
    """Round-1 registry names accept (and map/ignore) the old kwargs."""
    import warnings
    h = get_model("dicnet")(scale=4, nf=8, iterations=2, num_groups=2,
                            hg_num_feature=16, num_fusion_block=1)
    assert h.module.num_features == 8 and h.module.num_steps == 2
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        get_model("waveletnet")(scale=4, nf=8, nb=1, num_layers_res=1)
        assert any("ignored" in str(x.message) for x in w)


def test_interface_forwards_set_epoch(tmp_path):
    """Epoch-switched handlers (GAN phases, WaveletSRGAN training_switch,
    FSSR-DSGAN LR decay) need interface.set_epoch to reach the handler
    (reference base_interface.py:313-315)."""
    from rumpy_tpu.interface import SISRInterface
    iface = SISRInterface(
        model_loc=str(tmp_path), experiment="se", mode="train", scale=4,
        new_params={"name": "esrgan",
                    "internal_params": {"scale": 4, "nf": 8, "nb": 1,
                                        "gc": 4, "pretrain_epochs": 2}})
    iface.set_epoch(3)
    assert iface.model.curr_epoch == 3


@pytest.mark.parametrize("scale", [2, 4])
def test_waveletsrnet(rng, scale):
    h = get_model("waveletsrnet")(scale=scale, num_layers_res=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "hr": rng.random((1, 8 * scale, 8 * scale, 3)
                              ).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 8 * scale, 8 * scale, 3)
    _, losses = h.train_batch(state, batch)
    for k in ("train-loss", "wavelet_lr_loss", "wavelet_hr_loss",
              "img_loss", "texture_loss"):
        assert np.isfinite(float(losses[k])), k


def test_dic_train_with_landmarks(rng):
    h = get_model("dic")(scale=4, num_steps=2, num_features=8,
                         num_groups=2, hg_num_feature=16,
                         num_fusion_block=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "hr": rng.random((1, 32, 32, 3)).astype(np.float32),
             "landmarks": (rng.random((1, 68, 2)) * 32
                           ).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 32, 32, 3)
    import jax
    # host copies BEFORE train_batch: the step donates the state buffers
    hg_before = [np.asarray(v) for v in
                 jax.tree_util.tree_leaves(state.params["hg"])]
    body_before = [np.asarray(v) for v in
                   jax.tree_util.tree_leaves(state.params["first_block"])]
    state2, losses = h.train_batch(state, batch)
    assert float(losses["align_loss"]) > 0
    assert np.isfinite(float(losses["train-loss"]))
    # hourglass grads are masked until hg_release_step (reference freezes
    # the HG for the first 2M steps, handlers.py:95-102)
    hg_after = jax.tree_util.tree_leaves(state2.params["hg"])
    assert all(np.allclose(np.asarray(a), b)
               for a, b in zip(hg_after, hg_before))
    body_after = jax.tree_util.tree_leaves(state2.params["first_block"])
    assert any(np.abs(np.asarray(a) - b).max() > 0
               for a, b in zip(body_after, body_before))


def test_esrganfs_step(rng):
    h = get_model("esrganfs")(scale=4, pretrain_epochs=0, nf=8, nb=1,
                              gc=4, lr=1e-3, discriminator="unet")
    h.set_epoch(0)
    state = h.init_state()
    batch = {"lr": rng.random((1, 16, 16, 3)).astype(np.float32),
             "hr": rng.random((1, 64, 64, 3)).astype(np.float32)}
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert np.isfinite(float(losses["gan-loss"]))


def test_fssrdsgan_step(rng):
    import pytest as _pytest
    with _pytest.raises(ValueError):
        get_model("fssrdsgan")()  # perceptual loss needs LPIPS weights
    h = get_model("fssrdsgan")(use_perceptual_loss=False, n_res_blocks=1)
    h.set_epoch(200)  # inside the linear-decay tail
    assert 0.0 < h._lr_factor() < 1.0
    state = h.init_state()
    batch = {"lr": rng.random((1, 12, 12, 3)).astype(np.float32),
             "hr": rng.random((1, 12, 12, 3)).astype(np.float32)}
    state, losses = h.train_batch(state, batch)
    for k in ("train-loss", "discriminator-loss", "color-loss",
              "texture-loss"):
        assert np.isfinite(float(losses[k])), k
    out = h.run_eval(state, batch)
    assert out.shape == (1, 12, 12, 3)


def test_face_attribute_gans_registered():
    from rumpy_tpu.registry import available_models
    models = available_models()
    for name in ["facesrattributesgan", "agagan", "fmfnet", "swinir",
                 "sparnet", "waveletnet", "waveletsrnet", "waveletsrgan",
                 "dic", "dicnet", "fssr", "esrganfs", "fssrdsgan", "dasr",
                 "dcls", "san", "qsan", "ikc", "sftmd", "dan"]:
        assert name in models, name


def test_video_sequence_dataset(tmp_path, rng):
    from rumpy_tpu.data.datasets import VideoSequenceImages
    from rumpy_tpu.ops import resize
    lr_dir = tmp_path / "lr"
    hr_dir = tmp_path / "hr"
    os.makedirs(lr_dir)
    os.makedirs(hr_dir)
    for i in range(6):
        hr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(hr).save(hr_dir / f"f{i:03d}.png")
        Image.fromarray(np.asarray(resize.pil_resize(hr, (8, 8)))
                        ).save(lr_dir / f"f{i:03d}.png")
    ds = VideoSequenceImages(lr_dir=str(lr_dir), hr_dir=str(hr_dir),
                             scale=2, num_frames=3)
    assert len(ds) == 4
    item = ds[0]
    assert item["lr"].shape == (8, 8, 9)   # 3 frames on channels
    assert item["hr"].shape == (16, 16, 3)  # single target frame
    assert item["tag"] == "f001.png"        # center frame


def test_celeba_split_sampler():
    from rumpy_tpu.data.loader import (CelebaSplitSampler, ConcatDataset,
                                       DataLoader)

    class _FakeDS:
        metadata_keys = ["5-celeba-gender", "5-celeba-smiling"]

        def __init__(self, meta):
            self.metadata = meta

        def __len__(self):
            return len(self.metadata)

        def __getitem__(self, i):
            return {"idx": np.asarray([i], np.int64)}

    ds = _FakeDS([[1, 0], [0, 1], [1, 1], [0, 0], [1, 0]])
    s = CelebaSplitSampler(ds, selected_attribute="gender")
    order = list(iter(s))
    assert len(order) == 5
    # all positives (0, 2, 4) come before negatives (1, 3)
    assert set(order[:3]) == {0, 2, 4} and set(order[3:]) == {1, 3}

    # concat offsets
    ds2 = _FakeDS([[0, 0], [1, 0]])
    cat = ConcatDataset([ds, ds2])
    s2 = CelebaSplitSampler(cat, selected_attribute="gender")
    order2 = list(iter(s2))
    assert set(order2[:4]) == {0, 2, 4, 6} and set(order2[4:]) == {1, 3, 5}

    # loader integration: sampler ordering drives the batches
    loader = DataLoader(ds, batch_size=5, sampler=s, num_workers=1)
    batch = next(iter(loader))
    assert set(batch["idx"][:3, 0].tolist()) == {0, 2, 4}

    with __import__("pytest").raises(ValueError):
        CelebaSplitSampler(ds, selected_attribute="bogus")


def test_facegan_training_and_generation(rng):
    h = get_model("facegan")(latent_dim=8, nf=8)
    state = h.init_state()
    batch = {"hr": rng.random((4, 80, 80, 3)).astype(np.float32)}
    state, losses = h.train_batch(state, batch)
    for k in ("train-loss", "d-loss-real", "d-loss-fake",
              "d-acc-real", "d-acc-fake"):
        assert np.isfinite(float(losses[k])), k
    img, _, _ = h.apply(state.params,
                        {"latent": rng.random((2, 8)).astype(np.float32)},
                        extra=state.extra)
    assert img.shape == (2, 80, 80, 3)
    assert float(np.asarray(img).min()) >= 0.0
    assert float(np.asarray(img).max()) <= 1.0
