"""The SHIPPED packaged pretrained encoder (rumpy_tpu/pretrained/).

Parity role: the reference ships warm-start checkpoints in-repo under
regression/pretrained_networks/ and resolves bare names in
warm_start_setup (regression/training/training_handler.py:92-118). Here
the package is a real SupMoCo run trained with the fused on-device
full-chain degradation pipeline (examples/predictor_pretrain_run.py);
these tests pin that the artifact stays loadable through every consumer.
"""

import os

import numpy as np
import pytest

PKG = "supmoco_fullchain_d256"
PRETRAINED_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "rumpy_tpu", "pretrained")
PKG_DIR = os.path.join(PRETRAINED_ROOT, PKG)
ALL_PKGS = (sorted(os.listdir(PRETRAINED_ROOT))
            if os.path.isdir(PRETRAINED_ROOT) else [])

pytestmark = pytest.mark.skipif(
    not os.path.isdir(PKG_DIR), reason="packaged network not present")


@pytest.mark.parametrize("pkg", ALL_PKGS)
def test_resolve_and_checkpoint_contents(pkg):
    """Every shipped package resolves by bare name and carries a
    minimal checkpoint (no optimizer) with its contrastive state."""
    from rumpy_tpu.utils import checkpoint as ckpt
    d = ckpt.resolve_packaged(pkg)
    assert d == os.path.join(PRETRAINED_ROOT, pkg, "saved_models")
    ep = ckpt.select_epoch(d, "last")
    raw = ckpt.load_checkpoint(ckpt.checkpoint_path(d, ep))
    assert raw["model_name"] in ("supmoco", "weakcon", "moco")
    # minimal package: no optimizer state travels with it
    assert not raw.get("optimizer")
    for k in ("key_params", "q_bstats", "k_bstats", "queue"):
        assert k in raw["extra"], k


@pytest.mark.parametrize("pkg", ALL_PKGS)
def test_packaged_stats_are_clean(pkg):
    """Package lint: the shipped summary.csv must be a single clean run —
    unique, monotonically increasing epoch indices — so 'best'-epoch
    selection over it is well-defined (the same clean-stats contract the
    trainer enforces when truncating on resume)."""
    import pandas as pd
    df = pd.read_csv(os.path.join(PRETRAINED_ROOT, pkg,
                                  "result_outputs", "summary.csv"))
    eps = df["epoch"].tolist()
    assert eps == sorted(set(eps)), \
        f"{pkg} summary.csv has duplicate/non-monotone epochs: {eps[:10]}..."


def test_select_best_dedups_duplicate_epochs(tmp_path):
    """select_epoch('best') over a stats file holding rows from an
    aborted earlier run keeps the LAST row per epoch index (resume
    supersession rule) instead of picking a stale row's epoch."""
    import pandas as pd

    from rumpy_tpu.utils import checkpoint as ckpt
    d = tmp_path / "saved_models"
    d.mkdir()
    for ep in range(3):
        ckpt.save_checkpoint(ckpt.checkpoint_path(str(d), ep),
                             {"model_name": "x", "network": {}})
    csv = tmp_path / "summary.csv"
    # stale aborted-run rows (epochs 0,1 with a spuriously high PSNR)
    pd.DataFrame({"epoch": [0, 1, 0, 1, 2],
                  "val-PSNR": [99.0, 98.0, 10.0, 12.0, 11.0]}).to_csv(
        csv, index=False)
    assert ckpt.select_epoch(str(d), "best", str(csv)) == 1


@pytest.mark.parametrize("pkg", ALL_PKGS)
def test_training_actually_improved_clustering(pkg):
    """The packaged summary.csv must show the run it came from learned
    something: Davies-Bouldin (lower better) improves over epoch 0.

    The in-training DB column scores the mixed-radix metadata classes —
    a deliberately crude signal (BASELINE.md's grid probe is the real
    quality measure, where the heldout package moves DB 39->11.5 vs
    random init) — so the lint only requires a >=10% best-epoch
    improvement, not a large one."""
    import pandas as pd
    df = pd.read_csv(os.path.join(PRETRAINED_ROOT, pkg,
                                  "result_outputs", "summary.csv"))
    db = df["val-davies_bouldin"]
    assert db.min() < db.iloc[0] * 0.9
    assert np.isfinite(df["train-loss"]).all()


def test_trainer_warm_start_from_packaged_name(tmp_path):
    """training.warm_start = "<bare name>" through the REAL regression
    trainer: the packaged query-encoder weights land in the new run's
    initial state (reference warm_start_setup,
    training_handler.py:92-118)."""
    import jax
    from PIL import Image

    from rumpy_tpu.config.loader import to_none_dict
    from rumpy_tpu.training.regression_trainer import \
        RegressionTrainingHandler
    from rumpy_tpu.utils import checkpoint as ckpt

    rng = np.random.default_rng(0)
    hr_dir = tmp_path / "hr"
    hr_dir.mkdir()
    for i in range(4):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                        ).save(hr_dir / f"im{i}.png")
    cfg = to_none_dict({
        "experiment": "warmstarted",
        "experiment_save_loc": str(tmp_path / "Results"),
        "data": {"task_type": "regression", "scale": 2, "crop": 32,
                 "dataloader_threads": 1,
                 "online_degradations": {
                     "pipeline": [["realesrganblur", "b"],
                                  ["downsample", "d"]],
                     "deg_configs": {
                         "b": {"kernel_range": ["iso", "aniso"],
                               "kernel_size": 9},
                         "d": {"scale": 2}}},
                 "training_sets": {"data_1": {"hr_dir": str(hr_dir)}}},
        # arch must match the package exactly (fail-loud contract)
        "model": {"name": "supmoco",
                  "internal_params": {"dim": 256, "K": 8192}},
        "training": {"num_epochs": 0, "batch_size": 2, "seed": 0,
                     "warm_start": PKG},
    })
    h = RegressionTrainingHandler(cfg, verbose=False)
    d = ckpt.resolve_packaged(PKG)
    raw = ckpt.load_checkpoint(
        ckpt.checkpoint_path(d, ckpt.select_epoch(d, "last")))
    got = jax.tree_util.tree_leaves(h.model.state.params)
    want = jax.tree_util.tree_leaves(raw["network"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_bobw_loads_packaged_encoder_by_name():
    """ContrastiveBlindQRCAN warm-starts its (frozen) encoder from the
    bare packaged name — the BoBW flagship config path
    (blind_sr.py::load_encoder, reference contrastive_blind_sr.py's
    pre_trained_encoder_weights)."""
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model
    h = get_model("contrastiveblindqrcan")(
        scale=4, n_feats=8, n_resgroups=1, n_resblocks=2,
        block_encoder_loading=True, lr=1e-4)
    st = h.init_state()
    st2 = h.load_encoder(st, PKG)
    # loaded encoder params differ from random init...
    before = st.extra.get("frozen_encoder") or st.params.get("encoder")
    after = st2.extra.get("frozen_encoder") or st2.params.get("encoder")
    import jax
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree_util.tree_leaves(before),
                             jax.tree_util.tree_leaves(after))]
    assert max(diffs) > 1e-4
    # ...and its BatchNorm running stats came along (not mean-0/var-1)
    x = jnp.asarray(np.random.default_rng(0).random((1, 48, 48, 3)),
                    jnp.float32)
    sr = h.run_model(st2, x)
    assert sr.shape == (1, 192, 192, 3)
    assert bool(np.all(np.isfinite(np.asarray(sr))))
