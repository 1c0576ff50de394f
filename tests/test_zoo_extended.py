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


def test_danv1qrealesrgan(rng):
    """DANv1QRealESRGANHandler (handlers.py:139-334): DAN alternation
    with a QRRDBNet restorer under the GAN recipe — pretrain phase uses
    the DAN loss, adversarial phase adds vanilla-BCE GAN terms."""
    h = get_model("danv1qrealesrgan")(
        scale=4, nf=8, nb=1, gc=8, input_para=4, kernel_size=9, loop=2,
        pretrain_epochs=1)
    state = h.init_state()
    batch = {"lr": rng.random((2, 8, 8, 3)).astype(np.float32),
             "hr": rng.random((2, 32, 32, 3)).astype(np.float32),
             "metadata": rng.random((2, 4)).astype(np.float32)}
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 32, 32, 3)
    # pretrain phase: DAN loss only, zero GAN terms
    h.set_epoch(0)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert float(losses["gan-loss"]) == 0.0
    assert "kernel-loss-iter-1" in losses
    # adversarial phase: BCE GAN terms live
    h.set_epoch(1)
    state3, losses3 = h.train_batch(state2, batch)
    assert np.isfinite(float(losses3["train-loss"]))
    assert float(losses3["gan-loss"]) > 0.0
    assert float(losses3["d-loss-real"]) > 0.0
    assert "image-loss-iter-0" in losses3


def test_registry_covers_every_reference_handler():
    """Every non-discarded reference handler class resolves in this
    registry (VERDICT r2 item 4): names follow the reference's AST
    convention `<ClassName minus 'Handler'>.lower()`
    (shared_framework/models/__init__.py:10-25), with the documented
    consolidations (docs/parity_matrix.md)."""
    import ast
    import glob

    from rumpy_tpu.registry import available_models

    consolidated = {
        # reference name -> this repo's name (documented consolidations)
        "ikcpredictor": "ikc", "ikccorrector": "ikc",
        "mococontrastive": "moco",
        "dicgan": "dic",
        "vggfeatureextractor": None,  # feature_extractors module, not a model
    }
    ref_names = set()
    for path in glob.glob(
            "/root/reference/rumpy/*/models/*/handlers.py"):
        tree = ast.parse(open(path).read())
        for node in ast.walk(tree):
            if isinstance(node, ast.ClassDef) and \
                    node.name.endswith("Handler"):
                ref_names.add(node.name[:-len("Handler")].lower())
    assert len(ref_names) >= 55, ref_names
    ours = set(available_models())
    missing = []
    for name in sorted(ref_names):
        target = consolidated.get(name, name)
        if target is None:
            continue
        if target not in ours:
            missing.append(name)
    assert not missing, f"unregistered reference handlers: {missing}"
