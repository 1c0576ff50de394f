"""Meta-attention (Q-model) family tests."""

import numpy as np
import pytest

from rumpy_tpu.models.attention_manipulators import compute_num_metadata
from rumpy_tpu.registry import get_model


def _batch(rng, n=2, size=8, scale=2, meta=1):
    return {
        "lr": rng.random((n, size, size, 3)).astype(np.float32),
        "hr": rng.random((n, size * scale, size * scale, 3)).astype(np.float32),
        "metadata": rng.random((n, meta)).astype(np.float32),
    }


def test_num_metadata_expansions():
    assert compute_num_metadata(["qpi"]) == 1
    assert compute_num_metadata(["blur_kernel"]) == 10
    assert compute_num_metadata(["qpi", "blur_kernel"]) == 11
    assert compute_num_metadata(["unmodified_blur_kernel"]) == 441
    assert compute_num_metadata(["contrastive_encoding"]) == 256
    assert compute_num_metadata(None, metadata_bypass_len=42) == 42
    assert compute_num_metadata(["all"]) == 40


@pytest.mark.parametrize("style", ["modulate", "max_concat", "mini_concat",
                                   "softmax", "extended_attention",
                                   "standard"])
def test_qrcan_styles(rng, style):
    h = get_model("qrcan")(scale=2, metadata=["qpi"], style=style,
                           n_feats=16, n_resgroups=1, n_resblocks=2,
                           include_q_layer=True)
    state = h.init_state()
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    state2, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_qrcan_selective_blocks(rng):
    h = get_model("qrcan")(scale=2, metadata=["qpi"], n_feats=16,
                           n_resgroups=2, n_resblocks=1,
                           include_q_layer=True,
                           selective_meta_blocks=[True, False])
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)


def test_qrcan_blur_kernel_metadata(rng):
    h = get_model("qrcan")(scale=2, metadata=["blur_kernel"],
                           style="max_concat", n_feats=16, n_resgroups=1,
                           n_resblocks=1, include_q_layer=True)
    assert h.num_metadata == 10
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng, meta=10))
    assert sr.shape == (2, 16, 16, 3)


def test_qedsr(rng):
    h = get_model("qedsr")(scale=2, metadata=["qpi"], num_features=16,
                           num_blocks=2)
    state = h.init_state()
    batch = _batch(rng)
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_qrcan_sft_mode(rng):
    h = get_model("qrcan")(scale=2, metadata=["qpi"], style="standard",
                           n_feats=16, n_resgroups=1, n_resblocks=1,
                           include_q_layer=False, include_sft_layer=True)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (2, 16, 16, 3)


def test_metadata_required_error(rng):
    h = get_model("qedsr")(scale=2, metadata=["qpi"], num_features=8,
                           num_blocks=1)
    state = h.init_state()
    with pytest.raises(RuntimeError, match="Metadata needs to be specified"):
        h.run_eval(state, {"lr": rng.random((1, 8, 8, 3)).astype(np.float32)})


def test_select_metadata_by_keys(rng):
    h = get_model("qedsr")(scale=2, metadata=["sigma_x", "qpi"],
                           num_features=8, num_blocks=1)
    mat = rng.random((2, 3)).astype(np.float32)
    keys = ["0-realesrganblur-sigma_x", "1-downsample-scale",
            "2-jmcompress-qpi"]
    sel = h.select_metadata(mat, keys)
    assert sel.shape == (2, 2)
    np.testing.assert_allclose(sel[:, 0], mat[:, 0])
    np.testing.assert_allclose(sel[:, 1], mat[:, 2])


def test_run_forensic_captures_attention(rng):
    """run_forensic parity (base_architecture.py:522-530): meta-attention
    layers expose their per-block attention vectors."""
    h = get_model("qrcan")(scale=2, metadata=["qpi"], n_feats=16,
                           n_resgroups=1, n_resblocks=2)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "metadata": rng.random((1, 1)).astype(np.float32)}
    out, forensic = h.run_forensic(state, batch)
    assert np.asarray(out).shape == (1, 16, 16, 3)
    att_keys = [k for k in forensic if k.endswith("attention")]
    assert len(att_keys) >= 2  # QCALayer + ParaCALayer per block
    for k in att_keys:
        v = forensic[k]
        assert v.shape[-1] == 16
        assert (v >= 0).all() and (v <= 1).all()


def test_net_forensic_interface(tmp_path, rng):
    from rumpy_tpu.interface import SISRInterface
    iface = SISRInterface(
        model_loc=str(tmp_path), experiment="fx", mode="train",
        no_directories=True, scale=2,
        new_params={"name": "qrcan", "internal_params": {
            "scale": 2, "metadata": ["qpi"], "n_feats": 16,
            "n_resgroups": 1, "n_resblocks": 1}})
    img, forensic = iface.net_forensic(
        rng.random((8, 8, 3)).astype(np.float32),
        metadata=rng.random((1, 1)).astype(np.float32))
    assert img.shape == (1, 16, 16, 3)
    assert any(k.endswith("attention") for k in forensic)


def test_select_metadata_all_semantics():
    """generate_channels 'all' semantics (attention_manipulators/
    __init__.py:93-96): 'all' selects every column; named keys select by
    exact or '-suffix' match."""
    import numpy as np
    from rumpy_tpu.models.attention_manipulators import (
        select_metadata_columns)
    mat = np.arange(12, dtype=np.float32).reshape(2, 6)
    keys = [f"0-op-k{i}" for i in range(6)]
    np.testing.assert_array_equal(
        select_metadata_columns(mat, keys, ["all"]), mat)
    sel = select_metadata_columns(mat, keys, ["k2"])
    np.testing.assert_array_equal(sel, mat[:, [2]])
    # no key list: matrix assumed pre-selected
    np.testing.assert_array_equal(
        select_metadata_columns(mat, None, ["k2"]), mat)
