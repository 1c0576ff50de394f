"""Golden/parity tests for the reference-exact WaveletSRNet, DIC and
FSSR family ports: weights converted from the reference's own torch
modules (loaded from /root/reference at test time), outputs compared."""

import importlib.util
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/rumpy/SISR/models"


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _pkg(name):
    mod = sys.modules.setdefault(name, types.ModuleType(name))
    if not hasattr(mod, "__path__"):
        mod.__path__ = []
    return mod


# ---------------------------------------------------------------------------
# Wavelet basis / transform / losses
# ---------------------------------------------------------------------------

PKL = "/root/reference/rumpy/SISR/models/waveletnets/wavelet_weights.pkl"


def test_wavelet_basis_matches_reference_pickle():
    import pickle
    from rumpy_tpu.models.wavelet import wavelet_basis
    with open(PKL, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    for ks in (2, 4, 8):
        per_ch = d[f"rec{ks}"].reshape(3, ks * ks, ks, ks)
        mine = wavelet_basis(ks)
        for c in range(3):
            np.testing.assert_array_equal(per_ch[c], mine)


def test_reference_rec16_is_corrupted_ours_is_orthonormal():
    """The shipped pickle's rec16 has scattered sign flips (different per
    color channel) and is NOT orthonormal — the analytic basis is the
    correct wavelet packet. Recorded here so the divergence is explicit."""
    import pickle
    from rumpy_tpu.models.wavelet import wavelet_basis
    with open(PKL, "rb") as f:
        d = pickle.load(f, encoding="latin1")
    per_ch = d["rec16"].reshape(3, 256, 16, 16)
    mine = wavelet_basis(16)
    diffs = [(per_ch[c] != mine).sum() for c in range(3)]
    assert all(0 < n < 64 for n in diffs), diffs  # a handful of entries
    assert not np.array_equal(per_ch[0], per_ch[1])  # corruption, not design
    m_ref = per_ch[0].reshape(256, 256)
    assert not np.allclose(m_ref @ m_ref.T, np.eye(256), atol=1e-5)
    m = mine.reshape(256, 256)
    np.testing.assert_allclose(m @ m.T, np.eye(256), atol=1e-6)


def test_wavelet_transform_matches_reference(rng):
    import torch
    arch = _load("ref_wavelet_arch", f"{REF}/waveletnets/architectures.py")
    from rumpy_tpu.models.wavelet import wavelet_dec, wavelet_rec

    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    dec = arch.WaveletTransform(scale=4, dec=True, params_path=PKL)
    rec = arch.WaveletTransform(scale=4, dec=False, params_path=PKL)
    with torch.no_grad():
        ref_w = dec(torch.from_numpy(x)).numpy()
        ref_x = rec(torch.from_numpy(ref_w)).numpy()
    got_w = np.asarray(wavelet_dec(x.transpose(0, 2, 3, 1), 4))
    np.testing.assert_allclose(got_w.transpose(0, 3, 1, 2), ref_w,
                               atol=1e-5)
    got_x = np.asarray(wavelet_rec(got_w, 4))
    np.testing.assert_allclose(got_x.transpose(0, 3, 1, 2), ref_x,
                               atol=1e-5)
    np.testing.assert_allclose(got_x.transpose(0, 3, 1, 2), x, atol=1e-5)


def test_wavelet_losses_match_reference(rng):
    import torch
    arch = sys.modules.get("ref_wavelet_arch") or _load(
        "ref_wavelet_arch", f"{REF}/waveletnets/architectures.py")
    from rumpy_tpu.models.wavelet import loss_mse_ref, loss_textures

    # NCHW for torch; NHWC filter-major for ours — the texture loss's
    # band grouping must agree (torch view(B,-1,3,H,W) groups 3 channels)
    x = rng.random((2, 45, 4, 4)).astype(np.float32)
    y = rng.random((2, 45, 4, 4)).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    np.testing.assert_allclose(
        float(loss_mse_ref(x, y)), float(arch.loss_MSE(tx, ty)), rtol=1e-5)
    np.testing.assert_allclose(
        float(loss_mse_ref(x, y, size_average=True)),
        float(arch.loss_MSE(tx, ty, size_average=True)), rtol=1e-5)
    xh = np.ascontiguousarray(x.transpose(0, 2, 3, 1))
    yh = np.ascontiguousarray(y.transpose(0, 2, 3, 1))
    # torch's view(B,-1,3,H,W) groups [f,3] along NCHW channels ==
    # NHWC last-axis reshape(...,-1,3) only if channel layout is
    # filter-major in both; ours is, torch's is — but the *element sets*
    # per band differ between layouts, so compare via the same layout:
    # move NHWC back to NCHW ordering for the reference call.
    np.testing.assert_allclose(
        float(loss_textures(xh, yh)),
        float(arch.loss_Textures(tx, ty)), rtol=2e-5)


def test_waveletsrnet_forward_parity(rng):
    import torch
    import jax.numpy as jnp
    arch = sys.modules.get("ref_wavelet_arch") or _load(
        "ref_wavelet_arch", f"{REF}/waveletnets/architectures.py")
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = arch.WaveletSRNet(scale=4, num_layers_res=1)
    net.eval()
    h = get_model("waveletsrnet")(scale=4, num_layers_res=1)
    state = h.init_state()
    sd = {k: v for k, v in net.state_dict().items()
          if not k.startswith("wavelet_rec")}
    params = convert_by_order(sd, state.params)

    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_w, ref_img = net(torch.from_numpy(x), train=True)
    got_w, got_img = h.module.apply(
        {"params": params,
         "batch_stats": state.extra["vars"]["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
        return_wavelets=True)
    np.testing.assert_allclose(np.asarray(got_w).transpose(0, 3, 1, 2),
                               ref_w.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_img).transpose(0, 3, 1, 2),
                               ref_img.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# DIC
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_dic():
    import torch

    # torchvision may be absent; modules/architecture.py imports it
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.models = types.SimpleNamespace(
                vgg19=lambda **k: None, vgg19_bn=lambda **k: None)
            sys.modules["torchvision"] = tv

    for pkg in ["rumpy", "rumpy.SISR", "rumpy.SISR.models",
                "rumpy.SISR.models.DICnets",
                "rumpy.SISR.models.DICnets.modules"]:
        _pkg(pkg)
    base = "rumpy.SISR.models.DICnets"
    _load(f"{base}.blocks", f"{REF}/DICnets/blocks.py")
    _load(f"{base}.modules.StackedHourGlass",
          f"{REF}/DICnets/modules/StackedHourGlass.py")
    _load(f"{base}.modules.light_cnn",
          f"{REF}/DICnets/modules/light_cnn.py")
    _load(f"{base}.modules.unet", f"{REF}/DICnets/modules/unet.py")
    _load(f"{base}.modules.architecture",
          f"{REF}/DICnets/modules/architecture.py")
    _load(f"{base}.srfbn_arch", f"{REF}/DICnets/srfbn_arch.py")
    _load(f"{base}.srfbn_hg_arch", f"{REF}/DICnets/srfbn_hg_arch.py")
    dic = _load(f"{base}.DIC_architecture",
                f"{REF}/DICnets/DIC_architecture.py")
    return dic, torch


def _reorder_dic_state(sd, groups):
    """Reorder the torch DIC state dict into this port's parameter call
    order (projection groups interleave up/down/transition blocks; the
    top level calls out/conv_out/HG between first_block and block)."""
    keys = list(sd)

    def take(prefix):
        return [k for k in keys if k.startswith(prefix)]

    def fb(prefix, attention):
        out = take(prefix + "compress_in.")
        if attention:
            out += take(prefix + "fusion_block.")
        for idx in range(groups):
            if idx > 0:
                out += take(f"{prefix}uptranBlocks.{idx - 1}.")
            out += take(f"{prefix}upBlocks.{idx}.")
            if idx > 0:
                out += take(f"{prefix}downtranBlocks.{idx - 1}.")
            out += take(f"{prefix}downBlocks.{idx}.")
        return out + take(prefix + "compress_out.")

    # flax flattens dicts key-sorted; the port's explicit layer names make
    # sorted order == call order inside each module, and the top level
    # sorts as: block, conv_in, conv_out, first_block, hg, out_deconv.
    order = (fb("block.", True) + take("conv_in.") + take("conv_out.")
             + fb("first_block.", False) + take("HG.") + take("out."))
    assert sorted(order) == sorted(keys), "reorder lost keys"
    return {k: sd[k] for k in order}


def test_dic_forward_parity(ref_dic, rng):
    dicm, torch = ref_dic
    import jax.numpy as jnp
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = dicm.DIC(device=torch.device("cpu"), scale=4, in_channels=3,
                   out_channels=3, num_groups=2, hg_num_feature=16,
                   hg_num_keypoints=68, num_steps=2, num_features=8,
                   detach_attention=False, num_fusion_block=1)
    net.eval()

    h = get_model("dic")(scale=4, num_steps=2, num_features=8,
                         num_groups=2, hg_num_feature=16,
                         hg_num_keypoints=68, num_fusion_block=1)
    state = h.init_state()
    params = convert_by_order(_reorder_dic_state(net.state_dict(), 2),
                              state.params)

    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        # reset feedback state the way the torch handler's fresh pass does
        net.block.should_reset = False
        ref_srs, ref_hms = net(torch.from_numpy(x))
    got_srs, got_hms = h.module.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got_srs) == len(ref_srs) == 2
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got_srs[i]).transpose(0, 3, 1, 2),
            ref_srs[i].numpy(), atol=3e-4, err_msg=f"sr step {i}")
        np.testing.assert_allclose(
            np.asarray(got_hms[i]).transpose(0, 3, 1, 2),
            ref_hms[i].numpy(), atol=3e-4, err_msg=f"heatmap step {i}")


def test_dic_heatmap_render_matches_reference_formula(rng):
    """render_heatmaps == handlers.py:44-55 _generate_one_heatmap,
    vectorized: exp(-((x-lx)^2 + (y-ly)^2) / (2 sigma^2))."""
    from rumpy_tpu.models.dic import render_heatmaps
    coords = (rng.random((2, 5, 2)) * 12).astype(np.float32)
    got = np.asarray(render_heatmaps(coords, 12, 12, sigma=1.0))
    xx, yy = np.meshgrid(np.arange(12), np.arange(12))
    for b in range(2):
        for k in range(5):
            d2 = (xx - coords[b, k, 0]) ** 2 + (yy - coords[b, k, 1]) ** 2
            np.testing.assert_allclose(got[b, :, :, k],
                                       np.exp(-d2 / 2.0), atol=1e-6)


def test_merge_heatmap_5_matches_reference(ref_dic, rng):
    dicm, torch = ref_dic
    import jax.numpy as jnp
    from rumpy_tpu.models.dic import merge_heatmap_5
    hg = sys.modules["rumpy.SISR.models.DICnets.srfbn_hg_arch"]
    hm = rng.random((2, 68, 6, 6)).astype(np.float32)
    with torch.no_grad():
        ref = hg.merge_heatmap_5(torch.from_numpy(hm), False).numpy()
    got = np.asarray(merge_heatmap_5(
        jnp.asarray(hm.transpose(0, 2, 3, 1)), False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# FSSR (DSGAN + filters)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def ref_dsgan():
    import torch
    m = _load("ref_models_dsgan",
              f"{REF}/implicit_blind_sr/fssr_modules/models_dsgan.py")
    return m, torch


def test_fssr_filters_match_reference(ref_dsgan, rng):
    m, torch = ref_dsgan
    from rumpy_tpu.models.fssr import filter_high, filter_low
    x = rng.random((2, 3, 12, 12)).astype(np.float32)
    tx = torch.from_numpy(x)
    xh = x.transpose(0, 2, 3, 1)
    with torch.no_grad():
        ref_low = m.FilterLow()(tx).numpy()
        ref_low_np = m.FilterLow(padding=False)(tx).numpy()
        ref_high = m.FilterHigh()(tx).numpy()
        ref_high_ip = m.FilterHigh(include_pad=False)(tx).numpy()
    np.testing.assert_allclose(
        np.asarray(filter_low(xh)).transpose(0, 3, 1, 2), ref_low,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(filter_low(xh, padding=False)).transpose(0, 3, 1, 2),
        ref_low_np, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(filter_high(xh)).transpose(0, 3, 1, 2), ref_high,
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(filter_high(xh, include_pad=False)
                   ).transpose(0, 3, 1, 2), ref_high_ip, atol=1e-6)


def test_dsgan_generator_forward_parity(ref_dsgan, rng):
    m, torch = ref_dsgan
    import jax.numpy as jnp
    from rumpy_tpu.models.fssr import DSGANGenerator
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = m.Generator(n_res_blocks=2)
    net.eval()
    mod = DSGANGenerator(n_res_blocks=2)
    x = rng.random((1, 3, 10, 10)).astype(np.float32)
    variables = mod.init(__import__("jax").random.PRNGKey(0),
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
    params = convert_by_order(net.state_dict(), variables["params"])
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(mod.apply({"params": params},
                               jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_dsgan_discriminator_forward_parity(ref_dsgan, rng):
    m, torch = ref_dsgan
    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.fssr import DSGANDiscriminator
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = m.Discriminator()
    net.eval()
    mod = DSGANDiscriminator()
    x = rng.random((1, 3, 12, 12)).astype(np.float32)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), xh, train=False)
    params = convert_by_order(net.state_dict(), variables["params"])
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    got = np.asarray(mod.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        xh, train=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-5)
