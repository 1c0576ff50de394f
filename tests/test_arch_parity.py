"""Cross-framework ARCHITECTURE parity: instantiate the reference's torch
networks (loaded directly from /root/reference), copy their weights into
our flax models via convert_by_order, and compare forward outputs on the
same input. This proves the compute graphs are the same function — the
strongest parity check available without the Zenodo checkpoints."""

import sys
import types

import numpy as np
import pytest

REF = "/root/reference/rumpy/SISR/models"


@pytest.fixture(scope="module")
def ref_arch():
    import torch  # real torch first

    # stub missing optional deps of the reference architectures module
    class _AnyObj:
        def __call__(self, *a, **k):
            return self

        def __getattr__(self, n):
            return self

    timm = types.ModuleType("timm")
    timm_m = types.ModuleType("timm.models")
    timm_l = types.ModuleType("timm.models.layers")
    timm_l.DropPath = object
    timm_l.to_2tuple = lambda x: (x, x)
    timm_l.trunc_normal_ = lambda *a, **k: None
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_m)
    sys.modules.setdefault("timm.models.layers", timm_l)

    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    # build the package skeleton the relative imports expect
    for pkg in ["rumpy", "rumpy.SISR", "rumpy.SISR.models",
                "rumpy.SISR.models.advanced",
                "rumpy.SISR.models.basic",
                "rumpy.SISR.models.attention_manipulators"]:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))

    load("rumpy.SISR.models.attention_manipulators.q_layer",
         f"{REF}/attention_manipulators/q_layer.py")

    load("rumpy.SISR.models.advanced.common", f"{REF}/advanced/common.py")
    load("rumpy.SISR.models.advanced.SRMD_blocks",
         f"{REF}/advanced/SRMD_blocks.py")
    load("rumpy.SISR.models.advanced.HAN_blocks",
         f"{REF}/advanced/HAN_blocks.py")
    load("rumpy.SISR.models.advanced.mpncov",
         f"{REF}/advanced/mpncov.py")
    load("rumpy.SISR.models.advanced.SAN_blocks",
         f"{REF}/advanced/SAN_blocks.py")
    load("rumpy.SISR.models.advanced.ELAN_blocks",
         f"{REF}/advanced/ELAN_blocks.py")
    arch = load("ref_advanced_architectures",
                f"{REF}/advanced/architectures.py")
    basic = load("ref_basic_architectures", f"{REF}/basic/architectures.py")
    return arch, basic, torch


def _compare(torch_net, flax_handler, x_nchw, torch_forward=None, atol=2e-4):
    import jax.numpy as jnp
    import torch
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch_net.eval()
    with torch.no_grad():
        fwd = torch_forward or torch_net.forward
        ref = fwd(torch.from_numpy(x_nchw)).numpy()

    state = flax_handler.init_state()
    params = convert_by_order(torch_net.state_dict(), state.params)
    state = state.replace(params=params)
    x_nhwc = jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(flax_handler.run_eval(state, {"lr": x_nhwc}))
    got_nchw = got.transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_nchw, ref, atol=atol)


def test_srcnn_forward_parity(ref_arch, rng):
    _, basic, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = basic.SRCNN()
    h = get_model("srcnn")(scale=2)
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    _compare(net, h, x)


def test_vdsr_forward_parity(ref_arch, rng):
    _, basic, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = basic.VDSR(kernel_pattern=[3] * 5,
                     channel_pattern=[1] + [16] * 4 + [1],
                     padding="same")
    h = get_model("vdsr")(scale=2, kernel_pattern=[3] * 5,
                          channel_pattern=[1] + [16] * 4 + [1])
    x = rng.random((1, 1, 16, 16)).astype(np.float32)
    _compare(net, h, x)


def test_edsr_forward_parity(ref_arch, rng):
    arch, _, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = arch.EDSR(scale=2, net_features=16, num_blocks=3, res_scale=0.1)
    h = get_model("edsr")(scale=2, num_features=16, num_blocks=3,
                          res_scale=0.1)
    x = rng.random((1, 3, 12, 12)).astype(np.float32)
    _compare(net, h, x)


def test_rcan_forward_parity(ref_arch, rng):
    arch, _, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = arch.RCAN(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16)
    h = get_model("rcan")(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16)
    x = rng.random((1, 3, 12, 12)).astype(np.float32)
    _compare(net, h, x)


def test_rcan_x4_forward_parity(ref_arch, rng):
    arch, _, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = arch.RCAN(scale=4, n_resblocks=1, n_resgroups=1, n_feats=16)
    h = get_model("rcan")(scale=4, n_resblocks=1, n_resgroups=1, n_feats=16)
    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    _compare(net, h, x)
