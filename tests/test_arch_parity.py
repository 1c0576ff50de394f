"""Cross-framework ARCHITECTURE parity: instantiate the reference's torch
networks (loaded directly from /root/reference), copy their weights into
our flax models via convert_by_order, and compare forward outputs on the
same input. This proves the compute graphs are the same function — the
strongest parity check available without the Zenodo checkpoints."""

import re
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


def test_han_forward_parity(ref_arch, rng):
    arch, _, torch = ref_arch
    from rumpy_tpu.registry import get_model
    # the reference HAN's post-LAM conv is hard-wired for 10 resgroups
    # (advanced/architectures.py: conv(n_feats*11, n_feats)), so parity
    # must use 10 groups — kept tiny via n_feats/n_resblocks
    net = arch.HAN(scale=2, n_resblocks=1, n_resgroups=10, n_feats=16,
                   reduction=4)
    h = get_model("han")(scale=2, n_resblocks=1, n_resgroups=10,
                         n_feats=16, reduction=4)
    x = rng.random((1, 3, 12, 12)).astype(np.float32)

    # torch registers csa/la before last_conv; flax creation order is
    # head, body, la, last_conv, csa, last, tail — reorder the torch
    # state dict to the flax order before the order-zip conversion
    sd = net.state_dict()
    ordered = {}
    for k in sd:
        if k.startswith("head") or k.startswith("body"):
            ordered[k] = sd[k]
    ordered["la.gamma"] = sd["la.gamma"]
    for k in ("last_conv.weight", "last_conv.bias", "csa.gamma",
              "csa.conv.weight", "csa.conv.bias", "last.weight",
              "last.bias"):
        ordered[k] = sd[k]
    for k in sd:
        if k.startswith("tail"):
            ordered[k] = sd[k]

    import types as _types
    reordered_net = types.SimpleNamespace(
        eval=net.eval, forward=net.forward,
        state_dict=lambda: ordered)
    _compare(reordered_net, h, x)


def test_rrdbnet_forward_parity(ref_arch, rng):
    """ESRGAN/Real-ESRGAN generator parity (non_blind_gan_models/
    generators.py:122+)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_gan_generators",
        f"{REF}/non_blind_gan_models/generators.py")
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    from rumpy_tpu.models.gan_models import RRDBNet
    import jax
    import jax.numpy as jnp
    import torch
    from rumpy_tpu.utils.torch_convert import convert_by_order

    for scale, hw in ((4, 8), (2, 8), (1, 8)):
        net = gen.RRDBNet(scale=scale, num_feat=16, num_block=2,
                          num_grow_ch=8)
        net.eval()
        x = rng.random((1, 3, hw, hw)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        mod = RRDBNet(scale=scale, nf=16, nb=2, gc=8)
        variables = mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, hw, hw, 3)))
        params = convert_by_order(net.state_dict(), variables["params"])
        got = np.asarray(mod.apply({"params": params},
                                   jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=2e-4)


def _reorder_qrcan_state(sd):
    """Sort the reference QRCAN state dict into flax creation order:
    torch registers each module's attention nodes before its conv body
    (QRCAB: final_body/pa/q before body; QResidualGroup & QRCAN:
    final_body before body/head)."""
    TOP = {"head": 0, "body": 1, "final_body": 2, "tail": 3}
    GROUP = {"body": 0, "final_body": 1}
    RCAB = {"body": 0, "final_body": 1, "pa_node": 2, "q_node": 3,
            "dgfmb_node": 4, "da_node": 5, "sft_node": 6}

    def sort_key(item):
        idx, key = item
        p = key.split(".")
        if p[0] != "body":
            return (TOP.get(p[0], 9), 0, 0, 0, 0, idx)
        g = int(p[1])
        if p[2] not in GROUP:
            return (TOP["body"], g, 9, 0, 0, idx)
        if p[2] == "final_body":
            return (TOP["body"], g, 1, 0, 0, idx)
        b = int(p[3])
        return (TOP["body"], g, 0, b, RCAB.get(p[4], 9), idx)

    items = sorted(enumerate(sd.keys()), key=sort_key)
    return {k: sd[k] for _, k in items}


def test_qrcan_forward_parity(ref_arch, rng):
    """Flagship meta-attention architecture parity: QRCAN with channel
    attention + q-layers + pixel attention, converted weights, outputs
    bit-close (attention_manipulators/architectures.py:313-452)."""
    arch, _, torch = ref_arch
    import importlib.util
    import types as _t

    sys.modules["rumpy.SISR.models.advanced.architectures"] = arch
    sys.modules["rumpy.SISR.models.advanced"].common = \
        sys.modules["rumpy.SISR.models.advanced.common"]
    for pkg in ["rumpy.SISR.models.SFTMD_variants",
                "rumpy.SISR.models.non_blind_gan_models"]:
        sys.modules.setdefault(pkg, _t.ModuleType(pkg))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("rumpy.SISR.models.attention_manipulators.da_layer",
         f"{REF}/attention_manipulators/da_layer.py")
    load("rumpy.SISR.models.attention_manipulators.dgfmb_layer",
         f"{REF}/attention_manipulators/dgfmb_layer.py")
    load("rumpy.SISR.models.attention_manipulators.qsan_blocks",
         f"{REF}/attention_manipulators/qsan_blocks.py")
    load("rumpy.SISR.models.SFTMD_variants.architectures",
         f"{REF}/SFTMD_variants/architectures.py")
    load("rumpy.SISR.models.non_blind_gan_models.generators",
         f"{REF}/non_blind_gan_models/generators.py")
    qarch = load("ref_q_architectures",
                 f"{REF}/attention_manipulators/architectures.py")

    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.attention_manipulators import QRCAN
    from rumpy_tpu.utils.torch_convert import convert_by_order

    for style in ("modulate", "max_concat"):
        # 'modulate' multiplies the attention vector elementwise by the
        # metadata, so it needs an n_feats-sized vector (the handler's
        # scale_qpi expansion); concat styles take any width
        n_meta = 16 if style == "modulate" else 4
        net = qarch.QRCAN(scale=2, n_resblocks=2, n_resgroups=2,
                          n_feats=16, reduction=16, style=style,
                          num_metadata=n_meta, include_q_layer=True,
                          include_pixel_attention=True)
        net.eval()
        x = rng.random((1, 3, 8, 8)).astype(np.float32)
        meta = rng.random((1, n_meta)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x),
                      torch.from_numpy(meta[..., None, None])).numpy()
        mod = QRCAN(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16,
                    reduction=16, style=style, num_metadata=n_meta,
                    include_q_layer=True, include_pixel_attention=True)
        variables = mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8, 8, 3)),
                             jnp.zeros((1, n_meta)))
        params = convert_by_order(_reorder_qrcan_state(net.state_dict()),
                                  variables["params"])
        got = np.asarray(mod.apply({"params": params},
                                   jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   jnp.asarray(meta)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=2e-4, err_msg=style)


def _reorder_elan_state(sd):
    """Torch ELAN state dict -> flax creation order. Drops the fixed
    (non-trainable) pieces: MeanShift convs (constants in our module) and
    the ShiftConv2d1 depthwise shift mask (expressed as pad+slice)."""
    items = [(k, v) for k, v in sd.items()
             if not k.startswith(("sub_mean", "add_mean"))
             and not k.endswith("shift_conv.weight")]
    return dict(items)


def test_elan_forward_parity(ref_arch, rng):
    """ELAN parity: shift-conv (masked-conv shifts), group multi-scale
    window attention with shared attention maps, BatchNorm projection,
    mean-shift (advanced/architectures.py:446-530, ELAN_blocks.py)."""
    arch, _, torch = ref_arch
    from rumpy_tpu.registry import get_model
    net = arch.ELAN(scale=2, colors=3, window_sizes=[4, 8, 16],
                    m_elan=4, c_elan=30, n_share=0, r_expand=2)
    net.eval()
    h = get_model("elan")(scale=2, window_sizes=(4, 8, 16), m_elan=4,
                          c_elan=30, n_share=0, r_expand=2)
    x = rng.random((1, 3, 16, 16)).astype(np.float32)

    import jax.numpy as jnp
    import torch as _t
    from rumpy_tpu.utils.torch_convert import convert_by_order
    with _t.no_grad():
        ref = net(_t.from_numpy(x)).numpy()
    state = h.init_state()
    params = convert_by_order(_reorder_elan_state(net.state_dict()),
                              state.params)
    state = state.replace(params=params)
    got = np.asarray(h.run_eval(state, {"lr": jnp.asarray(
        x.transpose(0, 2, 3, 1))}))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=3e-4)


def _reorder_san_state(sd):
    """Torch SAN state dict -> flax first-call order:
    head -> gamma -> non-local (g, theta, phi, W) -> residual groups ->
    tail. Drops dead parameters the reference never uses in forward:
    per-group LSRAG.gamma, the top-level conv_last, and Nonlocal_CA's
    unused inner SOCA."""
    sd = {k: v for k, v in sd.items()
          if not re.match(r"RG\.\d+\.gamma$", k)
          and not k.startswith("conv_last.")
          and not k.startswith("non_local.soca.")}
    head = [k for k in sd if k.startswith("head.")]
    gamma = ["gamma"]
    # torch wraps g/phi in Sequential(conv, maxpool) -> '.0' key segment
    nl = ["non_local.non_local." + p + s
          for p in ("g.0", "theta", "phi.0", "W")
          for s in (".weight", ".bias")]
    rg = [k for k in sd if k.startswith("RG.")]
    tail = [k for k in sd if k.startswith("tail.")]
    ordered = head + gamma + nl + rg + tail
    assert sorted(ordered) == sorted(sd), (set(sd) ^ set(ordered))
    return {k: sd[k] for k in ordered}


def test_san_forward_parity(ref_arch, rng):
    """SAN parity: MPN-COV Newton-Schulz covariance sqrt (SOCA),
    embedded-gaussian non-local over quadrants, share-source skips
    (advanced/architectures.py:260-331, SAN_blocks.py, mpncov.py)."""
    arch, _, torch = ref_arch
    import re as _re  # noqa: F401
    from rumpy_tpu.registry import get_model
    net = arch.SAN(scale=2, n_resgroups=2, n_resblocks=2, n_feats=16,
                   reduction=8)
    net.eval()
    h = get_model("san")(scale=2, n_resgroups=2, n_resblocks=2,
                         n_feats=16, reduction=8)
    x = rng.random((1, 3, 12, 12)).astype(np.float32)

    import jax.numpy as jnp
    import torch as _t
    from rumpy_tpu.utils.torch_convert import convert_by_order
    with _t.no_grad():
        ref = net(_t.from_numpy(x)).numpy()
    state = h.init_state()
    params = convert_by_order(_reorder_san_state(net.state_dict()),
                              state.params)
    state = state.replace(params=params)
    got = np.asarray(h.run_eval(state, {"lr": jnp.asarray(
        x.transpose(0, 2, 3, 1))}))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=5e-4)


def _load_ref_swinir():
    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    return load("ref_swinir_architectures",
                f"{REF}/swinIR/architectures.py")


def _reorder_swinir_state(sd):
    """Drop registered buffers (relative_position_index, attn_mask) and
    move each attention's relative_position_bias_table after its qkv
    (flax insertion order is first-call order: qkv, bias table, proj)."""
    sd = {k: v for k, v in sd.items()
          if "relative_position_index" not in k and "attn_mask" not in k}
    keys = list(sd)
    out = []
    i = 0
    while i < len(keys):
        k = keys[i]
        if k.endswith("attn.relative_position_bias_table"):
            # qkv.weight, qkv.bias follow; emit them first. The table is
            # 2-D so the order-zip converter will transpose it as a
            # 'linear' — pre-transpose so it lands in the torch layout
            # ((2w-1)^2, heads), which is what our module indexes.
            sd[k] = sd[k].t()
            out.extend([keys[i + 1], keys[i + 2], k])
            i += 3
        else:
            out.append(k)
            i += 1
    return {k: sd[k] for k in out}


def test_swinir_forward_parity(ref_arch, rng):
    """SwinIR parity: shifted-window MSA with relative position bias,
    patch-embed/final LayerNorms, mean shift, nearest+conv and
    pixelshuffle reconstruction heads (swinIR/architectures.py:607-817).
    drop_path_rate=0 (the stubbed timm DropPath is never instantiated;
    eval-mode drop-path is identity anyway)."""
    _, _, torch = ref_arch
    swin = _load_ref_swinir()
    import jax.numpy as jnp
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    for upsampler, scale in [("nearest+conv", 4), ("pixelshuffle", 2),
                             ("pixelshuffledirect", 2)]:
        torch.manual_seed(0)
        net = swin.SwinIR(upscale=scale, img_size=8, in_chans=3,
                          window_size=4, img_range=1.0, depths=[2, 2],
                          embed_dim=12, num_heads=[2, 2], mlp_ratio=2,
                          drop_path_rate=0.0, upsampler=upsampler,
                          resi_connection="1conv")
        net.eval()
        h = get_model("swinir")(scale=scale, embed_dim=12, depths=(2, 2),
                                num_heads=(2, 2), window_size=4,
                                mlp_ratio=2.0, upsampler=upsampler)
        x = rng.random((1, 3, 8, 8)).astype(np.float32)
        with torch.no_grad():
            ref = net(torch.from_numpy(x)).numpy()
        state = h.init_state()
        params = convert_by_order(_reorder_swinir_state(net.state_dict()),
                                  state.params)
        state = state.replace(params=params)
        got = np.asarray(h.run_eval(state, {"lr": jnp.asarray(
            x.transpose(0, 2, 3, 1))}))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=3e-4, err_msg=upsampler)


def test_dan_v1_forward_parity(ref_arch, rng):
    """DAN v1 parity: alternating Estimator/Restorer with PCA-encoded
    init kernel map and stop-gradients between the halves
    (blur_kernel_blind_sr/DANv1.py). PCA matrix: the reference's shipped
    Set5 blind-set matrix."""
    _, _, torch = ref_arch
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_danv1", f"{REF}/blur_kernel_blind_sr/DANv1.py")
    danm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(danm)

    import jax.numpy as jnp
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    pca = ("/root/reference/Data/example_data/Set5/lr_random_blur/"
           "pca_matrix.pth")
    torch.manual_seed(0)
    net = danm.DAN(nf=16, nb=2, upscale=4, input_para=10, kernel_size=21,
                   loop=2, pca_matrix_path=pca)
    net.eval()
    ikm = tuple(float(v) for v in net.init_ker_map.numpy()[0])

    h = get_model("dan")(mode="v1", scale=4, nf=16, nb=2, loop=2,
                         init_ker_map=ikm)
    state = h.init_state()
    sd = {k: v for k, v in net.state_dict().items()
          if k not in ("encoder", "init_kernel", "init_ker_map")}
    params = convert_by_order(sd, state.params)

    x = rng.random((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref_srs, ref_kms = net(torch.from_numpy(x))
    got_srs, got_kms = h.module.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got_srs) == len(ref_srs) == 2
    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(got_srs[i]).transpose(0, 3, 1, 2),
            ref_srs[i].numpy(), atol=3e-4, err_msg=f"sr iter {i}")
        np.testing.assert_allclose(np.asarray(got_kms[i]),
                                   ref_kms[i].numpy(), atol=3e-4,
                                   err_msg=f"kernel iter {i}")


def _reorder_sftmd_state(sd):
    """Torch registers each block's (sft1, sft2, conv1, conv2); flax call
    order is sft1, conv1, sft2, conv2."""
    keys = list(sd)
    out, i = [], 0
    while i < len(keys):
        k = keys[i]
        if ".sft1." in k:
            block = k.split(".sft1.")[0]
            sft1 = [q for q in keys if q.startswith(block + ".sft1.")]
            sft2 = [q for q in keys if q.startswith(block + ".sft2.")]
            convs = [q for q in keys if q.startswith(block + ".conv")]
            assert len(convs) == 4
            out.extend(sft1 + convs[:2] + sft2 + convs[2:])
            i += len(sft1) + len(sft2) + 4
        else:
            out.append(k)
            i += 1
    assert sorted(out) == sorted(keys)
    return {k: sd[k] for k in out}


def test_sftmd_forward_parity(ref_arch, rng):
    """SFTMD parity across SFT layer types (SFTMD_variants/
    architectures.py). The reference net takes pre-tiled (B,P,H,W)
    metadata maps; ours takes the (B,P) vector and tiles internally."""
    _, _, torch = ref_arch
    import importlib.util
    import types as _t
    sys.modules.setdefault("rumpy.SISR.models.SFTMD_variants",
                           _t.ModuleType("rumpy.SISR.models.SFTMD_variants"))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "rumpy.SISR.models.attention_manipulators.da_layer" not in sys.modules:
        load("rumpy.SISR.models.attention_manipulators.da_layer",
             f"{REF}/attention_manipulators/da_layer.py")
    sft = load("ref_sftmd_architectures",
               f"{REF}/SFTMD_variants/architectures.py")

    import jax.numpy as jnp
    from rumpy_tpu.models.sftmd_variants import SFTMD
    from rumpy_tpu.utils.torch_convert import convert_by_order

    for sft_type in ("standard", "concat", "split", "weak"):
        # 'weak' multiplies features by the maps elementwise, so it needs
        # para == nf (the reference uses it with expanded metadata)
        para = 16 if sft_type == "weak" else 10
        torch.manual_seed(0)
        net = sft.SFTMD(num_features=16, num_blocks=2, scale=4,
                        input_para=para, SFT_type=sft_type, split="22")
        net.eval()
        mod = SFTMD(scale=4, num_features=16, num_blocks=2,
                    input_para=para, sft_type=sft_type, split="22")
        x = rng.random((1, 3, 8, 8)).astype(np.float32)
        meta = rng.random((1, para)).astype(np.float32)
        maps = np.broadcast_to(meta[:, :, None, None],
                               (1, para, 8, 8)).copy()
        with torch.no_grad():
            ref = net(torch.from_numpy(x), torch.from_numpy(maps)).numpy()
        import jax
        variables = mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 8, 8, 3)),
                             jnp.zeros((1, para)))
        params = convert_by_order(_reorder_sftmd_state(net.state_dict()),
                                  variables["params"])
        got = np.asarray(mod.apply({"params": params},
                                   jnp.asarray(x.transpose(0, 2, 3, 1)),
                                   jnp.asarray(meta)))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=3e-4, err_msg=sft_type)


def test_dasr_encoder_forward_parity(ref_arch, rng):
    """DASR contrastive encoder parity (regression/models/
    contrastive_learning/encoding_models.py:5-55): 6 conv+BN+lrelu stages,
    GAP, projection MLP, optional dropdown head."""
    _, _, torch = ref_arch
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_encoding_models",
        "/root/reference/rumpy/regression/models/contrastive_learning/"
        "encoding_models.py")
    enc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(enc)

    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.contrastive import DASREncoder
    from rumpy_tpu.utils.torch_convert import convert_by_order

    for dropdown in (None, 5):
        torch.manual_seed(0)
        net = enc.Encoder(dropdown_q=dropdown)
        net.eval()
        x = rng.random((2, 3, 16, 16)).astype(np.float32)
        with torch.no_grad():
            ref_fea, ref_out = net(torch.from_numpy(x))
        mod = DASREncoder(dropdown_q=dropdown)
        variables = mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 3)))
        params = convert_by_order(net.state_dict(), variables["params"])
        got_fea, got_out = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(got_fea), ref_fea.numpy(),
                                   atol=3e-4)
        np.testing.assert_allclose(np.asarray(got_out["q"]),
                                   ref_out["q"].numpy(), atol=3e-4)
        if dropdown:
            np.testing.assert_allclose(
                np.asarray(got_out["dropdown_q"]),
                ref_out["dropdown_q"].numpy(), atol=3e-4)


def test_sparnet_forward_parity(ref_arch, rng):
    """SPARNet + QSPARNet parity (SPARNet/{architectures,blocks}.py):
    preact residual blocks with recursive hourglass spatial attention,
    reflect-padded convs, BN, channel-clip schedule; Q variant injects
    metadata via ParaCALayer in every block."""
    _, _, torch = ref_arch
    import importlib.util
    import types as _t

    sys.modules.setdefault("rumpy.SISR.models.SPARNet",
                           _t.ModuleType("rumpy.SISR.models.SPARNet"))

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load("rumpy.SISR.models.SPARNet.blocks", f"{REF}/SPARNet/blocks.py")
    # architectures.py uses a relative import; load as a package member
    spec = importlib.util.spec_from_file_location(
        "rumpy.SISR.models.SPARNet.architectures",
        f"{REF}/SPARNet/architectures.py")
    sparch = importlib.util.module_from_spec(spec)
    sys.modules["rumpy.SISR.models.SPARNet.architectures"] = sparch
    spec.loader.exec_module(sparch)

    import jax.numpy as jnp
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    cfg = dict(min_ch=8, max_ch=16, in_size=32, out_size=32,
               min_feat_size=16, res_depth=1, bottleneck_size=16)
    x = rng.random((1, 3, 32, 32)).astype(np.float32)

    # plain SPARNet
    torch.manual_seed(0)
    net = sparch.SPARNet(**cfg)
    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    h = get_model("sparnet")(scale=1, **cfg)
    state = h.init_state()
    params = convert_by_order(net.state_dict(), state.params)
    state = state.replace(params=params)
    got = np.asarray(h.run_eval(state, {"lr": jnp.asarray(
        x.transpose(0, 2, 3, 1))}))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=3e-4)

    # QSPARNet with 10-dim metadata in every block
    torch.manual_seed(1)
    qnet = sparch.QSPARNet(metadata_count=10, **cfg)
    qnet.eval()
    meta = rng.random((1, 10)).astype(np.float32)
    with torch.no_grad():
        qref = qnet(torch.from_numpy(x),
                    torch.from_numpy(meta[..., None, None])).numpy()
    qh = get_model("qsparnet")(scale=1, metadata_bypass_len=10, **cfg)
    qstate = qh.init_state()
    qparams = convert_by_order(qnet.state_dict(), qstate.params)
    qstate = qstate.replace(params=qparams)
    qgot = np.asarray(qh.run_eval(qstate, {
        "lr": jnp.asarray(x.transpose(0, 2, 3, 1)),
        "metadata": jnp.asarray(meta)}))
    np.testing.assert_allclose(qgot.transpose(0, 3, 1, 2), qref,
                               atol=3e-4)


def test_rcan_one_training_step_parity(ref_arch, rng):
    """Beyond forward parity: ONE full training step (forward, L1 loss,
    backward, Adam update) produces the same loss and the same updated
    parameters as torch. This pins the gradient graph and the optimizer
    semantics (optax.adam == torch.optim.Adam: bias correction, eps
    outside the sqrt), not just the forward function."""
    arch, _, torch = ref_arch
    import jax
    import jax.numpy as jnp
    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = arch.RCAN(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)

    h = get_model("rcan")(scale=2, n_resblocks=2, n_resgroups=2,
                          n_feats=16, lr=1e-3)
    state = h.init_state()
    params = convert_by_order(net.state_dict(), state.params)
    state = state.replace(params=params)

    x = rng.random((2, 3, 12, 12)).astype(np.float32)
    y = rng.random((2, 3, 24, 24)).astype(np.float32)

    # torch step
    out = net(torch.from_numpy(x))
    loss = torch.nn.functional.l1_loss(out, torch.from_numpy(y))
    opt.zero_grad()
    loss.backward()
    opt.step()

    # jax step
    state2, losses = h.train_batch(
        state, {"lr": jnp.asarray(x.transpose(0, 2, 3, 1)),
                "hr": jnp.asarray(y.transpose(0, 2, 3, 1))})
    np.testing.assert_allclose(float(losses["train-loss"]),
                               float(loss.detach()), atol=1e-5)

    # updated parameters must match leaf-for-leaf. Convert the post-step
    # torch state into the ORIGINAL (insertion-ordered) template — the
    # jitted step returns key-sorted dicts — then align both trees via
    # jax's sorted flatten.
    updated = convert_by_order(net.state_dict(), params)
    flat_ref = jax.tree_util.tree_leaves(updated)
    flat_got = jax.tree_util.tree_leaves(state2.params)
    assert len(flat_ref) == len(flat_got)
    for a, b in zip(flat_got, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5)


def test_dasr_da_conv_forward_parity(ref_arch, rng):
    """DA_conv parity (blur_kernel_blind_sr/DASR.py:14-46): one predicted
    depthwise kernel per (example, channel) — groups=b*c — plus the
    channel-attention branch."""
    _, _, torch = ref_arch
    import importlib.util
    import sys
    import types

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    base = "/root/reference/rumpy"
    for pkg in ["rumpy.SISR.models.blur_kernel_blind_sr",
                "rumpy.regression", "rumpy.regression.models",
                "rumpy.regression.models.contrastive_learning"]:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    _load("rumpy.SISR.models.blur_kernel_blind_sr.dasr_common",
          f"{base}/SISR/models/blur_kernel_blind_sr/dasr_common.py")
    _load("rumpy.regression.models.contrastive_learning.encoding_models",
          f"{base}/regression/models/contrastive_learning/encoding_models.py")
    # DASR.py imports MoCo only for DASRPipeline (unused here) — stub it
    # instead of dragging in torchvision via base_models
    moco_stub = types.ModuleType(
        "rumpy.regression.models.contrastive_learning.moco")
    moco_stub.MoCo = object
    sys.modules["rumpy.regression.models.contrastive_learning.moco"] = \
        moco_stub
    dasrm = _load("ref_dasr_net",
                  f"{base}/SISR/models/blur_kernel_blind_sr/DASR.py")

    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.dasr import DAConv
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(0)
    net = dasrm.DA_conv(64, 64, 3, 8)
    net.eval()
    mod = DAConv(channels_out=64, kernel_size=3, reduction=8)

    x = rng.random((2, 64, 6, 6)).astype(np.float32)
    emb = rng.random((2, 64)).astype(np.float32)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = mod.init(jax.random.PRNGKey(0), xh, jnp.asarray(emb))
    params = convert_by_order(net.state_dict(), variables["params"])
    with torch.no_grad():
        ref = net([torch.from_numpy(x), torch.from_numpy(emb)]).numpy()
    got = np.asarray(mod.apply({"params": params}, xh, jnp.asarray(emb)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref, atol=2e-5)


def test_qcalayer_all_styles_parity(ref_arch, rng):
    """All 6 QCALayer fusion styles vs the reference module
    (architectures.py:41-150) — including the softmax style's
    sigmoid-then-softmax stack and mini_concat's ReLU over the
    features+metadata concat."""
    arch_mod, _, torch = ref_arch
    import importlib.util
    # alias the fixture-loaded advanced architectures under the rumpy.*
    # name the attention module imports, and load its layer deps
    sys.modules.setdefault("rumpy.SISR.models.advanced.architectures",
                           arch_mod)

    def _loadq(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    import types as _t
    for pkg in ("rumpy.SISR.models.SFTMD_variants",
                "rumpy.SISR.models.non_blind_gan_models"):
        sys.modules.setdefault(pkg, _t.ModuleType(pkg))
    for leaf in ("da_layer", "dgfmb_layer", "qsan_blocks"):
        _loadq(f"rumpy.SISR.models.attention_manipulators.{leaf}",
               f"{REF}/attention_manipulators/{leaf}.py")
    _loadq("rumpy.SISR.models.SFTMD_variants.architectures",
           f"{REF}/SFTMD_variants/architectures.py")
    _loadq("rumpy.SISR.models.non_blind_gan_models.generators",
           f"{REF}/non_blind_gan_models/generators.py")
    qarch = _loadq("ref_q_arch",
                   f"{REF}/attention_manipulators/architectures.py")

    import jax
    import jax.numpy as jnp
    from rumpy_tpu.models.attention_manipulators import QCALayer
    from rumpy_tpu.utils.torch_convert import convert_by_order

    x = rng.random((2, 32, 5, 5)).astype(np.float32)
    xh = jnp.asarray(x.transpose(0, 2, 3, 1))
    for style in ("standard", "modulate", "max_concat", "mini_concat",
                  "softmax", "extended_attention"):
        # modulate multiplies the attention vector elementwise with the
        # (scale_qpi-expanded) channel-width metadata; other styles take
        # the raw metadata vector (incl. negative entries)
        m = 32 if style == "modulate" else 3
        attrs = (rng.random((2, m)).astype(np.float32) - 0.5)
        ah = jnp.asarray(attrs)
        torch.manual_seed(0)
        net = qarch.QCALayer(channel=32, num_metadata=m, reduction=16,
                             style=style)
        net.eval()
        mod = QCALayer(channel=32, num_metadata=m, reduction=16,
                       style=style)
        variables = mod.init(jax.random.PRNGKey(0), xh, ah)
        params = convert_by_order(net.state_dict(), variables["params"])
        with torch.no_grad():
            ref = net(torch.from_numpy(x),
                      torch.from_numpy(attrs)[:, :, None, None]).numpy()
        got = np.asarray(mod.apply({"params": params}, xh, ah))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=1e-5, err_msg=style)
