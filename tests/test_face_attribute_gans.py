"""Attribute-conditioned face GAN ports: golden forward parity against
the reference's own torch code (face_attributes_gan_models/) plus handler
smoke tests. The reference marks this family WIP; parity is asserted for
every network that actually executes in the reference (FaceSR-Attributes
generator/discriminator with and without STN, AGA-GAN generator/
discriminator, FMFBlock + FMFResidualDenseNet + FMF discriminators)."""

import sys

import numpy as np
import pytest

import ref_loader

REF = ref_loader.REF
FAG = f"{REF}/rumpy/SISR/models/face_attributes_gan_models"


@pytest.fixture(scope="module")
def ref_fag():
    ref_loader._install_stubs()
    import torch
    ref_loader._skeleton(
        ["rumpy", "rumpy.SISR", "rumpy.SISR.models",
         "rumpy.SISR.models.face_attributes_gan_models"])
    ref_loader._load(
        "rumpy.SISR.models.face_attributes_gan_models.common_blocks",
        f"{FAG}/common_blocks.py")
    gen = ref_loader._load("ref_fag_generators", f"{FAG}/generators.py")
    disc = ref_loader._load("ref_fag_discriminators",
                            f"{FAG}/discriminators.py")
    # FMF's diag step calls x.get_device() (generators.py:1038), which is
    # -1 on CPU; give torch.eye a usable device index.
    real_eye = torch.eye

    def _eye(n, *a, **k):
        if k.get("device", None) == -1:
            k["device"] = "cpu"
        return real_eye(n, *a, **k)

    torch.eye = _eye
    yield gen, disc, torch
    torch.eye = real_eye


def _convert(torch_sd, flax_params, drop_running=True):
    from rumpy_tpu.utils.torch_convert import convert_by_order
    return convert_by_order(torch_sd, flax_params)


def _init_and_apply(mod, args, params, bstats):
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats
    return np.asarray(mod.apply(variables, *args))


def test_facesr_attributes_generator_parity(ref_fag, rng):
    gen, _, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import \
        FaceSRAttributesGenerator

    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    meta = rng.random((2, 18)).astype(np.float32)
    for remove_stn, nf in ((True, 8), (False, 32)):
        torch.manual_seed(0)
        net = gen.FaceSRAttributesGeneratorNet(n_feats=nf,
                                               n_attributes=18,
                                               remove_stn=remove_stn)
        net.eval()
        with torch.no_grad():
            ref = net(torch.from_numpy(x),
                      torch.from_numpy(meta[..., None, None])).numpy()
        mod = FaceSRAttributesGenerator(n_feats=nf, n_attributes=18,
                                        remove_stn=remove_stn)
        variables = mod.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 16, 16, 3)),
                             jnp.zeros((1, 18)))
        params = _convert(net.state_dict(), variables["params"])
        got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                    jnp.asarray(meta)),
                              params, variables.get("batch_stats"))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   atol=5e-4,
                                   err_msg=f"remove_stn={remove_stn}")


def test_facesr_attributes_discriminator_parity(ref_fag, rng):
    _, disc, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import \
        FaceSRAttributesDiscriminator

    torch.manual_seed(1)
    net = disc.FaceSRAttributesDiscriminatorNet(n_feats=8,
                                                n_attributes=18)
    net.eval()
    x = rng.random((2, 3, 128, 128)).astype(np.float32)
    meta = rng.random((2, 18)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x),
                  torch.from_numpy(meta[..., None, None])).numpy()
    mod = FaceSRAttributesDiscriminator(n_feats=8, n_attributes=18)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3)),
                         jnp.zeros((1, 18)))
    params = _convert(net.state_dict(), variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(meta)),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_agagan_generator_parity(ref_fag, rng):
    gen, _, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import AGAGANGenerator

    torch.manual_seed(2)
    net = gen.AGAGANGenerator(n_feats=32, n_attributes=38)
    net.eval()
    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    meta = rng.random((2, 38)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x),
                  torch.from_numpy(meta[..., None, None])).numpy()
    mod = AGAGANGenerator(n_feats=32, n_attributes=38)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 16, 16, 3)),
                         jnp.zeros((2, 38)))
    params = _convert(_reorder_agagan_generator(net.state_dict()),
                      variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(meta)),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               atol=5e-4)


def _order_by_prefix(sd, prefixes):
    """Rebuild a state dict with key groups ordered by the given prefix
    sequence (each group keeps its internal order)."""
    out = {}
    used = set()
    for p in prefixes:
        for k in sd:
            if k.startswith(p) and k not in used:
                out[k] = sd[k]
                used.add(k)
    leftovers = [k for k in sd if k not in used]
    assert not leftovers, f"unmapped torch keys: {leftovers[:8]}"
    return out


def _reorder_agagan_generator(sd):
    """Torch registration order -> flax first-call order (see module
    forward: shallow stream, attribute stream, fusion stream f1-f4, main
    branch, progressive attention rounds, reconstruction). The
    reference's upsample_64_64_lrelu is registered but never used in
    forward — dropped."""
    sd = {k: v for k, v in sd.items()
          if not k.startswith("upsample_64_64_lrelu.")}
    return _order_by_prefix(sd, [
        "shallow_conv_block.", "attributes_dense_block.",
        "shallow_conv_f1.", "shallow_conv_f2.", "shallow_conv_f3.",
        "upsample_128_128_lrelu.", "main_branch_head.",
        "main_branch_body_1.", "rddb_block.", "main_branch_body_2.",
        "main_branch_body_3.", "upsample_only_wide.", "conv_only_1.",
        "conv_bottleneck_sigmoid.", "conv_only_2.",
        "upsample_128_64_lrelu.", "upsample_only_narrow.",
        "upsample_256_128_lrelu.", "upsample_192_64_lrelu.",
        "conv2d_transpose.", "main_branch_tail."])


def test_agagan_discriminator_parity(ref_fag, rng):
    _, disc, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import AGAGANDiscriminator

    torch.manual_seed(3)
    net = disc.AGAGANDiscriminatorNet(n_feats=32, n_attributes=38)
    net.eval()
    x = rng.random((2, 3, 128, 128)).astype(np.float32)
    meta = rng.random((2, 38)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x),
                  torch.from_numpy(meta[..., None, None])).numpy()
    mod = AGAGANDiscriminator(n_feats=32, n_attributes=38)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 128, 128, 3)),
                         jnp.zeros((2, 38)))
    params = _convert(net.state_dict(), variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(meta)),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got, ref, atol=3e-4)


def test_fmf_block_parity(ref_fag, rng):
    gen, _, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import FMFBlock

    torch.manual_seed(4)
    net = gen.FMFBlock(n_feats=64, n_attributes=40)
    net.eval()
    x = rng.random((2, 3, 16, 16)).astype(np.float32)
    meta = rng.random((2, 40)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x),
                  torch.from_numpy(meta[..., None, None])).numpy()
    mod = FMFBlock(n_feats=64, n_attributes=40)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((2, 16, 16, 3)),
                         jnp.zeros((2, 40)))
    params = _convert(net.state_dict(), variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(meta)),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got, ref[..., 0, 0], atol=5e-4)


def _reorder_fmf_net(sd):
    return _order_by_prefix(sd, [
        "fmf_block.", "main_branch_head.",
        "main_branch_residual_dense_body.", "fmf_meta_attention.",
        "encoder_1.", "encoder_decoder_latent_dim.", "decoder_1.",
        "encoder_decoder_output_concat_adapter.",
        "main_branch_upsample_block.", "encoder_2.", "decoder_2.",
        "encoder_3.", "decoder_3.", "main_branch_tail."])


def test_fmf_residual_dense_net_parity(ref_fag, rng):
    gen, _, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import FMFResidualDenseNet

    torch.manual_seed(5)
    net = gen.FMFResidualDenseNet(n_attributes=40)
    net.eval()
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    meta = rng.random((1, 40)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.from_numpy(x),
                  torch.from_numpy(meta[..., None, None])).numpy()
    mod = FMFResidualDenseNet(n_attributes=40)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)),
                         jnp.zeros((1, 40)))
    params = _convert(_reorder_fmf_net(net.state_dict()),
                      variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),
                                jnp.asarray(meta)),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                               atol=1e-3)


def test_fmf_discriminators_parity(ref_fag, rng):
    _, disc, torch = ref_fag
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.face_attribute_gans import (
        FMFAttributeDiscriminator, FMFDiscriminator)

    x = rng.random((2, 3, 128, 128)).astype(np.float32)
    torch.manual_seed(6)
    net = disc.FMFDiscriminator(n_feats=16)
    net.eval()
    with torch.no_grad():
        ref = net(torch.from_numpy(x)).numpy()
    mod = FMFDiscriminator(n_feats=16)
    variables = mod.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 128, 128, 3)))
    params = _convert(net.state_dict(), variables["params"])
    got = _init_and_apply(mod, (jnp.asarray(x.transpose(0, 2, 3, 1)),),
                          params, variables.get("batch_stats"))
    np.testing.assert_allclose(got, ref, atol=3e-4)

    torch.manual_seed(7)
    anet = disc.FMFAttributeDiscriminator(n_feats=16, n_attributes=40)
    anet.eval()
    with torch.no_grad():
        aref = anet(torch.from_numpy(x)).numpy()
    amod = FMFAttributeDiscriminator(n_feats=16, n_attributes=40)
    avars = amod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 128, 128, 3)))
    aparams = _convert(anet.state_dict(), avars["params"])
    agot = _init_and_apply(amod,
                           (jnp.asarray(x.transpose(0, 2, 3, 1)),),
                           aparams, avars.get("batch_stats"))
    np.testing.assert_allclose(agot, aref, atol=3e-4)


def test_attribute_gan_handler_smoke(rng):
    """The smallest handler runs a full attribute-conditioned GAN step;
    the other two build state and run an eval forward."""
    from rumpy_tpu.registry import get_model

    h = get_model("facesrattributesgan")(metadata_bypass_len=18,
                                         n_feats=8, pretrain_epochs=0)
    assert h.num_metadata == 18
    state = h.init_state()
    batch = {"lr": rng.random((2, 16, 16, 3)).astype(np.float32),
             "hr": rng.random((2, 128, 128, 3)).astype(np.float32),
             "metadata": rng.random((2, 18)).astype(np.float32)}
    state, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))
    assert np.isfinite(float(losses["d-loss-real"]))
    sr = h.run_eval(state, batch)
    assert sr.shape == (2, 128, 128, 3)

    for name, meta_n in (("agagan", 38), ("fmfnet", 40)):
        h2 = get_model(name)(metadata_bypass_len=meta_n)
        st2 = h2.init_state()
        out = h2.run_eval(st2, {
            "lr": rng.random((1, 16, 16, 3)).astype(np.float32),
            "metadata": rng.random((1, meta_n)).astype(np.float32)})
        assert out.shape == (1, 128, 128, 3), name
