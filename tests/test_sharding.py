"""Multi-device (8-way virtual CPU mesh) tests: data-parallel training,
global-view queue semantics, replicated-state consistency — the TPU-native
answer to multi-node testing (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rumpy_tpu.parallel import mesh as mesh_mod
from rumpy_tpu.registry import get_model


@pytest.fixture
def mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    return mesh_mod.get_mesh(n_data=8)


def test_mesh_shapes(mesh):
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1


def test_data_parallel_train_step_matches_single_device(mesh, rng):
    """Same batch, sharded vs unsharded: identical loss and params."""
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1, lr=1e-3)
    batch_np = {"lr": rng.random((8, 8, 8, 3)).astype(np.float32),
                "hr": rng.random((8, 16, 16, 3)).astype(np.float32)}

    state_a = h.init_state(seed=0)
    state_a, loss_a = h.train_batch(state_a, batch_np)

    state_b = h.init_state(seed=0)
    state_b = mesh_mod.replicate(mesh, state_b)
    sharded = mesh_mod.shard_batch(mesh, batch_np)
    state_b, loss_b = h.train_batch(state_b, sharded)

    assert abs(float(loss_a["train-loss"])
               - float(loss_b["train-loss"])) < 1e-5
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_moco_queue_sees_global_batch(mesh, rng):
    """The MoCo queue must enqueue the full cross-device batch — the
    behavior the reference's dead DDP gather never delivered."""
    h = get_model("moco")(K=16, dim=32, lr=1e-3)
    state = mesh_mod.replicate(mesh, h.init_state())
    batch = {"image_query": rng.random((8, 32, 32, 3)).astype(np.float32),
             "image_key": rng.random((8, 32, 32, 3)).astype(np.float32)}
    state, _ = h.train_batch(state, mesh_mod.shard_batch(mesh, batch))
    assert int(state.extra["queue_ptr"]) == 8  # all 8 global keys enqueued


def test_fused_degradation_shards(mesh, jkey, rng):
    from rumpy_tpu.degradations.pipeline import ImagePipeline, fused_degrade
    pipe = ImagePipeline(
        [["realesrganblur", "b"], ["downsample", "d"]],
        deg_configs={"b": {"kernel_range": ["iso"], "kernel_size": 9,
                           "request_kernel_metadata": True},
                     "d": {"scale": 2}})
    fn = fused_degrade(pipe)
    hr = mesh_mod.shard_batch(
        mesh, {"hr": rng.random((8, 16, 16, 3)).astype(np.float32)})["hr"]
    lr, meta = fn(jkey, hr)
    assert lr.shape == (8, 8, 8, 3)
    # output inherits a data-axis sharding
    spec = lr.sharding.spec if hasattr(lr.sharding, "spec") else None
    assert spec is None or spec[0] in ("data", None)


def test_local_batch_size(mesh):
    assert mesh_mod.local_batch_size(mesh, 32) == 4
    with pytest.raises(ValueError):
        mesh_mod.local_batch_size(mesh, 12)


def test_halo_exchange_matches_unsharded():
    """Spatially sharded conv forward (halo exchange over the mesh) is
    bit-equal to the unsharded forward when halo covers the receptive
    field."""
    import jax
    import jax.numpy as jnp
    from rumpy_tpu.parallel.mesh import get_mesh
    from rumpy_tpu.parallel.spatial import spatial_sharded_forward
    from rumpy_tpu.models.common import pixel_shuffle

    mesh = get_mesh()  # all 8 virtual devices on the data axis
    rng = np.random.default_rng(0)
    # a small conv "network": two 3x3 convs (receptive radius 2) + x2
    # pixel-shuffle, fixed weights
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 8)) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 12)) * 0.1, jnp.float32)

    def forward(x):
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jax.nn.relu(y)
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return pixel_shuffle(y, 2)

    img = jnp.asarray(rng.random((1, 64, 16, 3)), jnp.float32)
    # contract: result == crop(forward(reflect_pad(image, halo)))
    halo = 4
    padded = jnp.pad(img, ((0, 0), (halo, halo), (0, 0), (0, 0)),
                     mode="reflect")
    ref = forward(padded)[:, halo * 2:-halo * 2]
    out = spatial_sharded_forward(forward, img, scale=2, mesh=mesh,
                                  halo=halo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_halo_exchange_non_divisible_height():
    import jax.numpy as jnp
    import jax
    from rumpy_tpu.parallel.mesh import get_mesh
    from rumpy_tpu.parallel.spatial import spatial_sharded_forward

    mesh = get_mesh()
    rng = np.random.default_rng(1)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 3)) * 0.2, jnp.float32)

    def forward(x):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    img = jnp.asarray(rng.random((2, 61, 8, 3)), jnp.float32)  # 61 % 8 != 0
    halo = 2
    # pad to shard-divisible height exactly as the implementation does,
    # then apply the reflect-halo contract
    pimg = jnp.pad(img, ((0, 0), (0, 3), (0, 0), (0, 0)), mode="reflect")
    padded = jnp.pad(pimg, ((0, 0), (halo, halo), (0, 0), (0, 0)),
                     mode="reflect")
    ref = forward(padded)[:, halo:-halo][:, :61]
    out = spatial_sharded_forward(forward, img, scale=1, mesh=mesh,
                                  halo=halo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gan_two_optimizer_step_under_mesh(mesh, rng):
    """ESRGAN G+D step (the most state-heavy training path: two
    optimizers, discriminator batch-stats, phase machinery) on the
    8-device mesh, and consistency vs the unsharded step (VERDICT r2
    item 6)."""
    kw = dict(scale=4, nf=8, nb=1, gc=8, d_nf=8, pretrain_epochs=0,
              lr=1e-4)
    batch_np = {"lr": rng.random((8, 32, 32, 3)).astype(np.float32),
                "hr": rng.random((8, 128, 128, 3)).astype(np.float32)}

    h = get_model("esrgan")(**kw)
    h.set_epoch(0)
    state_a = h.init_state(seed=0)
    state_a, loss_a = h.train_batch(state_a, batch_np)

    h2 = get_model("esrgan")(**kw)
    h2.set_epoch(0)
    state_b = h2.init_state(seed=0)
    state_b = mesh_mod.replicate(mesh, state_b)
    sharded = mesh_mod.shard_batch(mesh, batch_np)
    state_b, loss_b = h2.train_batch(state_b, sharded)

    for k in ("train-loss", "gan-loss", "d-loss-real", "d-loss-fake"):
        assert abs(float(loss_a[k]) - float(loss_b[k])) < 1e-4, k
    # second step keeps running (optimizer states shard-consistent)
    state_b, loss_b2 = h2.train_batch(state_b, sharded)
    assert np.isfinite(float(loss_b2["train-loss"]))


def test_checkpoint_roundtrip_under_mesh(mesh, rng, tmp_path):
    """Save from a replicated mesh state, restore, reshard, resume
    training: params/opt-state survive the host round trip and the
    restored trajectory matches the uninterrupted one."""
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1, lr=1e-3)
    batch_np = {"lr": rng.random((8, 8, 8, 3)).astype(np.float32),
                "hr": rng.random((8, 16, 16, 3)).astype(np.float32)}
    sharded = mesh_mod.shard_batch(mesh, batch_np)

    state = mesh_mod.replicate(mesh, h.init_state(seed=0))
    state, _ = h.train_batch(state, sharded)

    save_dir = str(tmp_path / "saved_models")
    import os
    os.makedirs(save_dir)
    h.save_model(state, save_dir, epoch=3)

    # uninterrupted continuation
    cont, loss_cont = h.train_batch(state, sharded)

    # restore -> reshard -> continue
    restored, ep = h.load_model(save_dir, epoch="last")
    assert ep == 3
    restored = mesh_mod.replicate(mesh, restored)
    resumed, loss_res = h.train_batch(restored, sharded)

    assert abs(float(loss_cont["train-loss"])
               - float(loss_res["train-loss"])) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(cont.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bobw_combined_loss_step_under_mesh(mesh, rng):
    """BoBW joint pipeline (frozen-free moco mode: E+G joint step with
    contrastive queue in extra) on the mesh — the flagship config #5
    path (VERDICT r2 item 6)."""
    h = get_model("contrastiveblindqrcan")(
        scale=2, combined_loss_mode="moco", crop_count=2,
        contrastive_K=16, encoder_dim=32, block_encoder_loading=True,
        n_feats=8, n_resgroups=1, n_resblocks=1)
    state = h.init_state(seed=0)
    state = mesh_mod.replicate(mesh, state)
    batch_np = {
        "lr": rng.random((8, 2, 8, 8, 3)).astype(np.float32),  # multi-crop
        "hr": rng.random((8, 16, 16, 3)).astype(np.float32)}
    sharded = mesh_mod.shard_batch(mesh, batch_np)
    state, losses = h.train_batch(state, sharded)
    assert np.isfinite(float(losses["train-loss"]))
    assert np.isfinite(float(losses["contrastive-loss"]))
    assert int(state.extra["queue_ptr"]) == 8  # global batch enqueued


def test_dan_iterative_step_under_mesh(mesh, rng):
    """DAN v1's unrolled estimator/restorer alternation (the lax.scan-
    style iterative blind model) trains data-parallel: sharded batch +
    replicated params produce the same loss/params as single-device
    (VERDICT r3 item 5)."""
    h = get_model("dan")(mode="v1", scale=2, nf=8, nb=1, loop=2,
                         input_para=4, kernel_size=9, lr=1e-3,
                         init_ker_map=(0.1, 0.2, 0.3, 0.4))
    batch_np = {"lr": rng.random((8, 8, 8, 3)).astype(np.float32),
                "hr": rng.random((8, 16, 16, 3)).astype(np.float32),
                "metadata": rng.random((8, 4)).astype(np.float32)}

    state_a = h.init_state(seed=0)
    state_a, loss_a = h.train_batch(state_a, batch_np)

    state_b = h.init_state(seed=0)
    state_b = mesh_mod.replicate(mesh, state_b)
    state_b, loss_b = h.train_batch(state_b,
                                    mesh_mod.shard_batch(mesh, batch_np))

    assert abs(float(loss_a["train-loss"])
               - float(loss_b["train-loss"])) < 1e-5
    assert abs(float(loss_a["kernel-loss-iter-1"])
               - float(loss_b["kernel-loss-iter-1"])) < 1e-5
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
