"""Multi-step training-TRAJECTORY parity vs the torch reference
(VERDICT r2 item 1): where the one-step test pins a single gradient +
Adam update, these tests drive 25-40 consecutive optimizer steps with
identical data and converted-weight init through five stateful regimes:

  (a) RCAN + multi-step LR scheduler — pins the per-step scheduler
      semantics (reference standard_update steps the scheduler after
      every optimizer step, base_architecture.py:425-440; torch
      MultiStepLR milestone m == optax piecewise boundary m, verified
      step-for-step);
  (b) SupMoCo — pins the EMA momentum-encoder update, queue + label-
      queue evolution and in-batch/queue positive logits
      (supmoco.py:53-125, moco.py:30-83);
  (c) ESRGAN across the pretrain->adversarial boundary — pins the
      L1-pretrain phase, the separate pre_train/main optimizer swap at
      the boundary (fresh Adam moments, handlers.py:52-61), the
      relativistic adversarial forms and the G-then-D update order
      (handlers.py:117-168);
  (f) DAN v1 — pins the unrolled estimator/restorer alternation, its
      stop-gradient placement and the last-iteration-only optimized loss
      (blur_kernel_blind_sr/handlers.py:89-119);
  (g) IKC — pins the SFTMD-pretrain -> predictor/corrector phase
      switch, the per-child Adam optimizers, the MSE criteria and the
      min-over-iterations train loss (handlers.py:1041-1193).

Per-step train losses are asserted within fp tolerance and the final
parameters leaf-for-leaf close. torch sides are driven with the
reference's own architecture code where importable and the reference's
exact update formulas (cited) where the handler class itself cannot be
instantiated without a device/config stack.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

REF = "/root/reference/rumpy"


@pytest.fixture(scope="module")
def torch():
    import torch as t
    return t


def _leaf_close(got_params, ref_params_tree, atol):
    import jax
    flat_ref = jax.tree_util.tree_leaves(ref_params_tree)
    flat_got = jax.tree_util.tree_leaves(got_params)
    assert len(flat_ref) == len(flat_got)
    worst = 0.0
    for a, b in zip(flat_got, flat_ref):
        worst = max(worst, float(np.max(np.abs(np.asarray(a, np.float32)
                                               - np.asarray(b, np.float32)))))
    assert worst <= atol, f"worst param delta {worst} > {atol}"
    return worst


# ---------------------------------------------------------------------------
# (a) RCAN + multi-step LR scheduler
# ---------------------------------------------------------------------------

def test_rcan_multistep_scheduler_trajectory(torch, rng):
    import ref_loader
    arch = ref_loader.load_advanced_arch()

    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    steps = 30
    milestones, gamma, lr = [5, 15, 22], 0.5, 1e-3

    torch.manual_seed(0)
    net = arch.RCAN(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    sched = torch.optim.lr_scheduler.MultiStepLR(opt, milestones=milestones,
                                                 gamma=gamma)

    h = get_model("rcan")(scale=2, n_resblocks=2, n_resgroups=2, n_feats=16,
                          lr=lr, scheduler="multi_step_lr",
                          scheduler_params={"milestones": milestones,
                                            "gamma": gamma})
    state = h.init_state()
    template = state.params
    state = state.replace(params=convert_by_order(net.state_dict(),
                                                  template))

    xs = rng.random((steps, 2, 3, 12, 12)).astype(np.float32)
    ys = rng.random((steps, 2, 3, 24, 24)).astype(np.float32)

    ref_losses, got_losses = [], []
    for i in range(steps):
        out = net(torch.from_numpy(xs[i]))
        loss = torch.nn.functional.l1_loss(out, torch.from_numpy(ys[i]))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()  # standard_update scheduler cadence
        ref_losses.append(float(loss.detach()))

        state, losses = h.train_batch(
            state, {"lr": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                    "hr": jnp.asarray(ys[i].transpose(0, 2, 3, 1))})
        got_losses.append(float(losses["train-loss"]))

    deltas = np.abs(np.array(ref_losses) - np.array(got_losses))
    print(f"\nRCAN multistep trajectory: worst per-step loss delta "
          f"{deltas.max():.2e} at step {deltas.argmax()}")
    assert deltas.max() < 5e-5, list(zip(ref_losses, got_losses))

    worst = _leaf_close(state.params,
                        convert_by_order(net.state_dict(), template),
                        atol=5e-4)
    print(f"RCAN multistep trajectory: final param worst delta {worst:.2e}")


# ---------------------------------------------------------------------------
# (b) SupMoCo: EMA + queue + label queue over 25 steps
# ---------------------------------------------------------------------------

def _load_ref_supmoco(torch):
    """Reference SupMoCo + the DASR Encoder backbone, loaded directly
    (moco.py pulls torchvision only for non-default backbones — the
    default 'default' path uses encoding_models.Encoder)."""
    import importlib.util
    import types

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    import ref_loader
    ref_loader._install_stubs()
    for pkg in ["rumpy", "rumpy.regression", "rumpy.regression.models",
                "rumpy.regression.models.contrastive_learning",
                "rumpy.SISR", "rumpy.SISR.models",
                "rumpy.SISR.models.feature_extractors"]:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))
    # give the package a real __path__ so moco.py's relative
    # `.base_models` import resolves against the reference tree
    sys.modules["rumpy.regression.models.contrastive_learning"].__path__ = \
        [f"{REF}/regression/models/contrastive_learning"]
    enc = load(
        "rumpy.regression.models.contrastive_learning.encoding_models",
        f"{REF}/regression/models/contrastive_learning/encoding_models.py")
    load("rumpy.regression.models.contrastive_learning.moco",
         f"{REF}/regression/models/contrastive_learning/moco.py")
    supmoco = load("rumpy.regression.models.contrastive_learning.supmoco",
                   f"{REF}/regression/models/contrastive_learning/supmoco.py")
    return supmoco, enc


def test_supmoco_trajectory(torch, rng):
    """25 SupMoCo steps: loss + queue + queue_labels + queue_ptr + both
    encoders match the reference's module driven by its own forward
    (reference SupMoCo.forward, supmoco.py:53-125), with the EMA key
    encoder updated inside each step."""
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    supmoco_mod, enc_mod = _load_ref_supmoco(torch)

    # dim is pinned to 256 by the reference's DASR Encoder MLP
    # (encoding_models.py:30-34)
    steps, n, p, K, dim, nclass = 25, 4, 2, 32, 256, 5
    torch.manual_seed(0)
    ref = supmoco_mod.SupMoCo(device="cpu", positives_per_class=p,
                              contrastive_dropdown=False,
                              base_encoder=enc_mod.Encoder, dim=dim, K=K,
                              m=0.99, T=0.07)
    ref.register_classes(nclass)
    ref.train()
    # SGD+momentum rather than Adam: Adam's g/sqrt(g^2) first-step
    # normalization turns fp-level gradient noise into +-lr sign flips,
    # which compounds into O(1e-2) trajectory drift in 25 steps with the
    # T=0.07 contrastive loss — with SGD the trajectories stay
    # fp-tight, pinning the EMA/queue/label-queue semantics exactly
    # (Adam itself is pinned by the RCAN one-step + multistep tests)
    opt = torch.optim.SGD(ref.encoder_q.parameters(), lr=1e-2,
                          momentum=0.9)

    h = get_model("supmoco")(dim=dim, K=K, m=0.99, T=0.07,
                             num_classes=nclass, positives_per_class=p,
                             contrastive_dropdown=False, lr=1e-2,
                             optimizer_type="sgd",
                             scheduler_params={"momentum": 0.9})
    state = h.init_state()
    template = state.params
    q_params = convert_by_order(ref.encoder_q.state_dict(), template)
    # strip BatchNorm running stats out of the torch state dict order:
    # convert_by_order maps BN buffers too — build bstats separately
    state = state.replace(params=q_params)
    # align batch stats + key encoder exactly
    import flax
    k_params = convert_by_order(ref.encoder_k.state_dict(), template)
    new_extra = dict(state.extra)
    new_extra["key_params"] = k_params
    # fresh BN stats match torch defaults (mean 0 var 1) already
    # reference queue starts N(0,1)-normalized; copy it over verbatim
    ref_queue = ref.queue.detach().numpy().T.copy()  # (K, dim)
    new_extra["queue"] = jnp.asarray(ref_queue)
    new_extra["queue_labels"] = jnp.asarray(
        ref.queue_labels.numpy().astype(np.int32))
    # reference sentinel == num_classes; ours uses -1 — both one-hot to
    # a class no real label matches under nc+1 classes, so keep theirs
    state = state.replace(extra=new_extra)

    ref_losses, got_losses = [], []
    ce = torch.nn.CrossEntropyLoss()
    for i in range(steps):
        imq = rng.random((n, 3, 32, 32)).astype(np.float32)
        imk = rng.random((n * p, 3, 32, 32)).astype(np.float32)
        labels = rng.integers(0, nclass, size=(n,)).astype(np.int64)

        _, logits, targets, _ = ref(torch.from_numpy(imq),
                                    torch.from_numpy(imk),
                                    labels=torch.from_numpy(labels))
        loss = ce(logits, targets)
        opt.zero_grad()
        loss.backward()
        opt.step()
        ref_losses.append(float(loss.detach()))

        state, losses = h.train_batch(
            state, {"image_query": jnp.asarray(imq.transpose(0, 2, 3, 1)),
                    "image_key": jnp.asarray(imk.transpose(0, 2, 3, 1)),
                    "labels": jnp.asarray(labels.astype(np.int32))})
        got_losses.append(float(losses["train-loss"]))

    deltas = np.abs(np.array(ref_losses) - np.array(got_losses))
    print(f"\nSupMoCo trajectory: worst per-step loss delta "
          f"{deltas.max():.2e} at step {deltas.argmax()}")
    assert deltas.max() < 5e-4, list(zip(ref_losses, got_losses))

    # final state parity: query params, EMA key params, queue content,
    # label queue, pointer
    worst_q = _leaf_close(state.params,
                          convert_by_order(ref.encoder_q.state_dict(),
                                           template), atol=1e-3)
    worst_k = _leaf_close(state.extra["key_params"],
                          convert_by_order(ref.encoder_k.state_dict(),
                                           template), atol=1e-3)
    np.testing.assert_allclose(np.asarray(state.extra["queue"]),
                               ref.queue.detach().numpy().T, atol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(state.extra["queue_labels"]),
        ref.queue_labels.numpy().astype(np.int32))
    assert int(state.extra["queue_ptr"]) == int(ref.queue_ptr)
    print(f"SupMoCo trajectory: final q/k param worst deltas "
          f"{worst_q:.2e}/{worst_k:.2e}")


# ---------------------------------------------------------------------------
# (c) ESRGAN across the pretrain -> adversarial boundary
# ---------------------------------------------------------------------------

def _load_ref_gan_nets(torch):
    import importlib.util

    def load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    import ref_loader
    ref_loader._install_stubs()
    gens = load("ref_gan_generators",
                f"{REF}/SISR/models/non_blind_gan_models/generators.py")
    discs = load("ref_gan_discriminators",
                 f"{REF}/SISR/models/non_blind_gan_models/discriminators.py")
    return gens, discs


def test_esrgan_phase_boundary_trajectory(torch, rng):
    """8 pretrain steps + 8 adversarial steps across the phase flip.
    torch side follows the reference handler's exact update math
    (pre_train_update handlers.py:104-116: L1 via the PRE-TRAIN
    optimizer; generator_update/discriminator_update handlers.py:117-168:
    relativistic-average BCE, fresh MAIN optimizer from the boundary,
    G update then D update on the detached fake). vgg content term off
    on both sides (no pretrained VGG in either; lambda_vgg=0)."""
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    gens, discs = _load_ref_gan_nets(torch)

    pre_steps, gan_steps = 8, 8
    pretrain_lr, main_lr, d_lr = 2e-4, 1e-4, 1e-4
    lambda_adv, lambda_pixel = 5e-3, 1e-2

    torch.manual_seed(0)
    net = gens.RRDBNet(scale=4, num_feat=16, num_block=2, num_grow_ch=8)
    disc = discs.VGGStyleDiscriminator128(num_feat=16)
    net.train()
    disc.train()
    pre_opt = torch.optim.Adam(net.parameters(), lr=pretrain_lr)
    main_opt = torch.optim.Adam(net.parameters(), lr=main_lr)
    d_opt = torch.optim.Adam(disc.parameters(), lr=d_lr)
    bce = torch.nn.BCEWithLogitsLoss()

    h = get_model("esrgan")(scale=4, nf=16, nb=2, gc=8, d_nf=16,
                            pretrain_epochs=1, lr=pretrain_lr,
                            main_lr=main_lr, d_lr=d_lr,
                            lambda_adv=lambda_adv,
                            lambda_pixel=lambda_pixel)
    state = h.init_state()
    g_template = state.params["generator"]
    d_template = state.params["discriminator"]
    state = state.replace(params={
        "generator": convert_by_order(net.state_dict(), g_template),
        "discriminator": convert_by_order(disc.state_dict(), d_template)})

    xs = rng.random((pre_steps + gan_steps, 2, 3, 32, 32)).astype(np.float32)
    ys = rng.random((pre_steps + gan_steps, 2, 3, 128, 128)).astype(
        np.float32)

    ref_losses, got_losses = [], []
    h.set_epoch(0)
    for i in range(pre_steps):
        out = net(torch.from_numpy(xs[i]))
        loss = torch.nn.functional.l1_loss(out, torch.from_numpy(ys[i]))
        pre_opt.zero_grad()
        loss.backward()
        pre_opt.step()
        ref_losses.append(float(loss.detach()))
        state, losses = h.train_batch(
            state, {"lr": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                    "hr": jnp.asarray(ys[i].transpose(0, 2, 3, 1))})
        got_losses.append(float(losses["train-loss"]))

    h.set_epoch(1)  # adversarial phase; fresh main optimizer from here
    for i in range(pre_steps, pre_steps + gan_steps):
        x, y = torch.from_numpy(xs[i]), torch.from_numpy(ys[i])
        out = net(x)
        # generator_update (handlers.py:117-146), content term absent
        l1 = torch.nn.functional.l1_loss(out, y)
        pred_real = disc(y).detach()
        pred_fake = disc(out)
        valid = torch.ones_like(pred_real)
        fake = torch.zeros_like(pred_fake)
        loss_gan = (bce(pred_real - pred_fake.mean(0, keepdim=True), fake)
                    + bce(pred_fake - pred_real.mean(0, keepdim=True),
                          valid)) / 2
        loss_G = lambda_adv * loss_gan + lambda_pixel * l1
        main_opt.zero_grad()
        loss_G.backward()
        main_opt.step()
        # discriminator_update (handlers.py:148-168): the fake
        # PREDICTION is detached ("detachment of gradients required") —
        # D gradients flow only through pred_real
        pred_real = disc(y)
        pred_fake = disc(out.detach()).detach()
        loss_d = (bce(pred_real - pred_fake.mean(0, keepdim=True), valid)
                  + bce(pred_fake - pred_real.mean(0, keepdim=True),
                        fake)) / 2
        d_opt.zero_grad()
        loss_d.backward()
        d_opt.step()
        ref_losses.append(float(loss_G.detach()))

        state, losses = h.train_batch(
            state, {"lr": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                    "hr": jnp.asarray(ys[i].transpose(0, 2, 3, 1))})
        got_losses.append(float(losses["train-loss"]))

    deltas = np.abs(np.array(ref_losses) - np.array(got_losses))
    print("\nESRGAN boundary per-step deltas:",
          ["%.2e" % d for d in deltas])
    assert deltas.max() < 2e-4, list(zip(ref_losses, got_losses))

    worst_g = _leaf_close(state.params["generator"],
                          convert_by_order(net.state_dict(), g_template),
                          atol=1e-3)
    worst_d = _leaf_close(state.params["discriminator"],
                          convert_by_order(disc.state_dict(), d_template),
                          atol=1e-3)
    print(f"ESRGAN boundary trajectory: final G/D param worst deltas "
          f"{worst_g:.2e}/{worst_d:.2e}")


# ---------------------------------------------------------------------------
# (d) Scheduler-vocabulary parity vs the torch factory semantics
# ---------------------------------------------------------------------------

def test_scheduler_vocabulary_matches_torch(torch):
    """Every reference scheduler spelling (base_architecture.py:105-186)
    produces the same per-optimizer-step lr as the torch scheduler it
    names, including torch LambdaLR's multiply-the-base-lr semantics for
    the custom lambdas and CosineAnnealingWarmRestarts' growing cycles
    (T_mult > 1)."""
    from rumpy_tpu.models.base import build_schedule

    def torch_lrs(make_sched, base_lr, steps):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=base_lr)
        sch = make_sched(opt)
        out = []
        for _ in range(steps):
            out.append(opt.param_groups[0]["lr"])
            opt.step()
            sch.step()
        return np.asarray(out)

    steps, lr = 700, 1e-4

    # cosine_annealing_warm_restarts, T_mult 1 and 2
    for t_mult in (1, 2):
        want = torch_lrs(
            lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
                o, T_0=100, T_mult=t_mult, eta_min=1e-7), lr, steps)
        sched = build_schedule(lr, "cosine_annealing_warm_restarts",
                               {"restart_period": 100, "t_mult": t_mult,
                                "lr_min": 1e-7})
        got = np.asarray([float(sched(t)) for t in range(steps)])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12,
                                   err_msg=f"t_mult={t_mult}")

    # custom_dasr lambdas (LambdaLR: lr = base_lr * lambda(step))
    import math

    def dasr_long(e):
        if e < 60:
            return 1e-3
        if e < 225:
            return 1e-4
        return 1e-4 * math.pow(0.5, (e - 100) // 125)

    def dasr_short(e):
        if e < 21:
            return 1e-3
        if e < 79:
            return 1e-4
        return 1e-4 * math.pow(0.5, (e - 35) // 44)

    def dasr_noenc(e):
        if e < 225:
            return 1e-4
        return 1e-4 * math.pow(0.5, (e - 100) // 125)

    for train_type, lam in (("long", dasr_long), ("short", dasr_short),
                            ("no_encoder_long", dasr_noenc)):
        want = torch_lrs(
            lambda o: torch.optim.lr_scheduler.LambdaLR(o, lr_lambda=lam),
            lr, steps)
        sched = build_schedule(lr, "custom_dasr",
                               {"train_type": train_type})
        got = np.asarray([float(sched(t)) for t in range(steps)])
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=train_type)

    # custom_contrastive
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.LambdaLR(
            o, lr_lambda=lambda b: 0.1 if b < 260 else 5e-4), 0.1, steps)
    sched = build_schedule(0.1, "custom_contrastive", {})
    got = np.asarray([float(sched(t)) for t in range(steps)])
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # one_cycle_lr (cos strategy; optax defaults == torch defaults)
    want = torch_lrs(
        lambda o: torch.optim.lr_scheduler.OneCycleLR(
            o, max_lr=1e-3, total_steps=steps, anneal_strategy="cos"),
        lr, steps)
    sched = build_schedule(lr, "one_cycle_lr",
                           {"lr_max": 1e-3, "total_steps": steps,
                            "anneal_strategy": "cos"})
    got = np.asarray([float(sched(t)) for t in range(steps)])
    np.testing.assert_allclose(got, want, rtol=1e-3)

    # custom: user-supplied traceable lambda
    sched = build_schedule(2.0, "custom", {"function": lambda t: t + 1})
    assert float(sched(4)) == 10.0


def test_optimizer_vocabulary_matches_torch(torch):
    """define_optimizer parity (base_architecture.py:79-103):
    case-insensitive names ('Adam' is the reference's default spelling),
    optimizer_params {beta_1, beta_2} for adam and {alpha} for rmsprop,
    pinned by 20-step trajectories on a quadratic against torch."""
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.models.base import build_optimizer

    w0 = np.linspace(-1.0, 1.0, 8).astype(np.float32)

    def jax_traj(tx):
        w = jnp.asarray(w0)
        state = tx.init(w)
        for _ in range(20):
            g = 2 * w + 0.3 * jnp.sin(w)  # d/dw (w^2 + ...)
            up, state = tx.update(g, state, w)
            w = w + up
        return np.asarray(w)

    def torch_traj(make_opt):
        w = torch.nn.Parameter(torch.tensor(w0))
        opt = make_opt([w])
        for _ in range(20):
            opt.zero_grad()
            loss = (w ** 2 + 0.3 * -torch.cos(w)).sum()
            loss.backward()
            opt.step()
        return w.detach().numpy()

    got = jax_traj(build_optimizer(1e-2, "Adam",
                                   optimizer_params={"beta_1": 0.5,
                                                     "beta_2": 0.99}))
    want = torch_traj(lambda p: torch.optim.Adam(p, lr=1e-2,
                                                 betas=(0.5, 0.99)))
    np.testing.assert_allclose(got, want, atol=1e-6)

    got = jax_traj(build_optimizer(1e-2, "rmsprop",
                                   optimizer_params={"alpha": 0.95}))
    want = torch_traj(lambda p: torch.optim.RMSprop(p, lr=1e-2,
                                                    alpha=0.95))
    np.testing.assert_allclose(got, want, atol=1e-6)

    # torch defaults with no optimizer_params
    got = jax_traj(build_optimizer(1e-2, "RMSprop"))
    want = torch_traj(lambda p: torch.optim.RMSprop(p, lr=1e-2))
    np.testing.assert_allclose(got, want, atol=1e-6)


# ---------------------------------------------------------------------------
# (f) DAN v1: estimator/restorer alternation over 20 steps (VERDICT r3
#     item 5) — pins the unrolled-loop stop-gradient placement and the
#     "last-iteration image L1 + kernel L1" optimized loss
#     (blur_kernel_blind_sr/handlers.py:89-119 overwrites d_sr/d_kr each
#     loop turn; only the final pair reaches standard_update)
# ---------------------------------------------------------------------------

def test_dan_v1_trajectory(torch, rng):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_danv1_traj", f"{REF}/SISR/models/blur_kernel_blind_sr/DANv1.py")
    danm = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(danm)

    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    steps, lr = 20, 1e-3
    pca = ("/root/reference/Data/example_data/Set5/lr_random_blur/"
           "pca_matrix.pth")
    torch.manual_seed(0)
    net = danm.DAN(nf=16, nb=2, upscale=4, input_para=10, kernel_size=21,
                   loop=2, pca_matrix_path=pca)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=lr)
    ikm = tuple(float(v) for v in net.init_ker_map.numpy()[0])

    h = get_model("dan")(mode="v1", scale=4, nf=16, nb=2, loop=2,
                         init_ker_map=ikm, lr=lr)
    state = h.init_state()
    template = state.params
    sd = {k: v for k, v in net.state_dict().items()
          if k not in ("encoder", "init_kernel", "init_ker_map")}
    state = state.replace(params=convert_by_order(sd, template))

    xs = rng.random((steps, 2, 3, 8, 8)).astype(np.float32)
    ys = rng.random((steps, 2, 3, 32, 32)).astype(np.float32)
    ms = rng.random((steps, 2, 10)).astype(np.float32)

    ref_losses, got_losses = [], []
    for i in range(steps):
        srs, kms = net(torch.from_numpy(xs[i]))
        d_sr = d_kr = None
        for ind in range(len(kms)):  # handlers.py:101-116
            d_kr = torch.nn.functional.l1_loss(
                kms[ind], torch.from_numpy(ms[i]))
            d_sr = torch.nn.functional.l1_loss(
                srs[ind], torch.from_numpy(ys[i]))
        final_loss = d_sr + d_kr
        opt.zero_grad()
        final_loss.backward()
        opt.step()
        ref_losses.append(float(final_loss.detach()))

        state, losses = h.train_batch(
            state, {"lr": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                    "hr": jnp.asarray(ys[i].transpose(0, 2, 3, 1)),
                    "metadata": jnp.asarray(ms[i])})
        got_losses.append(float(losses["train-loss"]))

    deltas = np.abs(np.array(ref_losses) - np.array(got_losses))
    print(f"\nDAN v1 trajectory: worst per-step loss delta "
          f"{deltas.max():.2e} at step {deltas.argmax()}")
    assert deltas.max() < 5e-5, list(zip(ref_losses, got_losses))

    worst = _leaf_close(state.params, convert_by_order(
        {k: v for k, v in net.state_dict().items()
         if k not in ("encoder", "init_kernel", "init_ker_map")}, template),
        atol=5e-4)
    print(f"DAN v1 trajectory: final param worst delta {worst:.2e}")


# ---------------------------------------------------------------------------
# (g) IKC: SFTMD-pretrain -> predictor/corrector alternation (VERDICT r3
#     item 5) — pins the per-child optimizers (fresh Adam moments each),
#     the MSE criteria of IKCPredictorHandler/IKCCorrectorHandler
#     (handlers.py:1041-1066), the pre-update forward feeding the next
#     corrector iteration, and train-loss = min per-iteration SFTMD L1
#     (handlers.py:1155-1193)
# ---------------------------------------------------------------------------

def test_ikc_phase_trajectory(torch, rng):
    import importlib.util

    import ref_loader
    ref_loader.load_q_arch()  # brings up SFTMD_variants + its dep chain
    sft_m = sys.modules["rumpy.SISR.models.SFTMD_variants.architectures"]

    spec = importlib.util.spec_from_file_location(
        "ref_ikc_traj", f"{REF}/SISR/models/blur_kernel_blind_sr/IKC.py")
    ikc_m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ikc_m)

    import jax.numpy as jnp

    from test_arch_parity import _reorder_sftmd_state

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    lr, corr_steps, code_len = 1e-3, 3, 10
    pre_steps, blind_steps = 8, 12

    torch.manual_seed(0)
    sft_net = sft_m.SFTMD(num_features=16, num_blocks=2, scale=4,
                          input_para=code_len, SFT_type="standard")
    pred_net = ikc_m.Predictor(code_length=code_len)
    corr_net = ikc_m.Corrector(code_length=code_len)
    opt_s = torch.optim.Adam(sft_net.parameters(), lr=lr)
    opt_p = torch.optim.Adam(pred_net.parameters(), lr=lr)
    opt_c = torch.optim.Adam(corr_net.parameters(), lr=lr)
    mse = torch.nn.functional.mse_loss
    l1 = torch.nn.functional.l1_loss

    h = get_model("ikc")(scale=4, num_features=16, num_blocks=2,
                         code_length=code_len, sftmd_pretrain_epochs=1,
                         correction_steps=corr_steps, lr=lr,
                         sft_type="standard")
    state = h.init_state()
    template = state.params
    params = dict(state.params)
    params["sr_model"] = convert_by_order(
        _reorder_sftmd_state(sft_net.state_dict()), template["sr_model"])
    params["predictor"] = convert_by_order(pred_net.state_dict(),
                                           template["predictor"])
    params["corrector"] = convert_by_order(corr_net.state_dict(),
                                           template["corrector"])
    state = state.replace(params=params)

    steps = pre_steps + blind_steps
    xs = rng.random((steps, 2, 3, 8, 8)).astype(np.float32)
    ys = rng.random((steps, 2, 3, 32, 32)).astype(np.float32)
    ms = rng.random((steps, 2, code_len)).astype(np.float32)

    def tiled(meta, hw):
        return torch.from_numpy(np.broadcast_to(
            meta[:, :, None, None], meta.shape + (hw, hw)).copy())

    ref_losses, got_losses, ref_plosses, got_plosses = [], [], [], []
    for i in range(steps):
        x, y, meta = (torch.from_numpy(xs[i]), torch.from_numpy(ys[i]),
                      torch.from_numpy(ms[i]))
        if i < pre_steps:
            # SFTMD pretrain on the TRUE code (handlers.py:1095-1100)
            sr = sft_net(x, tiled(ms[i], 8))
            loss = l1(sr, y)
            opt_s.zero_grad()
            loss.backward()
            opt_s.step()
            ref_losses.append(float(loss.detach()))
            ref_plosses.append(0.0)
        else:
            # predictor update on (LR -> code), MSE criterion
            pred_code = pred_net(x)
            p_loss = mse(pred_code, meta)
            opt_p.zero_grad()
            p_loss.backward()
            opt_p.step()
            ref_plosses.append(float(p_loss.detach()))

            # corrector alternation: SFTMD eval (stop-grad), corrector
            # update vs the true code; the PRE-update forward's output
            # feeds the next iteration (q_layer run_train semantics)
            code = pred_code.detach()
            sftmd_losses = []
            for _ in range(corr_steps):
                with torch.no_grad():
                    sr = sft_net(x, tiled(code.numpy(), 8))
                    s_loss = float(l1(sr, y))
                new_code = corr_net(sr, code)
                c_loss = mse(new_code, meta)
                opt_c.zero_grad()
                c_loss.backward()
                opt_c.step()
                code = new_code.detach()
                sftmd_losses.append(s_loss)
            ref_losses.append(min(sftmd_losses))

        h.set_epoch(0 if i < pre_steps else 1)
        state, losses = h.train_batch(
            state, {"lr": jnp.asarray(xs[i].transpose(0, 2, 3, 1)),
                    "hr": jnp.asarray(ys[i].transpose(0, 2, 3, 1)),
                    "metadata": jnp.asarray(ms[i])})
        got_losses.append(float(losses["train-loss"]))
        got_plosses.append(float(losses.get("predictor-loss", 0.0)))

    deltas = np.abs(np.array(ref_losses) - np.array(got_losses))
    p_deltas = np.abs(np.array(ref_plosses) - np.array(got_plosses))
    print(f"\nIKC trajectory: worst train-loss delta {deltas.max():.2e}, "
          f"worst predictor-loss delta {p_deltas.max():.2e}")
    print("per-step train-loss deltas:", np.array2string(deltas, precision=2))
    # 3 corrector Adam sub-updates per blind step compound fp noise ~3x
    # faster than the single-optimizer trajectories; drift stays <3e-4
    # over 12 blind steps while a semantic mismatch (e.g. L1-vs-MSE or
    # SAME-vs-symmetric padding) shows up as >1e-2 from the first step
    assert deltas[:pre_steps].max() < 5e-5, "pretrain phase diverged"
    assert deltas.max() < 3e-4, list(zip(ref_losses, got_losses))
    assert p_deltas.max() < 2e-4

    worst = 0.0
    for child, net in (("sr_model", None), ("predictor", pred_net),
                       ("corrector", corr_net)):
        sd = (_reorder_sftmd_state(sft_net.state_dict())
              if child == "sr_model" else net.state_dict())
        # 1e-3: same Adam-drift budget the ESRGAN boundary test uses —
        # 36 corrector sub-updates compound sign-level fp noise at ~lr
        worst = max(worst, _leaf_close(
            state.params[child], convert_by_order(sd, template[child]),
            atol=1e-3))
    print(f"IKC trajectory: final param worst delta {worst:.2e}")
