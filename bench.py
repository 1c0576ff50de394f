"""Benchmark: RCAN x4 blind-SR training throughput on one chip.

Measures the north-star metric (BASELINE.json): HR megapixels/sec/chip for
RCAN x4 training on DIV2K-sized patches, with the FULL blind-SR pipeline —
on-device degradation (blur + downsample + noise + JPEG) fused into the
jitted train step — so the number includes datagen, forward, backward and
the optimizer, everything the reference did per batch (per-image CPU/PIL
degradation + CUDA training; SURVEY.md §3.1/§3.3).

Baseline constant: the reference publishes no throughput numbers
(BASELINE.md). The denominator is MEASURED-ANCHORED: the reference's own
per-image degradation chain (its real_esrgan_blur kernel gen + filter2D +
PIL bicubic downsample + noise + PIL JPEG, run from /root/reference) was
timed at 0.220 HR-MP/s per CPU worker (6.0 images/s at 192x192); with the
8 DataLoader workers of a typical training box its input pipeline caps at
~1.76 HR-MP/s, below any plausible V100 step rate for RCAN x4 — the
reference is input-bound (SURVEY.md §3.3), so 1.76 is its end-to-end
ceiling and a conservative denominator. Measurement script recorded in
BASELINE.md.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

# measured: 0.220 MP/s/worker x 8 workers (see module docstring)
BASELINE_MP_PER_SEC = 1.76


def main():
    # A hung accelerator tunnel blocks the first backend access forever;
    # probe in a throwaway subprocess and bail with a parseable JSON line
    # rather than hanging the driver (observed: multi-hour axon outages).
    import __graft_entry__ as _ge
    if not _ge._default_backend_usable(timeout=300):
        print(json.dumps({
            "metric": "rcan_x4_blind_train_throughput", "value": 0.0,
            "unit": "HR_megapixels/sec/chip", "vs_baseline": 0.0,
            "error": "default backend unreachable (hung tunnel?) — "
                     "bench skipped"}))
        return

    import jax
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model

    # Batch sweep on v5e (ms/step -> MP/s): 32:133->8.9, 64:308->7.7,
    # 80:313->9.4, 96:314->11.3, 112:316->13.1, 120:317->13.9, 128:HBM
    # spill. Step time is flat from 64-120 (XLA's conv tiling improves
    # with the larger spatial M dim), so run at the largest batch that
    # fits: 120 (~10.6 GB stored activations of 16 GB HBM).
    batch = 120
    lr_patch = 48
    scale = 4
    hr_patch = lr_patch * scale  # 192

    handler = get_model("rcan")(scale=scale, n_feats=64, n_resgroups=10,
                                n_resblocks=20, lr=1e-4, dtype="bf16")

    pipe = _build_pipe(scale)

    def input_fn(key, b):
        lr, _meta = pipe.degrade_batch(key, b["hr"])
        return {"lr": lr, "hr": b["hr"]}

    handler.set_input_pipeline(input_fn)
    state = _init_on_cpu(handler)

    hr = jnp.asarray(np.random.default_rng(0).random(
        (batch, hr_patch, hr_patch, 3)).astype(np.float32))

    # warmup / compile. NOTE: synchronization is a HOST FETCH of the
    # loss (float(...)), not block_until_ready — under the remote-TPU
    # tunnel block_until_ready returns before execution completes, which
    # silently times dispatch instead of compute.
    t_compile = time.perf_counter()
    for _ in range(3):
        state, losses = handler._train_step(state, {"hr": hr})
    float(losses["train-loss"])
    t_compile = time.perf_counter() - t_compile

    # best of 3 windows — robust to tunnel/dispatch jitter
    n_steps = 20
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, losses = handler._train_step(state, {"hr": hr})
        float(losses["train-loss"])  # forces the whole window
        window = time.perf_counter() - t0
        best = window if best is None else min(best, window)
    elapsed = best

    steps_per_sec = n_steps / elapsed
    mp_per_sec = steps_per_sec * batch * hr_patch * hr_patch / 1e6

    # ---- secondary metrics (VERDICT r2 item 7 / r3 item 4) — printed
    # BEFORE the primary line so the driver's tail-parse still lands on
    # the north star; failures here never mask the primary number. Each
    # extra program costs 2-10 unpredictable minutes of remote compile
    # over the axon tunnel (measured; the persistent compile cache does
    # not help there), so each secondary runs in its OWN subprocess
    # under a hard wall-clock budget: whatever completes is emitted,
    # whatever hangs is killed and skipped. RUMPY_TPU_BENCH_FAST=1 skips
    # them entirely.
    import os
    if not os.environ.get("RUMPY_TPU_BENCH_FAST"):
        for line in _run_secondaries_bounded():
            print(json.dumps(line))

    print(json.dumps({
        "metric": "rcan_x4_blind_train_throughput",
        "value": round(mp_per_sec, 3),
        "unit": "HR_megapixels/sec/chip",
        "vs_baseline": round(mp_per_sec / BASELINE_MP_PER_SEC, 3),
    }))


def _init_on_cpu(handler):
    """Eager init over the remote-TPU tunnel costs one round trip PER OP
    (minutes for a full-size model); init on the coexisting CPU backend
    and transfer the finished pytree once."""
    import jax
    with jax.default_device(jax.devices("cpu")[0]):
        state = handler.init_state()
    return jax.device_put(jax.device_get(state), jax.devices()[0])


def _build_pipe(scale):
    from rumpy_tpu.degradations.pipeline import ImagePipeline
    return ImagePipeline(
        [["realesrganblur", "b"], ["downsample", "d"],
         ["realesrgannoise", "n"], ["jpegcompress", "j"]],
        deg_configs={
            "b": {"kernel_range": ["iso", "aniso"], "kernel_size": 21,
                  "request_kernel_metadata": True},
            "d": {"scale": scale},
            "n": {"gaussian_noise_sigma_range": (1, 30)},
            "j": {"quality": 60, "random_compression": True}})


def _run_secondaries_bounded():
    """Attempt each secondary metric in a subprocess with a hard
    wall-clock budget (default 900 s each, RUMPY_TPU_BENCH_SECONDARY_
    TIMEOUT overrides); emit the JSON lines of whichever complete."""
    import os
    import subprocess
    import sys

    budget = float(os.environ.get("RUMPY_TPU_BENCH_SECONDARY_TIMEOUT",
                                  "900"))
    lines = []
    for name in ("bobw", "eval"):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--secondary", name],
                capture_output=True, text=True, timeout=budget)
            for ln in r.stdout.splitlines():
                try:
                    obj = json.loads(ln)
                except ValueError:
                    continue
                if isinstance(obj, dict) and "metric" in obj:
                    lines.append(obj)
        except subprocess.TimeoutExpired:
            lines.append({"metric": f"secondary_{name}_skipped",
                          "value": 0.0,
                          "unit": f"timeout>{budget:.0f}s"})
        except Exception as e:  # pragma: no cover
            lines.append({"metric": f"secondary_{name}_error",
                          "value": str(e)})
    return lines


def _secondary_bobw(scale=4):
    """BoBW (config #5) blind train MP/s."""
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model

    pipe = _build_pipe(scale)
    # BoBW flagship: frozen-encoder ContrastiveBlindQRCAN (config #5) —
    # E(lr) embedding -> QRCAN(x, embedding), full-size generator, same
    # fused on-device degradation chain.
    # step time is near-flat from batch 64 (310 ms) to 96 (324 ms) —
    # same conv-tiling pattern as RCAN — and batch 120 spills HBM, so
    # 96 is the best BoBW operating point (measured round 3).
    batch, lr_patch = 96, 48
    hr_patch = lr_patch * scale
    bobw = get_model("contrastiveblindqrcan")(
        scale=scale, n_feats=64, n_resgroups=10, n_resblocks=20,
        block_encoder_loading=True, lr=1e-4, dtype="bf16")

    def input_fn(key, b):
        lr, _meta = pipe.degrade_batch(key, b["hr"])
        return {"lr": lr, "hr": b["hr"]}

    bobw.set_input_pipeline(input_fn)
    bstate = _init_on_cpu(bobw)
    hr = jnp.asarray(np.random.default_rng(1).random(
        (batch, hr_patch, hr_patch, 3)).astype(np.float32))
    for _ in range(3):
        bstate, blosses = bobw._train_step(bstate, {"hr": hr})
    float(blosses["train-loss"])
    n_steps, best = 10, None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            bstate, blosses = bobw._train_step(bstate, {"hr": hr})
        float(blosses["train-loss"])
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    bobw_mp = n_steps / best * batch * hr_patch * hr_patch / 1e6
    return [{"metric": "bobw_qrcan_x4_blind_train_throughput",
             "value": round(bobw_mp, 3),
             "unit": "HR_megapixels/sec/chip",
             "vs_baseline": round(bobw_mp / BASELINE_MP_PER_SEC, 3)}]


def _secondary_eval(scale=4):
    """Full-image eval throughput at the Set5 working shape (baby.png LR
    is 128x128 at x4): steady-state jitted forward, host-fetch synced."""
    import jax.numpy as jnp

    from rumpy_tpu.registry import get_model

    ev = get_model("rcan")(scale=scale, n_feats=64, n_resgroups=10,
                           n_resblocks=20, dtype="bf16")
    estate = _init_on_cpu(ev)
    img = jnp.asarray(np.random.default_rng(2).random(
        (1, 128, 128, 3)).astype(np.float32))
    out = ev.run_eval(estate, {"lr": img})
    np.asarray(out)  # compile + fetch
    n_im, best = 20, None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_im):
            out = ev.run_eval(estate, {"lr": img})
        np.asarray(out)
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    return [{"metric": "rcan_x4_eval_throughput_128px",
             "value": round(n_im / best, 3),
             "unit": "images/sec/chip"}]


if __name__ == "__main__":
    import sys
    if len(sys.argv) == 3 and sys.argv[1] == "--secondary":
        fn = {"bobw": _secondary_bobw, "eval": _secondary_eval}[sys.argv[2]]
        for line in fn():
            print(json.dumps(line))
    else:
        main()
