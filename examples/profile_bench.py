"""Profile the bench.py operating point (VERDICT r2 item 3).

1. Compiles the exact north-star train step (RCAN x4 blind, batch 120,
   48-px LR, fused degradation) and reads XLA's own cost_analysis /
   memory_analysis of the compiled TPU executable: total FLOPs and HBM
   bytes accessed per step.
2. Times steps with host-fetch sync (tunnel-safe), converting to
   achieved TFLOP/s and achieved HBM GB/s -> which roofline wall the
   operating point sits against (v5e: 197 bf16 TFLOP/s, 819 GB/s HBM).
3. Attempts a jax.profiler device trace and reports what was captured
   (works over the tunnel: xplane + chrome trace with per-op TPU events).

Round-3 measured results are recorded in BASELINE.md ("Round-3 profile").
"""
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    import jax
    import jax.numpy as jnp

    from rumpy_tpu.degradations.pipeline import ImagePipeline
    from rumpy_tpu.registry import get_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=("rcan", "bobw"), default="rcan",
                    help="rcan = bench.py north-star step (b120); bobw = "
                         "config #5 flagship at its b96 operating point")
    args = ap.parse_args()

    scale = 4
    if args.model == "bobw":
        batch, lr_patch = 96, 48
        handler = get_model("contrastiveblindqrcan")(
            scale=scale, n_feats=64, n_resgroups=10, n_resblocks=20,
            block_encoder_loading=True, lr=1e-4, dtype="bf16")
    else:
        batch, lr_patch = 120, 48
        handler = get_model("rcan")(scale=scale, n_feats=64,
                                    n_resgroups=10, n_resblocks=20,
                                    lr=1e-4, dtype="bf16")
    hr_patch = lr_patch * scale
    pipe = ImagePipeline(
        [["realesrganblur", "b"], ["downsample", "d"],
         ["realesrgannoise", "n"], ["jpegcompress", "j"]],
        deg_configs={
            "b": {"kernel_range": ["iso", "aniso"], "kernel_size": 21,
                  "request_kernel_metadata": True},
            "d": {"scale": scale},
            "n": {"gaussian_noise_sigma_range": (1, 30)},
            "j": {"quality": 60, "random_compression": True}})

    def input_fn(key, b):
        lr, _meta = pipe.degrade_batch(key, b["hr"])
        return {"lr": lr, "hr": b["hr"]}

    handler.set_input_pipeline(input_fn)
    with jax.default_device(jax.devices("cpu")[0]):
        state = handler.init_state()
    state = jax.device_put(jax.device_get(state), jax.devices()[0])
    hr = jnp.asarray(np.random.default_rng(0).random(
        (batch, hr_patch, hr_patch, 3)).astype(np.float32))

    print(f"[{time.strftime('%H:%M:%S')}] lowering + compiling "
          f"(expect 2-10 min over the tunnel)...", flush=True)
    t0 = time.perf_counter()
    lowered = handler._train_step.lower(state, {"hr": hr})
    compiled = lowered.compile()
    print(f"compile took {time.perf_counter() - t0:.1f}s", flush=True)

    for name, fn in (("cost_analysis", compiled.cost_analysis),
                     ("memory_analysis", compiled.memory_analysis)):
        try:
            res = fn()
            if name == "cost_analysis":
                ca = res[0] if isinstance(res, (list, tuple)) else res
                keep = {k: v for k, v in sorted(ca.items())
                        if ("flops" in k or "bytes accessed" in k
                            or "utilization" in k.lower()
                            or "optimal" in k) and v}
                print("COST_ANALYSIS " + json.dumps(keep), flush=True)
                globals()["_ca"] = ca
            else:
                print(f"MEMORY_ANALYSIS {res}", flush=True)
        except Exception as e:
            print(f"{name} unavailable: {type(e).__name__}: {e}",
                  flush=True)

    # timed steps, host-fetch synced
    for _ in range(3):
        state, losses = handler._train_step(state, {"hr": hr})
    float(losses["train-loss"])
    n, best = 20, None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            state, losses = handler._train_step(state, {"hr": hr})
        float(losses["train-loss"])
        w = time.perf_counter() - t0
        best = w if best is None else min(best, w)
    step_s = best / n
    print(f"step time: {step_s * 1000:.1f} ms "
          f"({n / best * batch * hr_patch**2 / 1e6:.2f} HR-MP/s)",
          flush=True)

    ca = globals().get("_ca")
    if ca:
        flops = ca.get("flops", 0.0)
        hbm = ca.get("bytes accessed", 0.0)
        print(json.dumps({
            "flops_per_step": flops,
            "bytes_accessed_per_step": hbm,
            "achieved_tflops": round(flops / step_s / 1e12, 1),
            "achieved_hbm_gbps": round(hbm / step_s / 1e9, 1),
            "mfu_vs_197tflops": round(flops / step_s / 197e12, 3),
            "hbm_util_vs_819gbps": round(hbm / step_s / 819e9, 3),
            "arithmetic_intensity": round(flops / hbm, 1) if hbm else None,
        }), flush=True)

    # device trace attempt
    trace_dir = "/tmp/jax_trace"
    try:
        jax.profiler.start_trace(trace_dir)
        for _ in range(3):
            state, losses = handler._train_step(state, {"hr": hr})
        float(losses["train-loss"])
        jax.profiler.stop_trace()
        files = glob.glob(os.path.join(trace_dir, "**", "*"),
                          recursive=True)
        print("TRACE_FILES " + json.dumps(
            [f for f in files if os.path.isfile(f)]), flush=True)
        for f in files:
            if f.endswith(".trace.json.gz"):
                _summarize_trace(f, n_traced_steps=3)
    except Exception as e:
        print(f"trace failed: {type(e).__name__}: {e}", flush=True)


def _summarize_trace(path, n_traced_steps):
    """Aggregate TPU device time by fusion category from the chrome
    trace — 'where does the step go' at op granularity."""
    import collections
    import gzip
    import re
    with gzip.open(path) as f:
        ev = json.load(f)["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
    tot, cnt = collections.Counter(), collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            n = e["name"]
            # skip the whole-program wrapper and per-step envelope events
            if n.startswith("jit_") or n.isdigit():
                continue
            m = re.match(r"[a-zA-Z_\-]+", n)
            cat = m.group(0).rstrip("._-") if m else n
            tot[cat] += e.get("dur", 0)
            cnt[cat] += 1
    print(f"device time by op category (ms/step, {n_traced_steps} traced "
          f"steps; total {sum(tot.values()) / 1e3 / n_traced_steps:.1f}):",
          flush=True)
    for c, d in tot.most_common(12):
        print(f"  {c:32} {d / 1e3 / n_traced_steps:8.2f} ms  "
              f"x{cnt[c] // n_traced_steps}", flush=True)


if __name__ == "__main__":
    main()
