"""On-chip measurement: fused VMEM-resident RCAB vs XLA fusion
(VERDICT r3 item 8 — validate the BASELINE.md byte-headroom claim).

Runs a 20-block RCAB chain (one RCAN residual group's worth) at the
bench operating shapes (batch 120 x 48 px x 64 ch, bf16) both ways and
prints ms/chain + effective HBM GB/s. The roofline analysis predicts the
fused kernel cuts per-block HBM traffic ~3x (x in + y out vs XLA's
inter-fusion round trips), which on the HBM wall should read as up to
~3x on this forward microbench — and, folded into the full training
step (fwd is ~37% of step time, backward unfused), at most the ~5%
step-level headroom BASELINE.md estimated.

MEASURED OUTCOME (v5e, recorded in BASELINE.md): refuted — XLA 0.415
ms/block (98.1 TFLOP/s, at the 64-ch MXU-packing ceiling, i.e. the
forward chain is compute-bound, not HBM-bound) vs Pallas 1.030 ms/block
(the 9-shifted-matmul conv contracts K=64 x N=64 = quarter packing).

Usage: python examples/pallas_rcab_bench.py [--batch 120] [--px 48]
       [--blocks 20] [--platform cpu]  (cpu = tiny-shape smoke)
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=120)
    ap.add_argument("--px", type=int, default=48)
    ap.add_argument("--blocks", type=int, default=20)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.ops.pallas.rcab_fused import rcab_fused, rcab_reference

    # pallas compiles only on TPU; CPU smoke runs the interpreter
    interp = jax.devices()[0].platform == "cpu"

    n, px, c, r = args.batch, args.px, 64, 16
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((n, px, px, c)), dt)
    ws = []
    for _ in range(args.blocks):
        ws.append(tuple(jnp.asarray(a, dt) for a in (
            rng.standard_normal((9, c, c)) * 0.02,
            rng.standard_normal((c,)) * 0.01,
            rng.standard_normal((9, c, c)) * 0.02,
            rng.standard_normal((c,)) * 0.01,
            rng.standard_normal((c, c // r)) * 0.1,
            rng.standard_normal((c // r,)) * 0.01,
            rng.standard_normal((c // r, c)) * 0.1,
            rng.standard_normal((c,)) * 0.01)))

    from jax import lax

    def chain(x, fused):
        for w in ws:
            x = (rcab_fused(x, *w, interpret=interp) if fused
                 else rcab_reference(x, *w))
        return x

    @jax.jit
    def chain_fused(x):
        return chain(x, True)

    @jax.jit
    def chain_xla(x):
        return chain(x, False)

    # Timing runs the repeat loop INSIDE one jit program (scan threading
    # x through `iters` chain applications, data dependency prevents
    # elision): per-call host->tunnel dispatch is ~13 ms here, an order
    # of magnitude above the kernel itself, so per-call wall timing
    # measures the tunnel, not the chip.
    def measure(fused, label):
        @jax.jit
        def chain_n(x):
            y = lax.scan(lambda x, _: (chain(x, fused), ()),
                         x, None, length=args.iters)[0]
            # reduce ON DEVICE: fetching the full (N,H,W,C) result
            # through the tunnel costs ~100x the kernel itself
            return jnp.sum(y.astype(jnp.float32))

        np.asarray(chain_n(x))  # compile + host-fetch sync (tunnel-safe)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(chain_n(x))
            el = (time.perf_counter() - t0) / args.iters
            best = el if best is None else min(best, el)
        tile_gb = n * px * px * c * 2 / 1e9
        min_traffic = 2 * args.blocks * tile_gb  # in+out per block
        print(f"{label}: {best * 1e3:.2f} ms/chain "
              f"({best * 1e3 / args.blocks:.3f} ms/block; min-traffic "
              f"BW {min_traffic / best:.0f} GB/s)")
        return best

    # numeric sanity at the measured dtype
    d = np.abs(np.asarray(chain_fused(x), np.float32)
               - np.asarray(chain_xla(x), np.float32)).max()
    print(f"max |fused - xla| over {args.blocks}-block bf16 chain: {d:.4f}")

    t_xla = measure(False, "xla  ")
    t_fused = measure(True, "pallas")
    print(f"speedup: {t_xla / t_fused:.2f}x")


if __name__ == "__main__":
    main()
