"""Pallas kernel tests (interpret mode on CPU; the same kernels compile
on TPU — benchmarked at 2.3x the XLA path on v5e, see kernel docstring)."""

import numpy as np
import pytest


def test_pallas_entropy_matches_bruteforce(rng):
    import jax.numpy as jnp
    from rumpy_tpu.ops.pallas.entropy_kernel import local_entropy_pallas
    img = (rng.random((16, 128)) * 255).astype(np.uint8)
    got = np.asarray(local_entropy_pallas(jnp.asarray(img), region=3,
                                          levels=8, interpret=True))
    q = (img.astype(np.int64) * 8) // 256
    qp = np.pad(q, ((1, 1), (0, 0)), mode="edge")  # kernel edge-pads rows
    for y in range(1, 15):
        for x in range(1, 127):
            win = qp[y:y + 3, x - 1:x + 2]
            _, cnt = np.unique(win, return_counts=True)
            p = cnt / cnt.sum()
            want = -(p * np.log2(p)).sum()
            assert abs(got[y, x] - want) < 1e-5, (y, x)


import pytest


@pytest.mark.parametrize("region", [9, 10])
def test_pallas_entropy_matches_xla_interior(rng, region):
    """Odd AND even regions: the XLA box filter's ceil-left anchor must
    agree with the Pallas kernel's [x-r//2, x+(r-1)//2] window (and with
    skimage's even-footprint center)."""
    import jax.numpy as jnp
    from rumpy_tpu.ops.entropy import local_entropy
    from rumpy_tpu.ops.pallas.entropy_kernel import local_entropy_pallas
    img = (rng.random((40, 128)) * 255).astype(np.uint8)
    ref = np.asarray(local_entropy(jnp.asarray(img.astype(np.float32)),
                                   region=region, levels=32))
    got = np.asarray(local_entropy_pallas(jnp.asarray(img), region=region,
                                          levels=32, interpret=True))
    m = region
    np.testing.assert_allclose(got[m:-m, m:-m], ref[m:-m, m:-m], atol=1e-4)


def test_rcab_fused_matches_xla(rng):
    """Fused VMEM-resident RCAB block == the XLA-op reference on f32
    (exact conv semantics; bf16 is measured on-chip in
    examples/pallas_rcab_bench.py)."""
    import jax.numpy as jnp
    from rumpy_tpu.ops.pallas.rcab_fused import rcab_fused, rcab_reference

    n, h, w, c, r = 2, 12, 16, 64, 16
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((9, c, c)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((9, c, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)
    wd = jnp.asarray(rng.standard_normal((c, c // r)) * 0.1, jnp.float32)
    bd = jnp.asarray(rng.standard_normal((c // r,)) * 0.01, jnp.float32)
    wu = jnp.asarray(rng.standard_normal((c // r, c)) * 0.1, jnp.float32)
    bu = jnp.asarray(rng.standard_normal((c,)) * 0.01, jnp.float32)

    got = np.asarray(rcab_fused(x, w1, b1, w2, b2, wd, bd, wu, bu,
                                interpret=True))
    want = np.asarray(rcab_reference(x, w1, b1, w2, b2, wd, bd, wu, bu))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
