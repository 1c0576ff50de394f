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
