"""Batched serving tests: shape bucketing, micro-batching, mesh sharding,
metadata-conditioned models."""

import numpy as np

from rumpy_tpu.registry import get_model
from rumpy_tpu.serving import BatchedPredictor


def test_mixed_size_requests(rng):
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1)
    state = h.init_state()
    pred = BatchedPredictor(h, state, pad_multiple=16, max_batch=4)
    imgs = [rng.random((13, 17, 3)).astype(np.float32),
            rng.random((16, 16, 3)).astype(np.float32),
            rng.random((33, 20, 3)).astype(np.float32)]
    outs = pred.predict(imgs)
    assert [o.shape for o in outs] == [(26, 34, 3), (32, 32, 3),
                                       (66, 40, 3)]
    # same-bucket batching must not change per-image results
    solo = pred.predict([imgs[0]])[0]
    np.testing.assert_allclose(outs[0], solo, atol=2e-5)


def test_mesh_sharded_serving(rng):
    from rumpy_tpu.parallel.mesh import get_mesh
    h = get_model("edsr")(scale=2, num_features=8, num_blocks=1)
    state = h.init_state()
    mesh = get_mesh()
    pred = BatchedPredictor(h, state, mesh=mesh, pad_multiple=16,
                            max_batch=16)
    imgs = [rng.random((16, 16, 3)).astype(np.float32) for _ in range(5)]
    outs = pred.predict(imgs)
    assert all(o.shape == (32, 32, 3) for o in outs)
    ref = pred.predict([imgs[2]])[0]
    np.testing.assert_allclose(outs[2], ref, atol=2e-5)


def test_metadata_conditioned_serving(rng):
    h = get_model("qrcan")(scale=2, metadata=["qpi"], n_feats=8,
                           n_resgroups=1, n_resblocks=1)
    state = h.init_state()
    pred = BatchedPredictor(h, state, pad_multiple=8, max_batch=4)
    imgs = [rng.random((8, 8, 3)).astype(np.float32) for _ in range(2)]
    metas = [np.asarray([0.3], np.float32), np.asarray([0.9], np.float32)]
    outs = pred.predict(imgs, metadata=metas)
    assert all(o.shape == (16, 16, 3) for o in outs)
    # different metadata must give different outputs
    assert not np.allclose(outs[0], outs[1])
