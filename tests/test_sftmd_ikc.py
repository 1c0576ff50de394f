"""SFTMD + IKC tests."""

import numpy as np
import pytest

from rumpy_tpu.registry import get_model


def _batch(rng, n=1, size=8, scale=2, code=4):
    return {"lr": rng.random((n, size, size, 3)).astype(np.float32),
            "hr": rng.random((n, size * scale, size * scale, 3)
                             ).astype(np.float32),
            "metadata": rng.random((n, code)).astype(np.float32)}


@pytest.mark.parametrize("sft_type", ["standard", "concat", "weak", "split"])
def test_sftmd_types(rng, sft_type):
    # 'weak' is a raw elementwise multiply: para must broadcast over
    # features (same constraint as the reference's WeakSft).
    n_meta = 1 if sft_type == "weak" else 4
    h = get_model("sftmd")(scale=2, metadata_bypass_len=n_meta,
                           num_features=8, num_blocks=1, sft_type=sft_type)
    state = h.init_state()
    batch = _batch(rng, code=n_meta)
    sr = h.run_eval(state, batch)
    assert sr.shape == (1, 16, 16, 3)
    _, losses = h.train_batch(state, batch)
    assert np.isfinite(float(losses["train-loss"]))


def test_sftmd_q_injection(rng):
    h = get_model("sftmd")(scale=2, metadata_bypass_len=4, num_features=8,
                           num_blocks=1, q_injection=True)
    state = h.init_state()
    sr = h.run_eval(state, _batch(rng))
    assert sr.shape == (1, 16, 16, 3)


def test_ikc_pretrain_and_loop(rng):
    h = get_model("ikc")(scale=2, sftmd_pretrain_epochs=1,
                         correction_steps=2, code_length=4, num_features=8,
                         num_blocks=1)
    state = h.init_state()
    batch = _batch(rng, n=2)
    # pretrain phase: only SFTMD trains
    h.set_epoch(0)
    state, losses = h.train_batch(state, batch)
    assert float(losses["predictor-loss"]) == 0.0
    # IKC phase: predictor + corrector loop
    h.set_epoch(1)
    state, losses = h.train_batch(state, batch)
    assert "sftmd_loss_0" in losses and "corrector_loss_1" in losses
    assert np.isfinite(float(losses["train-loss"]))
    # train-loss is the best (min) sftmd loss across the loop
    iters = [float(losses[f"sftmd_loss_{i}"]) for i in range(2)]
    assert float(losses["train-loss"]) == pytest.approx(min(iters), rel=1e-5)


def test_ikc_eval_uses_corrector(rng):
    h = get_model("ikc")(scale=2, sftmd_pretrain_epochs=0,
                         correction_steps=2, code_length=4, num_features=8,
                         num_blocks=1)
    h.set_epoch(1)
    state = h.init_state()
    sr = h.run_eval(state, {"lr": rng.random((1, 8, 8, 3)
                                             ).astype(np.float32)})
    assert sr.shape == (1, 16, 16, 3)


def test_ikc_checkpoint(rng, tmp_path):
    h = get_model("ikc")(scale=2, sftmd_pretrain_epochs=0,
                         correction_steps=1, code_length=4, num_features=8,
                         num_blocks=1)
    h.set_epoch(1)
    state = h.init_state()
    state, _ = h.train_batch(state, _batch(rng))
    h.save_model(state, str(tmp_path), epoch=0)
    loaded, _ = h.load_model(str(tmp_path), epoch=0)
    meta = __import__("rumpy_tpu.utils.checkpoint",
                      fromlist=["load_checkpoint"]).load_checkpoint(
        str(tmp_path / "train_model_0"))
    assert meta["handler_metadata"]["best_epoch_cutoff"] == 0


def test_ikc_eval_phase_dispatch(rng):
    """run_eval must re-dispatch per call on curr_epoch: pretrain-phase
    eval scores SFTMD with the ground-truth code; post-pretrain eval runs
    the blind predictor+corrector loop — and a stale jit cache must not
    pin the first-traced branch."""
    import numpy as np
    from rumpy_tpu.registry import get_model
    h = get_model("ikc")(scale=2, sftmd_pretrain_epochs=2,
                         correction_steps=2, code_length=4, num_features=8,
                         num_blocks=1)
    state = h.init_state()
    batch = {"lr": rng.random((1, 8, 8, 3)).astype(np.float32),
             "metadata": rng.random((1, 4)).astype(np.float32)}
    h.set_epoch(0)
    out_pre = np.asarray(h.run_eval(state, batch))
    h.set_epoch(5)
    out_blind = np.asarray(h.run_eval(state, batch))
    assert out_pre.shape == out_blind.shape == (1, 16, 16, 3)
    # ground-truth-code SR vs blind-loop SR differ for random inits
    assert not np.allclose(out_pre, out_blind)
    # a freshly "loaded" blind model without metadata also takes the
    # blind path (no KeyError on the missing ground-truth code)
    h.set_epoch(5)
    out_no_meta = np.asarray(h.run_eval(
        state, {"lr": batch["lr"]}))
    np.testing.assert_allclose(out_no_meta, out_blind, atol=1e-6)
