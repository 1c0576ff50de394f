"""END-TO-END PSNR parity on real Set5 data — the BASELINE.json north star
(≤0.01 dB).

Reference torch networks (random init, weights converted with
utils/torch_convert) are evaluated with the REFERENCE's own eval
semantics — its psnr() (sr_tools/metrics.py:33-44), its jpg-mode BT.601
ycbcr_convert (image_functions.py:72-105), its clip-then-convert chain
(base_interface.py:207-222, SISR/models/interface.py:103-124) and its
PIL-bicubic reference upsample (standard_eval.py:240-276) — all loaded
from /root/reference at test time. The SAME images then go through this
repo's full `eval_sisr` CLI (config TOML -> EvalHub -> SISRInterface ->
checkpoint load -> metrics CSV), and per-image PSNR deltas from the
produced individual_metrics.csv are asserted ≤ 0.01 dB.

Data: /root/reference/Data/example_data/Set5 — real Set5 HR images plus
the shipped x4 `lr_random_blur` blind set with its
degradation_metadata.csv (10-component PCA blur kernels)."""

import os

import numpy as np
import pandas as pd
import pytest
from click.testing import CliRunner
from PIL import Image

import ref_loader

SET5 = "/root/reference/Data/example_data/Set5"
HR_DIR = os.path.join(SET5, "hr")
BLIND_LR_DIR = os.path.join(SET5, "lr_random_blur")

pytestmark = pytest.mark.skipif(not os.path.isdir(HR_DIR),
                                reason="reference Set5 data not mounted")


def _ref_eval_psnr(sr_chw, hr_chw, imf, psnr):
    """The reference metric chain: clip RGB to [0,1]
    (_standard_image_formatting), jpg-mode YCbCr, PSNR on the Y channel
    with max_value=1 (standard_eval.py:278-309 + metrics.py:105-121)."""
    sr = np.clip(sr_chw, 0.0, 1.0).astype(np.float32)
    hr = np.clip(hr_chw, 0.0, 1.0).astype(np.float32)
    sr_ycc = imf.ycbcr_convert(sr.copy(), im_type="jpg", input="rgb",
                               y_only=False)
    hr_ycc = imf.ycbcr_convert(hr.copy(), im_type="jpg", input="rgb",
                               y_only=False)
    return float(psnr(sr_ycc[0], hr_ycc[0], max_value=1))


def _load_chw(path):
    """ToTensor semantics: uint8 PNG -> float32 [0,1], CHW."""
    arr = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return arr.transpose(2, 0, 1)


def _make_experiment(tmp_path, name, model_name, internal_params, state):
    from rumpy_tpu.config.loader import dump_toml
    exp = tmp_path / "Results" / name
    os.makedirs(exp / "saved_models", exist_ok=True)
    dump_toml({"model": {"name": model_name,
                         "internal_params": internal_params}},
              str(exp / "config.toml"))
    return exp


def _run_eval_cli(tmp_path, experiment, lr_dir, out_name):
    from rumpy_tpu.cli.eval_sisr import main as eval_main
    from rumpy_tpu.config.loader import dump_toml
    out_loc = tmp_path / out_name
    cfg = {
        "model_loc": str(tmp_path / "Results"),
        "out_loc": str(out_loc),
        "scale": 4,
        "metrics": ["PSNR", "SSIM"],
        "data": {"lr_dir": str(lr_dir), "hr_dir": HR_DIR,
                 "metadata_file": "on_site"},
        "models": [{"experiment": experiment, "epoch": 0}],
    }
    p = tmp_path / f"{out_name}.toml"
    dump_toml(cfg, str(p))
    r = CliRunner().invoke(eval_main, ["--config", str(p)])
    assert r.exit_code == 0, r.output + repr(r.exception)
    return pd.read_csv(out_loc / "individual_metrics.csv",
                       header=[0, 1], index_col=0)


def test_set5_bicubic_rcan_psnr_parity(tmp_path):
    """RCAN x4 over bicubic-downsampled Set5: reference eval semantics vs
    our full eval_sisr CLI, per-image PSNR delta ≤ 0.01 dB for both the
    model outputs and the bicubic reference column."""
    import torch

    imf = ref_loader.load_image_functions()
    psnr = ref_loader.load_ref_psnr()
    arch = ref_loader.load_advanced_arch()

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    # bicubic x4 LR set, shared bit-identical by both frameworks
    lr_dir = tmp_path / "lr_bicubic"
    os.makedirs(lr_dir)
    for f in sorted(os.listdir(HR_DIR)):
        im = Image.open(os.path.join(HR_DIR, f)).convert("RGB")
        im.resize((im.width // 4, im.height // 4),
                  Image.BICUBIC).save(lr_dir / f)

    torch.manual_seed(0)
    net = arch.RCAN(scale=4, n_resblocks=2, n_resgroups=2, n_feats=16)
    net.eval()

    params_cfg = dict(scale=4, n_resblocks=2, n_resgroups=2, n_feats=16)
    handler = get_model("rcan")(**params_cfg)
    state = handler.init_state()
    state = state.replace(params=convert_by_order(net.state_dict(),
                                                  state.params))
    exp = _make_experiment(tmp_path, "set5_rcan", "rcan", params_cfg, state)
    handler.save_model(state, str(exp / "saved_models"), 0)

    # ---- reference-side eval (their semantics, their code) ----
    ref_model_psnr, ref_bic_psnr = {}, {}
    for f in sorted(os.listdir(HR_DIR)):
        hr = _load_chw(os.path.join(HR_DIR, f))
        lr = _load_chw(lr_dir / f)
        with torch.no_grad():
            sr = net(torch.from_numpy(lr)[None])[0].numpy()
        ref_model_psnr[f] = _ref_eval_psnr(sr, hr, imf, psnr)
        # reference bicubic upsample: PIL resize on the uint8 image
        # (standard_eval.py:240-276 via ToPILImage round-trip)
        lr_im = Image.open(lr_dir / f).convert("RGB")
        bic = np.asarray(lr_im.resize((lr_im.width * 4, lr_im.height * 4),
                                      Image.BICUBIC),
                         np.float32).transpose(2, 0, 1) / 255.0
        ref_bic_psnr[f] = _ref_eval_psnr(bic, hr, imf, psnr)

    # ---- our side: the full eval_sisr CLI ----
    df = _run_eval_cli(tmp_path, "set5_rcan", lr_dir, "eval_bicubic")
    assert len(df) == 5
    deltas = {}
    for f in ref_model_psnr:
        ours = float(df.loc[f, ("set5_rcan", "PSNR")])
        ours_bic = float(df.loc[f, ("bicubic", "PSNR")])
        deltas[f] = (abs(ours - ref_model_psnr[f]),
                     abs(ours_bic - ref_bic_psnr[f]))
    worst_model = max(d[0] for d in deltas.values())
    worst_bic = max(d[1] for d in deltas.values())
    print(f"\nSet5 bicubic RCAN deltas (dB): model={worst_model:.5f} "
          f"bicubic={worst_bic:.5f}")
    for f, (dm, db) in sorted(deltas.items()):
        print(f"  {f}: model {dm:.5f}, bicubic {db:.5f} "
              f"(ref {ref_model_psnr[f]:.4f} / {ref_bic_psnr[f]:.4f})")
    assert worst_model <= 0.01, deltas
    assert worst_bic <= 0.01, deltas


def test_set5_blind_qrcan_psnr_parity(tmp_path):
    """QRCAN x4 (meta-attention, blur_kernel metadata) over the SHIPPED
    blind Set5 set: our eval_sisr ingests degradation_metadata.csv itself;
    the reference side feeds the same 10-dim PCA kernel directly. Proves
    the whole blind-SR eval chain (CSV ingestion -> metadata selection ->
    QRCAN forward -> metric) matches ≤ 0.01 dB."""
    import torch

    imf = ref_loader.load_image_functions()
    psnr = ref_loader.load_ref_psnr()
    qarch = ref_loader.load_q_arch()

    from test_arch_parity import _reorder_qrcan_state

    from rumpy_tpu.registry import get_model
    from rumpy_tpu.utils.torch_convert import convert_by_order

    torch.manual_seed(1)
    net = qarch.QRCAN(scale=4, n_resblocks=2, n_resgroups=2, n_feats=16,
                      reduction=16, style="max_concat", num_metadata=10,
                      include_q_layer=True)
    net.eval()

    params_cfg = dict(scale=4, n_resblocks=2, n_resgroups=2, n_feats=16,
                      reduction=16, style="max_concat",
                      metadata=["blur_kernel"], include_q_layer=True)
    handler = get_model("qrcan")(**params_cfg)
    assert handler.num_metadata == 10
    state = handler.init_state()
    state = state.replace(
        params=convert_by_order(_reorder_qrcan_state(net.state_dict()),
                                state.params))
    exp = _make_experiment(tmp_path, "set5_qrcan", "qrcan", params_cfg,
                           state)
    handler.save_model(state, str(exp / "saved_models"), 0)

    # reference-side: metadata straight from the shipped CSV
    meta_df = pd.read_csv(
        os.path.join(BLIND_LR_DIR, "degradation_metadata.csv"),
        index_col=0)
    import json
    ref_psnr_by_im = {}
    for f in sorted(meta_df.index):
        hr = _load_chw(os.path.join(HR_DIR, f))
        lr = _load_chw(os.path.join(BLIND_LR_DIR, f))
        kernel = np.asarray(json.loads(meta_df.loc[f, "blur_kernel"]),
                            np.float32)
        with torch.no_grad():
            sr = net(torch.from_numpy(lr)[None],
                     torch.from_numpy(kernel)[None, :, None, None]
                     )[0].numpy()
        ref_psnr_by_im[f] = _ref_eval_psnr(sr, hr, imf, psnr)

    df = _run_eval_cli(tmp_path, "set5_qrcan", BLIND_LR_DIR, "eval_blind")
    assert len(df) == 5
    deltas = {f: abs(float(df.loc[f, ("set5_qrcan", "PSNR")]) - p)
              for f, p in ref_psnr_by_im.items()}
    worst = max(deltas.values())
    print(f"\nSet5 blind QRCAN deltas (dB): worst={worst:.5f}")
    for f, d in sorted(deltas.items()):
        print(f"  {f}: {d:.5f} (ref {ref_psnr_by_im[f]:.4f})")
    assert worst <= 0.01, deltas
