"""BiSeNet face-parsing port: golden forward parity against the
REFERENCE's own torch implementation (sr_tools/face_segmentation/
{models,resnet}.py, random weights) + segmenter/CLI drive."""

import os

import numpy as np
import pytest

import ref_loader

REF = ref_loader.REF


@pytest.fixture(scope="module")
def ref_bisenet():
    ref_loader._install_stubs()
    import torch
    import torch.utils.model_zoo as modelzoo
    # Resnet18.init_weight downloads ImageNet weights (resnet.py:82-88);
    # no egress here — random init is all the parity test needs.
    modelzoo.load_url = lambda *a, **k: {}
    ref_loader._skeleton(["rumpy", "rumpy.sr_tools",
                          "rumpy.sr_tools.face_segmentation"])
    ref_loader._load(
        "rumpy.sr_tools.face_segmentation.resnet",
        f"{REF}/rumpy/sr_tools/face_segmentation/resnet.py")
    models = ref_loader._load(
        "ref_bisenet_models",
        f"{REF}/rumpy/sr_tools/face_segmentation/models.py")
    return models, torch


def test_bisenet_forward_parity(ref_bisenet, rng):
    models, torch = ref_bisenet
    import jax
    import jax.numpy as jnp

    from rumpy_tpu.utils.face_segmentation import (BiSeNet,
                                                   convert_torch_bisenet)

    torch.manual_seed(0)
    net = models.BiSeNet(n_classes=19)
    net.eval()
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_outs = [o.numpy() for o in net(torch.from_numpy(x))]

    variables = jax.tree_util.tree_map(
        jnp.asarray, convert_torch_bisenet(net.state_dict()))
    mod = BiSeNet(n_classes=19)
    got_outs = mod.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    for i, (ref, got) in enumerate(zip(ref_outs, got_outs)):
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   ref, atol=3e-4,
                                   err_msg=f"head {i}")


def test_bisenet_segmenter_and_cli(ref_bisenet, rng, tmp_path):
    """face_segment CLI runs end-to-end given a converted checkpoint
    (VERDICT r1 item 5 'Done' criterion)."""
    models, torch = ref_bisenet
    from click.testing import CliRunner
    from PIL import Image

    from rumpy_tpu.cli.face_cli import face_segment
    from rumpy_tpu.utils.face_segmentation import (BiSeNetSegmenter,
                                                   convert_torch_bisenet)

    torch.manual_seed(1)
    net = models.BiSeNet(n_classes=19)
    npz = str(tmp_path / "bisenet.npz")
    convert_torch_bisenet(net.state_dict(), out_npz=npz)

    seg = BiSeNetSegmenter(npz)
    parsing = seg.parse((rng.random((96, 80, 3)) * 255).astype(np.uint8))
    assert parsing.shape == (512, 512)
    assert parsing.dtype in (np.int32, np.int64)
    assert 0 <= parsing.min() and parsing.max() < 19

    in_dir = tmp_path / "faces"
    os.makedirs(in_dir)
    for i in range(2):
        Image.fromarray((rng.random((64, 64, 3)) * 255
                         ).astype(np.uint8)).save(in_dir / f"f{i}.png")
    out_dir = tmp_path / "seg_out"
    r = CliRunner().invoke(face_segment,
                           ["-i", str(in_dir), "-o", str(out_dir),
                            "--weights", npz,
                            "--save_superimposed_images"])
    assert r.exit_code == 0, r.output + repr(r.exception)
    assert (out_dir / "f0.png").is_file()
    assert (out_dir / "f0_superimposed.png").is_file()
    assert Image.open(out_dir / "f0.png").size == (64, 64)


def test_face_segment_cli_gated_without_weights(tmp_path):
    from click.testing import CliRunner

    from rumpy_tpu.cli.face_cli import face_segment
    os.makedirs(tmp_path / "empty")
    r = CliRunner().invoke(face_segment, ["-i", str(tmp_path / "empty"),
                                          "-o", str(tmp_path / "out")])
    assert r.exit_code != 0
    assert "BiSeNet checkpoint" in r.output
