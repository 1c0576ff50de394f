"""Face-recognition metric machinery tests (reference:
sr_tools/metrics.py:395-913 FaceRecognizer: CMC with tie resolution,
ROC/AUC/EER)."""

import numpy as np
import pytest

from rumpy_tpu.utils.face_recognition import (
    FaceRecognizer, calculate_accuracy, cumulative_match, distance_feats,
    plot_cmc, roc_main)


def test_distance_feats_methods():
    v = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    u = np.asarray([[1.0, 0.0], [2.0, 0.0]])
    l2 = distance_feats(v, u, "l2")
    assert np.allclose(l2, [[0.0, 1.0], [np.sqrt(2), np.sqrt(5)]])
    l1 = distance_feats(v, u, "l1")
    assert np.allclose(l1, [[0.0, 1.0], [2.0, 3.0]])
    cos = distance_feats(v, u, "cosine")
    assert np.allclose(cos[0, 0], 0.0) and np.allclose(cos[0, 1], 0.0)
    assert np.allclose(cos[1, 0], 1.0)
    with pytest.raises(ValueError):
        distance_feats(v, u, "haversine-ish")


def test_cumulative_match_basic():
    # probe 0 is closest to gallery id 'a' (correct), probe 1's correct
    # match 'b' is second-closest -> rank 2
    dist = np.asarray([[0.1, 0.5, 0.9],
                       [0.2, 0.3, 0.8]])
    cmc_x, cmc_y, ranks = cumulative_match(
        dist, ["a", "b"], ["a", "b", "c"])
    assert list(ranks) == [1.0, 2.0]
    assert cmc_y == [50.0, 100.0, 100.0]
    assert cmc_x == [1, 2, 3]


def test_cumulative_match_tie_modes():
    # probe 'a': gallery scores tie between 'b' and 'a' at the top
    dist = np.asarray([[0.1, 0.1, 0.9]])
    ids = ["b", "a", "c"]
    r_opt = cumulative_match(dist, ["a"], ids, tie_mode="optimistic",
                             quick_probe=True)
    r_pes = cumulative_match(dist, ["a"], ids, tie_mode="pessimistic",
                             quick_probe=True)
    r_avg = cumulative_match(dist, ["a"], ids, tie_mode="average",
                             quick_probe=True)
    assert r_opt[0] == 1.0 and r_pes[0] == 2.0 and r_avg[0] == 1.5


def test_calculate_accuracy():
    dist = np.asarray([0.1, 0.4, 0.9])
    issame = np.asarray([True, False, False])
    tpr, fpr, acc = calculate_accuracy(0.5, dist, issame, "dist")
    assert tpr == 1.0
    assert fpr == 0.5
    assert np.isclose(acc, 2.0 / 3.0)
    tpr_s, _, _ = calculate_accuracy(0.5, dist, issame, "sim")
    assert tpr_s == 0.0


def test_roc_perfect_separation():
    # genuine distances all < impostor distances -> AUC 1, EER ~0
    dist = np.asarray([[0.05, 0.8, 0.9],
                       [0.7, 0.1, 0.95],
                       [0.85, 0.75, 0.02]])
    auc, eer, fpr, tpr, thr = roc_main(dist)
    assert auc > 0.99
    assert eer < 0.05


def test_face_recognizer_end_to_end(tmp_path):
    # deterministic fake embedding extractor: mean-pool color histogram
    def extractor(imgs):
        return imgs.reshape(imgs.shape[0], -1, 3).mean(axis=1)

    rng = np.random.default_rng(0)
    # three identities with distinct mean colors
    colors = np.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1],
                         [0.1, 0.1, 0.9]])
    gallery = np.stack([np.full((8, 8, 3), c) for c in colors])
    fr = FaceRecognizer(extractor=extractor)
    fr.register_gallery(images=gallery, gallery_ids=["r", "g", "b"])
    probes = np.clip(gallery + rng.normal(0, 0.05, gallery.shape), 0, 1)
    ranks = fr.fr_rank(probes=probes.astype(np.float32),
                       probe_ids=["r", "g", "b"])
    assert list(ranks) == [1.0, 1.0, 1.0]
    pkg = fr.full_package(probes=probes.astype(np.float32),
                          probe_ids=["r", "g", "b"])
    assert pkg["mean_rank"] == 1.0
    # perfect separation: some threshold reaches TPR=1 at FPR=0
    assert any(t == 1.0 and f == 0.0
               for t, f in zip(pkg["TPR"], pkg["FPR"]))
    assert pkg["EER"] < 0.05
    assert pkg["CMC_y"][0] == 100.0
    out = plot_cmc({"model": (pkg["CMC_x"], pkg["CMC_y"])},
                   save_loc=str(tmp_path))
    import os
    assert os.path.exists(out)


def test_face_recognizer_gates():
    fr = FaceRecognizer()
    with pytest.raises(RuntimeError, match="extractor"):
        fr.register_gallery(images=np.zeros((1, 8, 8, 3)))
    fr2 = FaceRecognizer(extractor=lambda x: x.reshape(x.shape[0], -1))
    fr2.register_gallery(features=np.zeros((2, 4)), gallery_ids=["a", "b"])
    with pytest.raises(ValueError, match="probe ID"):
        fr2.fr_rank(probes=np.zeros((1, 2, 2, 1), np.float32))


def test_metrics_fr_rank_integration():
    from rumpy_tpu.utils.metrics import Metrics

    def extractor(imgs):
        return imgs.reshape(imgs.shape[0], -1, 3).mean(axis=1)

    fr = FaceRecognizer(extractor=extractor)
    colors = np.asarray([[0.9, 0.1, 0.1], [0.1, 0.9, 0.1]])
    gallery = np.stack([np.full((4, 4, 3), c) for c in colors])
    fr.register_gallery(images=gallery, gallery_ids=["r", "g"])
    m = Metrics(metrics=["PSNR", "FR_rank"], face_recognizer=fr)
    res = m.run_metrics(gallery, gallery, probe_names=["r", "g"])
    assert res["FR_rank"] == [1.0, 1.0]
    assert len(res["PSNR"]) == 2
    with pytest.raises(KeyError):
        Metrics(metrics=["FR_rank"])
