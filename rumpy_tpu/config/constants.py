"""Framework-wide constants.

Mirrors rumpy/shared_framework/configuration/constants.py:4-63 — dataset
split conventions, metric improvement directions, and the blur-kernel-type
code table used for degradation metadata.
"""

import os

# Path conventions: Results/Data/Scratch as siblings of the repo
# (constants.py:4-10). Overridable via environment.
base_directory = os.environ.get("RUMPY_TPU_BASE", os.path.expanduser("~"))
results_directory = os.environ.get(
    "RUMPY_TPU_RESULTS", os.path.join(base_directory, "Results"))
data_directory = os.environ.get(
    "RUMPY_TPU_DATA", os.path.join(base_directory, "Data"))
scratch_directory = os.environ.get(
    "RUMPY_TPU_SCRATCH", os.path.join(base_directory, "Scratch"))

# Dataset split conventions (constants.py:12-17): index ranges into a
# sorted file listing.
dataset_splits = {
    "celeba": {"train": (0, 162770), "eval": (162770, 182637), "test": (182637, 202599)},
    "div2k": {"train": (0, 800), "eval": (800, 900)},
    "flickr2k": {"train": (0, 2650)},
}

# Direction in which each metric improves (constants.py:26-34); used for
# best-epoch selection when resuming/curating checkpoints.
metric_best_val = {
    "val-PSNR": "max",
    "val-SSIM": "max",
    "val-LPIPS": "min",
    "val-loss": "min",
    "train-loss": "min",
}


class TwoWayDict(dict):
    """Bidirectional code table (constants.py:43-54 equivalent)."""

    def __init__(self, mapping):
        super().__init__()
        for k, v in mapping.items():
            self[k] = v
            self[v] = k

    def __len__(self):
        return super().__len__() // 2


# Blur-kernel-family integer codes used in degradation metadata
# (constants.py:56-63).
blur_kernel_codes = TwoWayDict({
    "iso": 0,
    "aniso": 1,
    "generalized_iso": 2,
    "generalized_aniso": 3,
    "plateau_iso": 4,
    "plateau_aniso": 5,
    "sinc": 6,
})
