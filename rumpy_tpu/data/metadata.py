"""Degradation-metadata CSV ingestion.

Mirrors read_augmentation_list (rumpy/sr_tools/data_handler.py:62-161):
list-valued columns (JSON) expand into repeated keys; numeric columns
normalize to [0,1] by column min/max — except QPI which pins to the (20,40)
range when force_qpi_range; optional QPI band filtering; keys lowercased;
optional stripping of the 'N-' degradation-position prefix.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def read_augmentation_list(metadata_file: Optional[str],
                           filenames: Sequence[str],
                           normalize=True,
                           ignore_degradation_location: bool = False,
                           force_qpi_range: bool = True,
                           qpi_selection: Optional[Sequence[float]] = None,
                           attribute_skip: Optional[Sequence[str]] = None,
                           ) -> Tuple[Dict[str, np.ndarray], List[str]]:
    keys: List[str] = []
    qpi_cutoffs = bool(qpi_selection) and None not in qpi_selection

    if metadata_file is None:
        return {f: np.array([]) for f in filenames}, keys

    aug = pd.read_csv(metadata_file, header=0, index_col=0)
    if ignore_degradation_location:
        aug.rename(columns={c: (c[2:] if c[0].isdigit() else c)
                            for c in aug.columns}, inplace=True)
    for col in list(aug.columns):
        if attribute_skip and col in attribute_skip:
            aug.drop(col, axis=1, inplace=True)
            continue
        if (aug[col].dtype == object
                or pd.api.types.is_string_dtype(aug[col].dtype)):
            aug[col] = aug[col].apply(json.loads)
            keys.extend([col.lower()] * len(aug[col].iloc[0]))
        elif pd.api.types.is_numeric_dtype(aug[col].dtype):
            aug[col] = aug[col].astype(float)
            keys.append(col.lower())
            if col == "QPI" and force_qpi_range:
                lo, hi = 20.0, 40.0
            else:
                lo, hi = aug[col].min(), aug[col].max()
            wants_norm = (col in normalize if isinstance(normalize, list)
                          else bool(normalize))
            if wants_norm and hi > lo:
                aug[col] = (aug[col] - lo) / (hi - lo)
                if col == "QPI" and qpi_cutoffs:
                    qpi_selection = [(q - lo) / (hi - lo)
                                     for q in qpi_selection]
        else:
            raise RuntimeError("Unidentified datatype in metadata file.")

    all_rows = aug.T.to_dict("list")
    out: Dict[str, np.ndarray] = {}
    for name in filenames:
        vals: List[float] = []
        for v in all_rows[name]:
            if isinstance(v, list):
                vals.extend(v)
            else:
                vals.append(v)
        out[name] = np.asarray(vals, dtype=np.float32)

    if qpi_cutoffs and "qpi" in keys:
        pos = keys.index("qpi")
        out = {im: v for im, v in out.items()
               if qpi_selection[0] <= v[pos] <= qpi_selection[-1]}

    return out, keys


def read_celeba_attributes(attributes_loc: str,
                           image_dict: Dict[str, np.ndarray],
                           selected_metadata="all",
                           attribute_amplification=None
                           ) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Merge celeba facial attributes into an image metadata dict
    (data_handler.py:20-58): the list_attr_celeba.txt table (-1/1) is
    clamped to 0/1 (or amplified to -2/2), optionally restricted to
    selected columns (Young->age, Male->gender aliases), and prepended to
    each image's metadata vector. Image names match on the celeba stem
    (`NNNNNN.jpg`)."""
    celeb = pd.read_csv(attributes_loc, skiprows=1, sep=r"\s+")
    if attribute_amplification is not None:
        celeb[celeb < 0] = -2
        celeb[celeb > 0] = 2
    else:
        celeb[celeb < 0] = 0
    if selected_metadata != "all":
        if "age" in selected_metadata:
            celeb.rename(columns={"Young": "age"}, inplace=True)
        if "gender" in selected_metadata:
            celeb.rename(columns={"Male": "gender"}, inplace=True)
        celeb = celeb[list(selected_metadata)]
    final_keys = list(celeb.columns)
    out = {}
    for key in sorted(image_dict):
        stem = key.split("_")[0].split(".")[0] + ".jpg"
        added = [float(celeb.loc[stem][k]) for k in final_keys]
        out[key] = np.concatenate(
            [np.asarray(added, np.float32), image_dict[key]])
    return out, final_keys


def select_metadata(vector: np.ndarray, keys: Sequence[str],
                    requested: Sequence[str]) -> np.ndarray:
    """Select metadata entries whose key matches any requested key
    (QModel.generate_channels selection semantics,
    attention_manipulators/__init__.py:86-107: order follows the request
    list; repeated keys — e.g. PCA blur_kernel dims — all included)."""
    out: List[float] = []
    for req in requested:
        for i, k in enumerate(keys):
            if k == req or k.endswith(f"-{req}"):
                out.append(vector[i])
    return np.asarray(out, dtype=np.float32)
