"""SuperResImages dataset — host-side image provider for training/eval.

Behavioral mirror of rumpy/sr_tools/data_handler.py:199-648, re-scoped for
TPU: the dataset stays a plain Python indexable that decodes PNG/JPG,
pairs LR/HR, crops/augments patches, and attaches degradation metadata —
but returns channel-LAST float32 numpy dicts ready for device_put. Heavy
per-image degradation moves OUT of the dataset and onto the device
(online_degradations mode returns HR patches; the training loop feeds them
through the fused on-device pipeline).

Key behaviors kept from the reference:
  * dataset/custom/split selection over a sorted listing (:406-442);
  * `_qN` group-tag filtering for multi-degraded datasets (:376-404);
  * blacklists (:444-459);
  * metadata CSV ingestion via read_augmentation_list (metadata.py);
  * ycbcr (Y-only, jpg-mode) vs rgb colorspace (:461-492);
  * 'interp' input mode — LR pre-upsampled with PIL-parity bicubic for
    SRCNN/VDSR (:498-528);
  * HR center-crop alignment to LR*scale (:530-558);
  * random flip/rot augmentation + random patch cropping (:570-611).
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from rumpy_tpu.config.constants import dataset_splits
from rumpy_tpu.data.metadata import read_augmentation_list
from rumpy_tpu.ops import resize as resize_ops
from rumpy_tpu.utils.color import rgb_to_ycbcr

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")
_QTAG = re.compile(r"_q(\d+)\.")


def list_images(directory: str, recursive: bool = False) -> List[str]:
    out: List[str] = []
    for root, _dirs, names in os.walk(directory):
        for n in sorted(names):
            if n.lower().endswith(IMG_EXTS):
                out.append(os.path.join(root, n))
        if not recursive:
            break
    return sorted(out)


def _decode_uncached(path: str) -> np.ndarray:
    im = Image.open(path).convert("RGB")
    a = np.asarray(im)
    a.flags.writeable = False  # cached copies are shared; crops copy anyway
    return a


# Small-pool training (and every epoch of any training) re-reads the same
# files; PNG decode is ~30-40 ms each on a 1-core box, which at batch 32
# is a bigger per-epoch cost than the optimizer steps. Bounded LRU keyed
# by path — ~128 entries = worst-case ~1.5 GB of 2K images, far below
# host RAM here. RUMPY_TPU_IMAGE_CACHE=0 disables.
_CACHE_SIZE = int(os.environ.get("RUMPY_TPU_IMAGE_CACHE", "128"))
if _CACHE_SIZE > 0:
    import functools
    _decode = functools.lru_cache(maxsize=_CACHE_SIZE)(_decode_uncached)
else:
    _decode = _decode_uncached


class SuperResImages:
    def __init__(self, lr_dir: Optional[str] = None,
                 hr_dir: Optional[str] = None,
                 dataset: Optional[str] = None,
                 split: Optional[str] = None,
                 custom_split: Optional[Sequence[int]] = None,
                 image_shortlist: Optional[str] = None,
                 recursive_search: bool = False,
                 input: str = "unmodified",
                 colorspace: str = "rgb",
                 scale: int = 4,
                 metadata_file: Optional[str] = None,
                 metadata: Optional[Sequence[str]] = None,
                 attributes_loc: Optional[str] = None,
                 data_attributes="all",
                 attribute_amplification=None,
                 metadata_normalize=True,
                 qpi_selection=None,
                 ignore_degradation_location: bool = False,
                 blacklist: Optional[Sequence[str]] = None,
                 group_select: Optional[Sequence[int]] = None,
                 crop: Optional[int] = None,
                 crop_count: int = 1,
                 patch_type: str = "random",
                 predefined_patch_locations=None,
                 predefined_patch_location: Optional[str] = None,
                 augmentations: bool = False,
                 use_hflip: bool = True,
                 use_vflip: bool = True,
                 use_rotation: bool = True,
                 use_random_colour_distort: bool = False,
                 colour_distortion_strength: float = 1.0,
                 online_degradations: bool = False,
                 degradation_pipeline=None,
                 mask_data: Optional[str] = None,
                 custom_mask_name: Optional[str] = None,
                 seed: int = 0):
        self.scale = scale
        self.input = input
        self.colorspace = colorspace
        self.crop = crop
        self.crop_count = crop_count
        self.patch_type = patch_type
        self.predefined_patch_locations = predefined_patch_locations
        # per-image entropy-patch CSV (ClassifierImages parity,
        # data_handler.py:762-777)
        self.patch_file = (self._read_patch_file(predefined_patch_location)
                           if predefined_patch_location else None)
        self.augmentations = augmentations
        # per-dataset augmentation switches (reference data_setup.py:140-148,
        # applied in image_augment_crop, data_handler.py:574-587)
        self.use_hflip = use_hflip
        self.use_vflip = use_vflip
        self.use_rotation = use_rotation
        self.use_random_colour_distort = use_random_colour_distort
        self.colour_distortion_strength = colour_distortion_strength
        if use_random_colour_distort and colorspace != "rgb":
            raise ValueError("use_random_colour_distort operates on RGB "
                             "images (the reference distorts the PIL "
                             "image before any colorspace transform)")
        self.online_degradations = online_degradations
        self.degradation_pipeline = degradation_pipeline
        self.requested_metadata = list(metadata) if metadata else None
        # optional per-image HR loss masks (uvtex masks, reference
        # data_handler.py:228-229, :545-556): mask_data = dir of masks
        # named like the HR images, or custom_mask_name = one fixed
        # filename resolved next to each HR image
        self.mask_base = mask_data
        self.custom_mask_name = custom_mask_name
        self._rng = np.random.default_rng(seed)

        base_dir = hr_dir if (online_degradations or lr_dir is None) else lr_dir
        if base_dir is None:
            raise ValueError("Need lr_dir or hr_dir")
        files = list_images(base_dir, recursive_search)

        # group-tag `_qN` filtering (multi-degraded datasets)
        if group_select is not None:
            keep = set(int(g) for g in group_select)
            files = [f for f in files
                     if (_QTAG.search(os.path.basename(f)) is not None
                         and int(_QTAG.search(os.path.basename(f)).group(1))
                         in keep)]

        # split selection over the sorted listing; precedence follows the
        # reference's dataset_split (data_handler.py:406-442):
        # custom_split > named split (unless a shortlist is given) >
        # shortlist text file of images to retain
        if custom_split is not None:
            lo, hi = custom_split
            files = files[lo:hi]
        elif image_shortlist is None and dataset is not None \
                and split is not None:
            lo, hi = dataset_splits[dataset][split]
            files = files[lo:hi]
        elif image_shortlist is not None:
            keep = set()
            abase = os.path.abspath(base_dir)
            with open(image_shortlist) as fh:
                for line in fh:
                    p = line.strip()
                    if not p:
                        continue
                    # entries under base_dir are kept as relative paths;
                    # anything else falls through to basename matching.
                    # (The reference's `main_dir in pth` substring test —
                    # data_handler.py:432-433 — mangles entries from
                    # sibling trees whose path merely CONTAINS main_dir
                    # and silently drops those images; tightened to a
                    # real path-prefix check here.)
                    ap = os.path.abspath(p)
                    if ap.startswith(abase + os.sep):
                        keep.add(os.path.relpath(ap, abase))
                    else:
                        keep.add(p)
                        keep.add(os.path.basename(p))
            files = [f for f in files
                     if os.path.relpath(f, base_dir) in keep
                     or os.path.basename(f) in keep]

        if blacklist:
            if isinstance(blacklist, str):
                # reference blacklists are CSV files with an 'Images'
                # column (data_handler.py:444-459)
                import pandas as pd
                blacklist = pd.read_csv(blacklist, header=[0])[
                    "Images"].tolist()
            banned = set(os.path.basename(b) for b in blacklist)
            files = [f for f in files if os.path.basename(f) not in banned]

        self.lr_files = files
        self.lr_base = base_dir
        self.hr_dir = hr_dir

        # metadata ingestion; 'on_site' (or requesting metadata with no
        # explicit file) resolves to <lr_dir>/degradation_metadata.csv
        # (reference data_setup.py:109-112)
        if metadata_file == "on_site" or (metadata_file is None
                                          and metadata and lr_dir):
            candidate = os.path.join(lr_dir, "degradation_metadata.csv")
            metadata_file = candidate if os.path.isfile(candidate) else None
        self.metadata_keys: List[str] = []
        self.metadata_map: Dict[str, np.ndarray] = {}
        if metadata_file is not None:
            names = [os.path.basename(f) for f in files]
            self.metadata_map, self.metadata_keys = read_augmentation_list(
                metadata_file, names, normalize=metadata_normalize,
                ignore_degradation_location=ignore_degradation_location,
                qpi_selection=qpi_selection)
            # QPI filtering may drop images
            kept = set(self.metadata_map.keys())
            self.lr_files = [f for f in files if os.path.basename(f) in kept]
        elif attributes_loc is not None:
            self.metadata_map = {os.path.basename(f): np.array([], np.float32)
                                 for f in self.lr_files}
        if attributes_loc is not None:
            # celeba facial-attribute merge (data_handler.py:141-146):
            # attribute keys prepend the degradation keys
            from rumpy_tpu.data.metadata import read_celeba_attributes
            self.metadata_map, attr_keys = read_celeba_attributes(
                attributes_loc, self.metadata_map,
                selected_metadata=data_attributes,
                attribute_amplification=attribute_amplification)
            self.metadata_keys = [f"celeba-{k.lower()}"
                                  for k in attr_keys] + self.metadata_keys

    def __len__(self) -> int:
        return len(self.lr_files)

    # -- helpers -----------------------------------------------------------

    def _hr_path(self, lr_path: str) -> Optional[str]:
        if self.hr_dir is None:
            return None
        name = os.path.basename(lr_path)
        base = _QTAG.sub(".", name)  # strip _qN multi-degradation tag
        cand = os.path.join(self.hr_dir, base)
        if os.path.isfile(cand):
            return cand
        stem = os.path.splitext(base)[0]
        for ext in IMG_EXTS:
            c = os.path.join(self.hr_dir, stem + ext)
            if os.path.isfile(c):
                return c
        return None

    def _load_mask(self, hr_path: str, th: int, tw: int
                   ) -> Optional[np.ndarray]:
        """HR loss mask, center-cropped to the aligned HR size
        (reference data_handler.py:545-556). Returned as float32 HWC in
        [0, 1] (our NHWC convention; the reference keeps raw uint8 CHW)."""
        base_name = os.path.basename(hr_path)
        if self.custom_mask_name:
            path = os.path.join(os.path.dirname(hr_path),
                                self.custom_mask_name)
        else:
            path = os.path.join(self.mask_base, base_name)
        if not os.path.isfile(path):
            # fail loud: a half-masked dataset would otherwise produce
            # ragged batch keys (collation then crashes or silently drops
            # every mask, depending on batch order)
            raise FileNotFoundError(
                f"loss mask for {hr_path!r} not found at {path!r} "
                "(mask_data/custom_mask_name is configured, so every HR "
                "image needs a mask)")
        mask = _decode(path)
        if mask.shape[0] != th or mask.shape[1] != tw:
            # PIL .crop semantics (the reference's center_crop,
            # image_functions.py:195-206): out-of-bounds regions read as
            # zero, so masks SMALLER than the target come back centered
            # in a zero field, not undersized.
            t = (mask.shape[0] - th) // 2
            l = (mask.shape[1] - tw) // 2
            out = np.zeros((th, tw) + mask.shape[2:], mask.dtype)
            src = mask[max(t, 0):max(t, 0) + min(th, mask.shape[0]),
                       max(l, 0):max(l, 0) + min(tw, mask.shape[1])]
            out[max(-t, 0):max(-t, 0) + src.shape[0],
                max(-l, 0):max(-l, 0) + src.shape[1]] = src
            mask = out
        return mask.astype(np.float32) / 255.0

    def _colorspace_convert(self, arr_u8: np.ndarray) -> np.ndarray:
        x = arr_u8.astype(np.float32) / 255.0
        if self.colorspace == "ycbcr":
            return np.asarray(rgb_to_ycbcr(x, y_only=True, im_type="jpg"))
        return x

    def _augment(self, *imgs: np.ndarray) -> List[np.ndarray]:
        hflip = self.use_hflip and self._rng.random() < 0.5
        vflip = self.use_vflip and self._rng.random() < 0.5
        rot = self.use_rotation and self._rng.random() < 0.5

        def f(a):
            if hflip:
                a = a[:, ::-1]
            if vflip:
                a = a[::-1]
            if rot:
                a = a.transpose(1, 0, 2)
            return np.ascontiguousarray(a)
        return [f(i) for i in imgs]

    def _colour_distort(self, *imgs: np.ndarray) -> List[np.ndarray]:
        """SimCLR colour distortion (reference image_augment_crop,
        data_handler.py:578-587): one set of jitter draws applied to
        every image passed together, so an LR/HR pair stays
        photometrically aligned."""
        import jax
        import jax.numpy as jnp

        from rumpy_tpu.ops.color_aug import colour_distortion
        key = jax.random.PRNGKey(int(self._rng.integers(2 ** 31)))
        return [np.asarray(colour_distortion(
            key, jnp.asarray(im, jnp.float32)[None],
            dist_strength=self.colour_distortion_strength)[0])
            for im in imgs]

    @staticmethod
    def _read_patch_file(path: str) -> Dict[str, List[Tuple[int, int]]]:
        """Reference predefined-entropy-patch CSV (data_handler.py:762-777):
        index = stringified ('image.png', ...) tuples (or plain names),
        column 'high_entropy_patches_left_corner' = stringified corner
        list."""
        import ast

        import pandas as pd
        col = pd.read_csv(path, header=0, index_col=0).to_dict()[
            "high_entropy_patches_left_corner"]
        out: Dict[str, List[Tuple[int, int]]] = {}
        for key, val in col.items():
            try:
                parsed = ast.literal_eval(key)
                name = parsed[0] if isinstance(parsed, tuple) else parsed
            except (ValueError, SyntaxError):
                name = key
            out[str(name)] = [tuple(c) for c in ast.literal_eval(val)]
        return out

    def _select_patch(self, img: np.ndarray, crop_size: int, idx: int,
                      tag: Optional[str] = None, crop_index: int = 0,
                      total: int = 1):
        """Patch corner by patch_type (image_patch_selection parity,
        image_functions.py:297-326): per-image predefined CSV corners /
        predefined list / entropy / random."""
        if self.patch_file is not None and tag in self.patch_file:
            locs = self.patch_file[tag]
            return tuple(locs[crop_index % len(locs)])
        if self.patch_type == "predefined" and self.predefined_patch_locations:
            return tuple(self.predefined_patch_locations[
                (idx + crop_index) % len(self.predefined_patch_locations)])
        if self.patch_type == "entropy" and img.shape[-1] == 3:
            from rumpy_tpu.ops.entropy import entropy_patch_positions
            # multi-crop calls this once per crop_index with identical
            # (img, crop_size, total) — compute the position list once
            # per item and reuse it across the crops. Key and value live
            # in ONE attribute (atomic tuple read under the GIL): a
            # concurrent prefetch thread can at worst force a recompute,
            # never hand this image another image's coordinates.
            cache_key = (idx, crop_size, max(total, 1))
            cached = getattr(self, "_entropy_cache", None)
            if cached is not None and cached[0] == cache_key:
                ys, xs = cached[1]
            else:
                ys, xs = entropy_patch_positions(img, crop_size,
                                                 max(total, 1))
                self._entropy_cache = (cache_key, (ys, xs))
            j = crop_index % len(ys)
            return int(ys[j]), int(xs[j])
        top = int(self._rng.integers(0, max(1, img.shape[0] - crop_size + 1)))
        left = int(self._rng.integers(0, max(1, img.shape[1] - crop_size + 1)))
        return top, left

    # -- main accessor -----------------------------------------------------

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        lr_path = self.lr_files[idx]
        tag = os.path.basename(lr_path)
        arr = _decode(lr_path)

        if self.online_degradations:
            # HR-only mode: return HR patch(es); LR synthesized on device.
            # crop_count > 1 yields a (P, cs, cs, C) stack for contrastive
            # query/key views degraded with shared per-image kernels.
            def one_patch():
                hr = arr
                if self.crop is not None:
                    cs = self.crop * self.scale
                    if hr.shape[0] < cs or hr.shape[1] < cs:
                        # reflect-pad undersized images up to the crop so
                        # every patch in the batch has one static shape
                        ph = max(0, cs - hr.shape[0])
                        pw = max(0, cs - hr.shape[1])
                        hr = np.pad(hr, ((0, ph), (0, pw), (0, 0)),
                                    mode="reflect")
                    top = int(self._rng.integers(
                        0, max(1, hr.shape[0] - cs + 1)))
                    left = int(self._rng.integers(
                        0, max(1, hr.shape[1] - cs + 1)))
                    hr = hr[top:top + cs, left:left + cs]
                hr_f = self._colorspace_convert(hr)
                if self.augmentations:
                    hr_f, = self._augment(hr_f)
                    if self.use_random_colour_distort:
                        hr_f, = self._colour_distort(hr_f)
                return hr_f.astype(np.float32)

            if self.crop is not None and self.crop_count > 1:
                hr_out = np.stack([one_patch()
                                   for _ in range(self.crop_count)])
            else:
                hr_out = one_patch()
            return {"hr": hr_out, "tag": tag,
                    "metadata": np.array([], np.float32),
                    "metadata_keys": []}

        hr_path = self._hr_path(lr_path)
        out: Dict[str, Any] = {"tag": tag}

        lr = arr
        hr = _decode(hr_path) if hr_path else None

        mask = None
        if hr is not None:
            # HR center-crop alignment to LR*scale (data_handler.py:530-558)
            th, tw = lr.shape[0] * self.scale, lr.shape[1] * self.scale
            oh = (hr.shape[0] - th) // 2
            ow = (hr.shape[1] - tw) // 2
            hr = hr[oh:oh + th, ow:ow + tw]
            if self.mask_base is not None or self.custom_mask_name:
                mask = self._load_mask(hr_path, th, tw)

        if self.input == "interp":
            lr = np.asarray(resize_ops.pil_resize(
                lr, (lr.shape[0] * self.scale, lr.shape[1] * self.scale)))

        lr_f = self._colorspace_convert(lr)
        hr_f = self._colorspace_convert(hr) if hr is not None else None

        # colour distortion runs whole-image before any cropping, the
        # reference's order (image_augment_crop distorts then crops)
        if self.augmentations and self.use_random_colour_distort:
            if hr_f is not None:
                lr_f, hr_f = self._colour_distort(lr_f, hr_f)
            else:
                lr_f, = self._colour_distort(lr_f)

        if self.crop is not None and self.crop_count > 1:
            # Multi-crop mode (ClassifierImages / contrastive training,
            # data_handler.py:762-811): stack crop_count random patches of
            # the LR image on a leading axis.
            cs = self.crop
            eff_scale = 1 if self.input == "interp" else self.scale
            crops = []
            for ci in range(self.crop_count):
                top, left = self._select_patch(lr_f, cs, idx, tag=tag,
                                               crop_index=ci,
                                               total=self.crop_count)
                patch = lr_f[top:top + cs, left:left + cs]
                if ci == 0 and hr_f is not None:
                    # HR aligned with the first (query) crop — joint
                    # contrastive+SR training scores SR on that crop;
                    # geometric augmentation must hit LR and HR with the
                    # SAME flip/rot draws or the pair is misaligned
                    hs = cs * eff_scale
                    hr_patch = hr_f[top * eff_scale:top * eff_scale + hs,
                                    left * eff_scale:left * eff_scale + hs]
                    if self.augmentations:
                        patch, hr_patch = self._augment(patch, hr_patch)
                    out["hr"] = hr_patch.astype(np.float32)
                elif self.augmentations:
                    patch, = self._augment(patch)
                crops.append(patch)
            out["lr"] = np.stack(crops).astype(np.float32)
            meta = self.metadata_map.get(tag)
            out["metadata"] = (meta if meta is not None
                               else np.array([], np.float32))
            out["metadata_keys"] = self.metadata_keys
            return out

        if self.crop is not None:
            cs = self.crop
            eff_scale = 1 if self.input == "interp" else self.scale
            top, left = self._select_patch(lr_f, cs, idx, tag=tag)
            lr_f = lr_f[top:top + cs, left:left + cs]
            if hr_f is not None:
                hs = cs * eff_scale
                hr_f = hr_f[top * eff_scale:top * eff_scale + hs,
                            left * eff_scale:left * eff_scale + hs]
                if mask is not None:
                    mask = mask[top * eff_scale:top * eff_scale + hs,
                                left * eff_scale:left * eff_scale + hs]

        if self.augmentations:
            if hr_f is not None and mask is not None:
                lr_f, hr_f, mask = self._augment(lr_f, hr_f, mask)
            elif hr_f is not None:
                lr_f, hr_f = self._augment(lr_f, hr_f)
            else:
                lr_f, = self._augment(lr_f)

        out["lr"] = lr_f.astype(np.float32)
        if hr_f is not None:
            out["hr"] = hr_f.astype(np.float32)
        if mask is not None:
            out["mask"] = mask.astype(np.float32)

        meta = self.metadata_map.get(tag)
        out["metadata"] = (meta if meta is not None
                           else np.array([], np.float32))
        out["metadata_keys"] = self.metadata_keys
        return out


class VideoSequenceImages(SuperResImages):
    """VSR dataset (reference data_handler.py:651-759): LR frames are
    grouped into `num_frames` bundles concatenated on the channel axis;
    the HR target is a single frame chosen by `hr_selection`
    ('center' | index). Frame ordering follows the sorted listing; clips
    are consecutive windows within it."""

    def __init__(self, num_frames: int = 5, hr_selection="center",
                 use_masks: bool = False, **kwargs):
        # reference shorthand (data_handler.py:676-680): use_masks=True
        # reads 'uvtex_mask.png' from the HR directory as the loss mask
        if use_masks:
            kwargs.setdefault("mask_data", kwargs.get("hr_dir"))
            kwargs.setdefault("custom_mask_name", "uvtex_mask.png")
        super().__init__(**kwargs)
        self.num_frames = num_frames
        self.hr_selection = (num_frames // 2 if hr_selection == "center"
                             else int(hr_selection))
        # valid window starts
        self._starts = list(range(0, len(self.lr_files) - num_frames + 1))
        import threading
        self._window_lock = threading.Lock()

    def __len__(self) -> int:
        return len(self._starts)

    def __getitem__(self, idx: int):
        start = self._starts[idx]
        # spatial coherence: every frame in the bundle must share ONE
        # crop position and ONE augmentation draw — per-frame random
        # crops would stack unrelated image regions on the channel axis.
        # Reseed the shared RNG to a per-window seed around each frame
        # fetch so all frames reproduce identical random choices (the
        # seed itself is drawn from the ongoing stream, so windows still
        # vary across epochs). The whole window runs under a lock: the
        # threaded loader (loader.py prefetch pool) would otherwise swap
        # self._rng mid-window from a concurrent __getitem__ and break
        # exactly the coherence the reseeding guarantees; the epoch
        # stream itself is restored afterwards.
        with self._window_lock:
            epoch_rng = self._rng
            window_seed = int(epoch_rng.integers(0, 2 ** 31))
            frames = []
            try:
                for i in range(self.num_frames):
                    self._rng = np.random.default_rng(window_seed)
                    item = super().__getitem__(start + i)
                    frames.append(item["lr"])
                    if i == self.hr_selection:
                        target = item
            finally:
                self._rng = epoch_rng
        bundle = np.concatenate(frames, axis=-1)
        out = {"lr": bundle, "tag": target["tag"],
               "metadata": target["metadata"],
               "metadata_keys": target["metadata_keys"]}
        if "hr" in target:
            out["hr"] = target["hr"]
        if "mask" in target:
            # optional uvtex loss mask of the HR target frame
            # (reference data_handler.py:698-714)
            out["mask"] = target["mask"]
        return out
