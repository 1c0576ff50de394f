"""Shared loader for REFERENCE (/root/reference) torch modules used as
test-time oracles. The reference imports heavyweight optional deps that
this image lacks (torchvision, skimage, lpips, moviepy, ...); minimal
stubs let the specific modules under test import so tests compare OUR
outputs against THEIR code. Loaded modules are cached module-level —
loading twice would re-register duplicate sys.modules entries."""

import importlib.util
import sys
import types

REF = "/root/reference"

_cache = {}


class _AnyObj:
    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return self


class _AnyAttr(types.ModuleType):
    def __getattr__(self, name):
        # never fake dunders: torch/inspect walk sys.modules and choke on
        # a module whose __file__ isn't a real path
        if name.startswith("__"):
            raise AttributeError(name)
        return _ANY_OBJ


_ANY_OBJ = _AnyObj()


def _install_stubs():
    if "stubs" in _cache:
        return
    _cache["stubs"] = True
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import collections
    import collections.abc
    for alias in ("Callable", "Iterable", "Mapping", "Sequence"):
        if not hasattr(collections, alias):
            setattr(collections, alias, getattr(collections.abc, alias))
    # real heavyweight deps must import BEFORE the catch-all stubs exist
    import torch  # noqa: F401
    import scipy.special  # noqa: F401
    for name in ["torchvision", "torchvision.transforms",
                 "skimage", "skimage.filters", "skimage.filters.rank",
                 "skimage.morphology", "skimage.metrics", "tqdm",
                 "colorama", "toml", "moviepy", "moviepy.video",
                 "moviepy.video.io", "moviepy.video.io.ImageSequenceClip",
                 "deepdiff", "lpips", "aim", "timm", "timm.models"]:
        if name not in sys.modules:
            sys.modules[name] = _AnyAttr(name)
    sys.modules["tqdm"].tqdm = lambda x, **k: x
    if "timm.models.layers" not in sys.modules:
        tl = types.ModuleType("timm.models.layers")
        tl.DropPath = object
        tl.to_2tuple = lambda x: (x, x)
        tl.trunc_normal_ = lambda *a, **k: None
        sys.modules["timm.models.layers"] = tl


def _load(name, path):
    if name in _cache:
        return _cache[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    _cache[name] = mod
    return mod


def load_image_functions():
    """Reference image_functions (ycbcr_convert, downsample, ...)."""
    _install_stubs()
    return _load(
        "ref_image_functions",
        f"{REF}/rumpy/image_tools/image_manipulation/image_functions.py")


def load_ref_psnr():
    """The reference's own psnr() (sr_tools/metrics.py:33-44), extracted
    by source because metrics.py imports lpips/keras at module level."""
    if "psnr" in _cache:
        return _cache["psnr"]
    src = open(f"{REF}/rumpy/sr_tools/metrics.py").read()
    ns = {}
    exec(src[src.index("def psnr"):src.index("class Metrics")],
         {"np": __import__("numpy")}, ns)
    _cache["psnr"] = ns["psnr"]
    return ns["psnr"]


def _skeleton(pkgs):
    for pkg in pkgs:
        sys.modules.setdefault(pkg, types.ModuleType(pkg))


def load_advanced_arch():
    """Reference SISR/models/advanced/architectures.py (EDSR/RCAN/...)."""
    _install_stubs()
    if "ref_advanced_architectures" in _cache:
        return _cache["ref_advanced_architectures"]
    A = f"{REF}/rumpy/SISR/models"
    _skeleton(["rumpy", "rumpy.SISR", "rumpy.SISR.models",
               "rumpy.SISR.models.advanced", "rumpy.SISR.models.basic",
               "rumpy.SISR.models.attention_manipulators"])
    _load("rumpy.SISR.models.attention_manipulators.q_layer",
          f"{A}/attention_manipulators/q_layer.py")
    _load("rumpy.SISR.models.advanced.common", f"{A}/advanced/common.py")
    _load("rumpy.SISR.models.advanced.SRMD_blocks",
          f"{A}/advanced/SRMD_blocks.py")
    _load("rumpy.SISR.models.advanced.HAN_blocks",
          f"{A}/advanced/HAN_blocks.py")
    _load("rumpy.SISR.models.advanced.mpncov", f"{A}/advanced/mpncov.py")
    _load("rumpy.SISR.models.advanced.SAN_blocks",
          f"{A}/advanced/SAN_blocks.py")
    _load("rumpy.SISR.models.advanced.ELAN_blocks",
          f"{A}/advanced/ELAN_blocks.py")
    return _load("ref_advanced_architectures",
                 f"{A}/advanced/architectures.py")


def load_q_arch():
    """Reference attention_manipulators/architectures.py (QRCAN/...)."""
    arch = load_advanced_arch()
    if "ref_q_architectures" in _cache:
        return _cache["ref_q_architectures"]
    A = f"{REF}/rumpy/SISR/models"
    sys.modules["rumpy.SISR.models.advanced.architectures"] = arch
    sys.modules["rumpy.SISR.models.advanced"].common = \
        sys.modules["rumpy.SISR.models.advanced.common"]
    _skeleton(["rumpy.SISR.models.SFTMD_variants",
               "rumpy.SISR.models.non_blind_gan_models"])
    _load("rumpy.SISR.models.attention_manipulators.da_layer",
          f"{A}/attention_manipulators/da_layer.py")
    _load("rumpy.SISR.models.attention_manipulators.dgfmb_layer",
          f"{A}/attention_manipulators/dgfmb_layer.py")
    _load("rumpy.SISR.models.attention_manipulators.qsan_blocks",
          f"{A}/attention_manipulators/qsan_blocks.py")
    _load("rumpy.SISR.models.SFTMD_variants.architectures",
          f"{A}/SFTMD_variants/architectures.py")
    _load("rumpy.SISR.models.non_blind_gan_models.generators",
          f"{A}/non_blind_gan_models/generators.py")
    return _load("ref_q_architectures",
                 f"{A}/attention_manipulators/architectures.py")
