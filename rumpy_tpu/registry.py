"""Decorator-based registries for models and degradation ops.

The reference discovers handlers dynamically by AST-walking handler files
(rumpy/shared_framework/models/__init__.py:7-35) and instantiating via
pydoc.locate. Here registration is explicit: importing a family module
registers its models, which keeps discovery static-analysis friendly and
avoids import-order surprises under jit tracing.
"""

from __future__ import annotations

import importlib
from typing import Any, Callable, Dict

_MODEL_REGISTRY: Dict[str, Any] = {}
_TOOL_REGISTRY: Dict[str, Any] = {}

# Modules that contain @register_model / @register_tool declarations.
# Lazily imported on first lookup so `import rumpy_tpu` stays cheap.
_MODEL_MODULES = [
    "rumpy_tpu.models.basic",
    "rumpy_tpu.models.advanced",
    "rumpy_tpu.models.attention_manipulators",
    "rumpy_tpu.models.sftmd_variants",
    "rumpy_tpu.models.gan_models",
    "rumpy_tpu.models.blind_sr",
    "rumpy_tpu.models.contrastive",
    "rumpy_tpu.models.dan",
    "rumpy_tpu.models.dasr",
    "rumpy_tpu.models.face_models",
    "rumpy_tpu.models.face_attribute_gans",
    "rumpy_tpu.models.dic",
    "rumpy_tpu.models.wavelet",
    "rumpy_tpu.models.fssr",
    "rumpy_tpu.models.ikc",
    "rumpy_tpu.models.han_elan",
    "rumpy_tpu.models.regressors",
    "rumpy_tpu.models.metabed",
    "rumpy_tpu.models.san",
    "rumpy_tpu.models.swinir",
]
_TOOL_MODULES = [
    "rumpy_tpu.degradations.blur",
    "rumpy_tpu.degradations.noise",
    "rumpy_tpu.degradations.compression",
    "rumpy_tpu.degradations.resize_ops",
]

_loaded = {"models": False, "tools": False}


def register_model(name: str) -> Callable[[Any], Any]:
    """Class decorator: register an SR/regression model handler under `name`.

    Names are lowercase, mirroring the reference's convention of
    `<ClassName minus "Handler">.lower()`.
    """

    def deco(cls):
        _MODEL_REGISTRY[name.lower()] = cls
        cls.registered_name = name.lower()
        return cls

    return deco


def register_tool(name: str) -> Callable[[Any], Any]:
    """Class decorator: register a degradation-pipeline op under `name`."""

    def deco(cls):
        _TOOL_REGISTRY[name.lower()] = cls
        cls.registered_name = name.lower()
        return cls

    return deco


def _ensure(kind: str) -> None:
    if _loaded[kind]:
        return
    _loaded[kind] = True
    modules = _MODEL_MODULES if kind == "models" else _TOOL_MODULES
    for mod in modules:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # Tolerate only *external* optional dependencies (e.g. cv2).
            # A missing/broken rumpy_tpu family module must fail loudly —
            # a silent pass would quietly delist its models.
            if (e.name or "").split(".")[0] == "rumpy_tpu":
                raise
            import warnings
            warnings.warn(
                f"skipping {mod}: optional dependency {e.name!r} not "
                f"installed", stacklevel=2)


def available_models() -> Dict[str, Any]:
    _ensure("models")
    return dict(_MODEL_REGISTRY)


def available_tools() -> Dict[str, Any]:
    _ensure("tools")
    return dict(_TOOL_REGISTRY)


def get_model(name: str):
    _ensure("models")
    key = name.lower()
    if key not in _MODEL_REGISTRY:
        raise KeyError(
            f"Unknown model '{name}'. Available: {sorted(_MODEL_REGISTRY)}")
    return _MODEL_REGISTRY[key]


def get_tool(name: str):
    _ensure("tools")
    key = name.lower()
    if key not in _TOOL_REGISTRY:
        raise KeyError(
            f"Unknown degradation op '{name}'. Available: {sorted(_TOOL_REGISTRY)}")
    return _TOOL_REGISTRY[key]
