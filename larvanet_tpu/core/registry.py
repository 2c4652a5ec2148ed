"""Name -> factory registries for models and dataloaders.

The reference resolves plugins by ``importlib.import_module('models.'+name)``
and calling a module-level ``create_model()`` / ``create_loader()``
(reference train.py:46-54). Here plugins register themselves under the
same public names (including hyphenated ones like ``REGO-Net``), so the
CLIs resolve `--model=...` / `--dataloader=...` identically while the
implementation stays an ordinary Python package.
"""

from __future__ import annotations

from typing import Callable, Dict, List

_MODELS: Dict[str, Callable] = {}
_LOADERS: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(factory: Callable):
        _MODELS[name] = factory
        return factory

    return deco


def register_loader(name: str):
    def deco(factory: Callable):
        _LOADERS[name] = factory
        return factory

    return deco


def _ensure_imported() -> None:
    # Importing the subpackages runs every plugin's register_* decorator.
    import larvanet_tpu.models  # noqa: F401
    import larvanet_tpu.data.loaders  # noqa: F401


def get_model(name: str):
    """Return a fresh model wrapper for `--model=<name>`."""
    _ensure_imported()
    if name not in _MODELS:
        raise KeyError(
            "unknown model %r; available: %s" % (name, ", ".join(sorted(_MODELS)))
        )
    model = _MODELS[name]()
    # The public plugin name, e.g. for the reference-`.pth` converter's
    # per-family rule sets (utils/torch_convert.RULES).
    model.registry_name = name
    return model


def get_loader(name: str):
    _ensure_imported()
    if name not in _LOADERS:
        raise KeyError(
            "unknown dataloader %r; available: %s" % (name, ", ".join(sorted(_LOADERS)))
        )
    return _LOADERS[name]()


def list_models() -> List[str]:
    _ensure_imported()
    return sorted(_MODELS)


def list_loaders() -> List[str]:
    _ensure_imported()
    return sorted(_LOADERS)
