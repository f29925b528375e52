"""Global name -> class registry.

TPU-native rebuild of the reference registry (ref: adsorbdiff/utils/registry.py:55-322):
decorator-based registration for trainers / models / datasets / loggers / tasks,
a generic key-value ``state`` store, and fallback resolution of fully-qualified
class paths in YAML (ref: adsorbdiff/utils/registry.py:242-249) so configs can
say either ``model.name: painn`` or ``model.name: adsorbdiff_tpu.models.painn.PaiNN``.
"""
from __future__ import annotations

import importlib
from typing import Any, Callable, Dict, Optional, Type


def _import_class(path: str) -> type:
    module_name, _, cls_name = path.rpartition(".")
    if not module_name:
        raise ImportError(f"'{path}' is not a fully-qualified class path")
    module = importlib.import_module(module_name)
    try:
        return getattr(module, cls_name)
    except AttributeError as e:
        raise ImportError(f"module '{module_name}' has no class '{cls_name}'") from e


class Registry:
    """Name -> class maps per kind, plus a generic state store."""

    KINDS = ("task", "dataset", "model", "logger", "trainer", "optimizer", "sampler")

    def __init__(self) -> None:
        self._maps: Dict[str, Dict[str, type]] = {k: {} for k in self.KINDS}
        self._state: Dict[str, Any] = {}

    # -- registration ------------------------------------------------------
    def _register(self, kind: str, name: str) -> Callable[[type], type]:
        def wrap(cls: type) -> type:
            existing = self._maps[kind].get(name)
            if existing is not None and existing is not cls:
                raise KeyError(
                    f"{kind} '{name}' already registered to {existing!r}"
                    " (the reference silently shadowed duplicates, e.g. the"
                    " two 'gemnet_oc' models; we make this an error)"
                )
            self._maps[kind][name] = cls
            return cls

        return wrap

    def register_task(self, name: str):
        return self._register("task", name)

    def register_dataset(self, name: str):
        return self._register("dataset", name)

    def register_model(self, name: str):
        return self._register("model", name)

    def register_logger(self, name: str):
        return self._register("logger", name)

    def register_trainer(self, name: str):
        return self._register("trainer", name)

    def register_optimizer(self, name: str):
        return self._register("optimizer", name)

    def register_sampler(self, name: str):
        return self._register("sampler", name)

    # -- lookup --------------------------------------------------------------
    def get_class(self, kind: str, name: str) -> type:
        cls = self._maps[kind].get(name)
        if cls is not None:
            return cls
        # Fully-qualified import path fallback (ref: registry.py:242-249).
        if "." in name:
            return _import_class(name)
        known = sorted(self._maps[kind])
        raise KeyError(f"no {kind} named '{name}' (known: {known})")

    def get_task_class(self, name: str) -> type:
        return self.get_class("task", name)

    def get_dataset_class(self, name: str) -> type:
        return self.get_class("dataset", name)

    def get_model_class(self, name: str) -> type:
        return self.get_class("model", name)

    def get_logger_class(self, name: str) -> type:
        return self.get_class("logger", name)

    def get_trainer_class(self, name: str) -> type:
        return self.get_class("trainer", name)

    def get_sampler_class(self, name: str) -> type:
        return self.get_class("sampler", name)

    def names(self, kind: str) -> list:
        return sorted(self._maps[kind])

    # -- generic state (ref: registry.py register/unregister/get) -----------
    def register(self, key: str, value: Any) -> None:
        self._state[key] = value

    def get(self, key: str, default: Any = None, no_warning: bool = True) -> Any:
        return self._state.get(key, default)

    def unregister(self, key: str) -> None:
        self._state.pop(key, None)


registry = Registry()
