"""Config-driven model registry.

Plays the role of the reference's mmcv-style registries
(D1/train/train_v68/vsc/baseline/model_factory/utils/{registry,builder}.py):
configs are plain dicts with a ``type`` key naming a registered constructor;
remaining keys are passed as kwargs. Used by the typed config tree in
`vsc22_tpu.utils.config` so training/inference entry points can be driven by
executable-config files like the reference's config_v68.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable] = {}

    def register(self, fn: Callable = None, *, name: str = None):
        def wrap(f):
            key = name or f.__name__
            if key in self._entries:
                raise KeyError(f"{key} already registered in {self.name}")
            self._entries[key] = f
            return f

        return wrap(fn) if fn is not None else wrap

    def get(self, key: str) -> Callable:
        if key not in self._entries:
            raise KeyError(
                f"{key!r} not in registry {self.name}; known: {sorted(self._entries)}"
            )
        return self._entries[key]

    def build(self, cfg: Dict[str, Any], **extra):
        cfg = dict(cfg)
        kind = cfg.pop("type")
        return self.get(kind)(**cfg, **extra)

    def __contains__(self, key: str) -> bool:
        return key in self._entries


BACKBONES = Registry("backbones")
DATASETS = Registry("datasets")


def build_backbone(cfg: Dict[str, Any], **extra):
    return BACKBONES.build(cfg, **extra)


def _register_builtins():
    # Imported lazily to avoid circular imports at package init.
    from vsc22_tpu.models import swinv2, vit

    BACKBONES.register(vit.vit_base_patch32_384_descriptor, name="vit_base_patch32_384")
    BACKBONES.register(vit.vit_tiny_test_descriptor, name="vit_tiny_test")
    BACKBONES.register(swinv2.swinv2_base_256_descriptor, name="swinv2_base_256")
    BACKBONES.register(swinv2.swinv2_tiny_test_descriptor, name="swinv2_tiny_test")


_register_builtins()
