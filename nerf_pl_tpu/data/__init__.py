"""Dataset registry (reference: ``datasets/__init__.py:9-16``).

Each dataset is a plain-Python loader producing host numpy buffers
(ray/rgb/shadow arrays) — no torch DataLoader; per-step minibatching happens
on-device inside the jitted train step (see ``training.trainer``), which is
the TPU-native equivalent of the reference's worker-process pipeline.

The registry is lazy: ``dataset_dict['blender']`` imports on first access.
"""
from __future__ import annotations

import importlib


_REGISTRY = {
    "blender": ("blender", "BlenderDataset"),
    "llff": ("llff", "LLFFDataset"),
    "shadows": ("blender_shadows", "BlenderDatasetShadows"),
    "efficient_sm": ("blender_efficient_sm", "BlenderEfficientShadows"),
    "rgb_sm": ("blender_rgb_shadows", "BlenderRGBEfficientShadows"),
    "pyredner2": ("pyredner2", "PyRednerShadowsDataset"),
}


class _LazyDatasetDict(dict):
    def __missing__(self, name):
        if name not in _REGISTRY:
            raise KeyError(
                f"unknown dataset {name!r}; available: {sorted(_REGISTRY)}"
            )
        mod_name, cls_name = _REGISTRY[name]
        mod = importlib.import_module(f".{mod_name}", __package__)
        cls = getattr(mod, cls_name)
        self[name] = cls
        return cls

    def __contains__(self, name):
        return name in _REGISTRY


dataset_dict = _LazyDatasetDict()

__all__ = ["dataset_dict"]
