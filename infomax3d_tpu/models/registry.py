"""Explicit model registry.

Replaces the reference's reflection over star-imports
(`models/__init__.py:1-17` + `globals()[name]` in `train.py:208`): configs
name model classes as strings (`model_type: 'PNA'`); we resolve them here so
the reference YAML keys drive this framework byte-compatibly.
"""
from __future__ import annotations

from typing import Callable, Dict, Type

MODEL_REGISTRY: Dict[str, Callable] = {}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def get_model_class(name: str):
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model_type '{name}'; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
