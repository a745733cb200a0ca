"""Explicit model registry.

Replaces the reference's reflection over star-imports
(`models/__init__.py:1-17` + `globals()[name]` in `train.py:208`): configs
name model classes as strings (`model_type: 'PNA'`); we resolve them here so
the reference YAML keys drive this framework byte-compatibly.
"""
from __future__ import annotations

from typing import Callable, Dict, Type

MODEL_REGISTRY: Dict[str, Callable] = {}

# Reference YAML names whose class the reference itself cannot resolve
# (`models/__init__.py` star-imports skip `legacy/`, and `Net3DVAE` exists
# nowhere — `models/net3d_VAE.py` defines `Net3DAE`), mapped onto the class
# the config evidently means.  Without the alias `configs/19.yml` NameErrors
# upstream too; with it the config runs here.
MODEL_ALIASES: Dict[str, str] = {
    "Net3DVAE": "Net3DAE",               # models/net3d_VAE.py:15
}


def register_model(name: str):
    def deco(cls):
        MODEL_REGISTRY[name] = cls
        return cls
    return deco


def get_model_class(name: str):
    name = MODEL_ALIASES.get(name, name)
    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model_type '{name}'; known: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
