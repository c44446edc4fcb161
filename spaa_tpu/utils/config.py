"""Lightweight attribute-style config with YAML round-trip.

Drop-in replacement for the subset of ``omegaconf`` the reference uses
(``DictConfig`` construction, attribute access, ``OmegaConf.load/save``,
``.copy()``, ``del cfg[key]`` — see reference ``train_network.py:85-95``,
``main.py:19-33,99``). omegaconf is not available in this image, and the
framework only needs plain nested dicts, so this shim keeps the same
call-sites working without the dependency.
"""

from __future__ import annotations

import copy as _copy
from typing import Any, Mapping

import yaml


class DictConfig(dict):
    """A dict with attribute access and recursive wrapping of nested dicts."""

    def __init__(self, data: Mapping | None = None, **kwargs):
        super().__init__()
        data = dict(data or {})
        data.update(kwargs)
        for k, v in data.items():
            self[k] = v

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, DictConfig):
            return value
        if isinstance(value, Mapping):
            return DictConfig(value)
        if isinstance(value, tuple):
            return list(value)
        return value

    def __setitem__(self, key, value):
        super().__setitem__(key, self._wrap(value))

    def __getattr__(self, key):
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, key):
        try:
            del self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def copy(self) -> "DictConfig":
        return _copy.deepcopy(self)

    def to_container(self) -> dict:
        out = {}
        for k, v in self.items():
            out[k] = v.to_container() if isinstance(v, DictConfig) else v
        return out


class OmegaConf:
    """Namespace mirroring the two ``OmegaConf`` entry points the reference
    calls (`load`/`save`), plus `create` for symmetry."""

    @staticmethod
    def create(data: Mapping | None = None) -> DictConfig:
        return DictConfig(data)

    @staticmethod
    def load(path) -> DictConfig:
        with open(path) as f:
            data = yaml.safe_load(f)
        return DictConfig(data or {})

    @staticmethod
    def save(cfg: Mapping, path) -> None:
        data = cfg.to_container() if isinstance(cfg, DictConfig) else dict(cfg)
        with open(path, "w") as f:
            yaml.safe_dump(data, f, default_flow_style=None, sort_keys=False)
