"""Name→class registry with config-dataclass generation.

Parity target: SimilarDomains/core/utils/class_registry.py:8-141 (the
reference builds omegaconf schemas from ctor signatures; we emit plain
dataclasses — the config system in ``utils/config.py`` is dataclass-based
and omegaconf is not in the image)."""

from __future__ import annotations

import dataclasses
import inspect
import typing
from typing import Any, List, Optional, Union

_MISSING = dataclasses.field(default=None)


def make_dataclass_from_func(func, name: str, arg_keys=None):
    """Dataclass whose fields mirror ``func``'s signature
    (class_registry.py:17-48).  Required params become Optional[Any]=None
    fields (the reference uses omegaconf.MISSING)."""
    sig = inspect.signature(func).parameters
    fields = []
    for k, v in sig.items():
        if k in ("self", "args", "kwargs"):
            continue
        if v.default is inspect.Parameter.empty or v.default is None:
            fields.append((k, Optional[Any], dataclasses.field(default=None)))
        else:
            fields.append((k, type(v.default),
                           dataclasses.field(default=v.default)))
    if arg_keys:
        groups = {key: dataclasses.make_dataclass(key, fields)
                  for key in arg_keys}
        return dataclasses.make_dataclass(
            name, [(k, v, dataclasses.field(default_factory=v))
                   for k, v in groups.items()])
    return dataclasses.make_dataclass(name, fields)


class ClassRegistry:
    """(class_registry.py:8-141)."""

    def __init__(self):
        self.classes = {}
        self.args = {}
        self.arg_keys = None

    def __getitem__(self, item):
        return self.classes[item]

    def __contains__(self, name: str) -> bool:
        return name in self.args

    def __repr__(self) -> str:
        return f"{list(self.args.keys())}"

    def add_to_registry(self, names: Union[str, List[str]], arg_keys=None):
        if not isinstance(names, list):
            names = [names]

        def decorator(obj):
            for name in names:
                self.classes[name] = obj
                target = obj.__init__ if inspect.isclass(obj) else obj
                if arg_keys:
                    self.arg_keys = arg_keys
                self.args[name] = make_dataclass_from_func(
                    target, name, arg_keys)
            return obj

        return decorator

    def make_dataclass_from_classes(self, name: str = "Name"):
        return dataclasses.make_dataclass(
            name, [(k, v, dataclasses.field(default_factory=v))
                   for k, v in self.classes.items()])

    def make_dataclass_from_args(self, name: str = "Name"):
        return dataclasses.make_dataclass(
            name, [(k, v, dataclasses.field(default_factory=v))
                   for k, v in self.args.items()])
