"""Attribute-style config tree with YAML merge.

TPU-native replacement for the reference's yacs ``CfgNode`` usage
(reference: config/default/config.py:9-281).  Pure python, no external
dependency beyond PyYAML; supports dotted attribute access, dict access,
recursive merge from YAML files, cloning, and dumping back to YAML so the
reference's 22 experiment YAMLs load unmodified.
"""

from __future__ import annotations

import copy
from typing import Any, Iterator, Mapping

import yaml


class ConfigNode(dict):
    """A dict whose items are also attributes, recursively."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        if data:
            for k, v in data.items():
                self[k] = v

    # -- attribute <-> item bridging -------------------------------------
    def __setitem__(self, key: str, value: Any) -> None:
        if isinstance(value, Mapping) and not isinstance(value, ConfigNode):
            value = ConfigNode(value)
        super().__setitem__(key, value)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    # -- operations --------------------------------------------------------
    def clone(self) -> "ConfigNode":
        return copy.deepcopy(self)

    def merge_from_other(self, other: Mapping[str, Any],
                         strict: bool = False, _prefix: str = "") -> None:
        """Recursive merge; scalars/lists overwrite, dicts recurse.

        ``strict=True`` raises on keys absent from this tree (yacs
        ``merge_from_file`` parity — a typo like ``smapler:`` must not be
        silently ignored).  Non-strict merges still add new keys, which
        internal code uses for ad-hoc extensions."""
        for k, v in other.items():
            if k not in self and strict:
                raise KeyError(
                    f"unknown config key {_prefix}{k!r} (not in the "
                    f"defaults schema — typo?)")
            if (
                k in self
                and isinstance(self[k], ConfigNode)
                and isinstance(v, Mapping)
            ):
                self[k].merge_from_other(v, strict=strict,
                                         _prefix=f"{_prefix}{k}.")
            else:
                if strict and isinstance(v, Mapping) \
                        and not isinstance(self.get(k), ConfigNode):
                    # a mapping over a scalar/None schema key would absorb
                    # its nested keys unvalidated — reject in strict mode
                    raise KeyError(
                        f"config key {_prefix}{k!r} is not a section; "
                        f"got a mapping")
                self[k] = v

    def merge_from_file(self, path: str, strict: bool = True) -> None:
        with open(path, "r") as f:
            data = yaml.safe_load(f) or {}
        self.merge_from_other(data, strict=strict)

    def merge_from_list(self, opts: list) -> None:
        """yacs-style ``[key, value, key, value, ...]`` override list.

        Keys are dotted paths, values are YAML-parsed.
        """
        assert len(opts) % 2 == 0, "override list must be key/value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for p in parts[:-1]:
                node = node[p]
            if parts[-1] not in node:
                # yacs parity: a dotted override must name an existing key
                raise KeyError(f"unknown config key {key!r}")
            node[parts[-1]] = yaml.safe_load(str(value))

    def to_dict(self) -> dict:
        out: dict = {}
        for k, v in self.items():
            out[k] = v.to_dict() if isinstance(v, ConfigNode) else v
        return out

    def dump(self, path: str | None = None) -> str:
        text = yaml.safe_dump(self.to_dict(), sort_keys=False)
        if path is not None:
            with open(path, "w") as f:
                f.write(text)
        return text

    def __deepcopy__(self, memo: dict) -> "ConfigNode":
        new = ConfigNode()
        memo[id(self)] = new
        for k, v in self.items():
            dict.__setitem__(new, k, copy.deepcopy(v, memo))
        return new

    def walk(self, prefix: str = "") -> Iterator[tuple[str, Any]]:
        for k, v in self.items():
            dotted = f"{prefix}{k}"
            if isinstance(v, ConfigNode):
                yield from v.walk(dotted + ".")
            else:
                yield dotted, v
