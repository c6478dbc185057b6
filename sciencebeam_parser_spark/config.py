"""Config layering (SURVEY §2A A31).

Reference: config/config.py — a YAML config dict with environment-variable
overrides named ``SCIENCEBEAM_PARSER__SECTION__KEY`` (double underscore
separates nesting levels); values parse as YAML scalars (bool/int/float/str).
Here the base config is a plain nested dict (the Spark driver is plain
Python; no YAML dependency needed) and the same env-override convention
applies on top.
"""
from __future__ import annotations

import os
from copy import deepcopy
from typing import Any, Mapping

ENV_PREFIX = "SCIENCEBEAM_PARSER"


def _parse_scalar(raw: str) -> Any:
    low = raw.strip().lower()
    if low in ("true", "false"):
        return low == "true"
    if low in ("null", "~", ""):
        return None
    for cast in (int, float):
        try:
            return cast(raw)
        except ValueError:
            pass
    return raw


def apply_env_overrides(
    config: Mapping[str, Any],
    environ: Mapping[str, str] | None = None,
    *,
    prefix: str = ENV_PREFIX,
) -> dict:
    """Overlay ``PREFIX__SECTION__KEY[__SUBKEY…]`` env vars onto a nested
    config dict (config/config.py ``apply_environment_variables_to_config``
    semantics: path segments lowercase, scalars YAML-parsed)."""
    out: dict = deepcopy(dict(config))
    env = os.environ if environ is None else environ
    marker = prefix + "__"
    for name, raw in env.items():
        if not name.startswith(marker):
            continue
        path = [seg.lower() for seg in name[len(marker):].split("__") if seg]
        if not path:
            continue
        node = out
        for seg in path[:-1]:
            nxt = node.get(seg)
            if not isinstance(nxt, dict):
                nxt = {}
                node[seg] = nxt
            node = nxt
        node[path[-1]] = _parse_scalar(raw)
    return out


__all__ = ["apply_env_overrides", "ENV_PREFIX"]
