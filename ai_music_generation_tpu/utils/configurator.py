"""Config override engine, reference-flag-compatible.

Reproduces the contract of the reference's "poor man's configurator"
(ref: nanoGPT/configurator.py:20-47, nanoGPT/train.py:34-82):

- a positional argument is a Python config file executed into the config
  namespace;
- ``--key=value`` arguments are ``ast.literal_eval``'d (falling back to the
  raw string) and type-checked against the existing default.

Instead of module-level globals + ``exec`` into the trainer's namespace, the
rebuild keeps an explicit dict; trainers materialize it into a dataclass.
"""

from __future__ import annotations

import ast
from typing import Any, Iterable


def apply_overrides(config: dict[str, Any], argv: Iterable[str]) -> dict[str, Any]:
    """Apply config-file and --key=value overrides, in argv order."""
    config = dict(config)
    for arg in argv:
        if arg.startswith("--"):
            if "=" not in arg:
                raise ValueError(f"expected --key=value, got {arg!r}")
            key, val = arg[2:].split("=", 1)
            if key not in config:
                raise KeyError(f"unknown config key: {key}")
            try:
                attempt = ast.literal_eval(val)
            except (SyntaxError, ValueError):
                attempt = val
            default = config[key]
            if default is not None and attempt is not None:
                # EXACT type match (ref configurator.py:44 asserts equal
                # types): isinstance would accept bool for an int default,
                # so --n_layer=True silently built a 1-layer model. Kept
                # convenience deviation: an int literal for a float default
                # (bool excluded) is coerced.
                if type(attempt) is not type(default) and not (
                    isinstance(default, float)
                    and type(attempt) is int
                ):
                    raise TypeError(
                        f"--{key}: expected {type(default).__name__}, "
                        f"got {type(attempt).__name__}"
                    )
                if isinstance(default, float):
                    attempt = float(attempt)
            config[key] = attempt
        else:
            # positional: python config file executed over the config namespace
            with open(arg) as f:
                code = f.read()
            namespace: dict[str, Any] = dict(config)
            exec(compile(code, arg, "exec"), namespace)
            for key in list(namespace):
                if key in config:
                    config[key] = namespace[key]
    return config


def config_snapshot(config: dict[str, Any]) -> dict[str, Any]:
    """The persistable subset: int/float/bool/str values
    (ref contract: nanoGPT/train.py:80-82)."""
    return {
        k: v for k, v in config.items() if isinstance(v, (int, float, bool, str))
    }
