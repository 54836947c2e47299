"""Orbax checkpointing with the reference's checkpoint contract.

The reference persists {model state_dict, optimizer state_dict, model_args,
iter_num, best_val_loss, config} as ``ckpt.pt`` (best-val) and
``last_iter_ckpt.pt`` (always) (ref: nanoGPT/train.py:316-329). Here:

- ``<out_dir>/ckpt``            — best-val checkpoint (orbax dir)
- ``<out_dir>/last_iter_ckpt``  — always-saved latest checkpoint
- each holds the jax state pytree plus a ``meta.json`` with
  {model_args, iter_num, best_val_loss, config}.

Resume reads model_args from the checkpoint, overriding the config's
architecture keys — same rule as ref train.py:181-185.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

BEST = "ckpt"
LAST = "last_iter_ckpt"


def save_checkpoint(
    out_dir: str,
    name: str,
    state_pytree: Any,
    model_args: dict,
    iter_num: int,
    best_val_loss: float,
    config: dict,
) -> None:
    path = os.path.abspath(os.path.join(out_dir, name))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, state_pytree, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "model_args": model_args,
                "iter_num": int(iter_num),
                "best_val_loss": float(best_val_loss),
                "config": config,
            },
            f,
            indent=2,
        )


def load_checkpoint(
    out_dir: str,
    name: str = BEST,
    target: Optional[Any] = None,
) -> tuple[Any, dict]:
    """Returns (state_pytree, meta dict)."""
    path = os.path.abspath(os.path.join(out_dir, name))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        restore_args = jax.tree_util.tree_map(
            lambda x: ocp.ArrayRestoreArgs(dtype=x.dtype, sharding=getattr(x, "sharding", None)),
            target,
        )
        state = ckptr.restore(path, item=target, restore_args=restore_args)
    else:
        state = ckptr.restore(path)
    return state, meta


def checkpoint_exists(out_dir: str, name: str = BEST) -> bool:
    return os.path.exists(os.path.join(out_dir, name, "meta.json"))


def load_meta(out_dir: str, name: str = BEST) -> dict:
    """Checkpoint metadata WITHOUT restoring the state pytree — resume
    needs only model_args/iter_num/best_val_loss to build the model before
    the real sharded restore (a target=None restore materializes the whole
    params+optimizer tree on host just to throw it away)."""
    with open(os.path.join(out_dir, name, "meta.json")) as f:
        return json.load(f)
