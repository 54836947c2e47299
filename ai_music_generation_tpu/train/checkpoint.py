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
import numpy as np
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
    shardings: Optional[Any] = None,
) -> tuple[Any, dict]:
    """Returns (state_pytree, meta dict).

    ``shardings`` (a pytree of jax.sharding.Sharding matching ``target``)
    makes restore topology-explicit: a checkpoint saved on one mesh restores
    directly into ANY other mesh layout — the TPU operational analogue of the
    reference's topology-free resume (ref: nanoGPT/train.py:173-195). Without
    it, shardings are taken from the target's own arrays; only a bare
    host-array target with no shardings at all falls back to
    sharding-from-file (orbax warns there — pass shardings to avoid it).
    ``target`` leaves may be real arrays or jax.ShapeDtypeStruct (abstract
    restore: nothing is materialized twice).
    """
    path = os.path.abspath(os.path.join(out_dir, name))
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        if shardings is not None:
            restore_args = jax.tree_util.tree_map(
                lambda x, s: ocp.ArrayRestoreArgs(dtype=x.dtype, sharding=s),
                target, shardings,
            )
        else:
            restore_args = jax.tree_util.tree_map(
                lambda x: ocp.ArrayRestoreArgs(
                    dtype=x.dtype, sharding=getattr(x, "sharding", None)),
                target,
            )
        state = ckptr.restore(path, item=target, restore_args=restore_args)
    else:
        # Host restore to numpy: no device placement and no sharding-from-file
        # read (the checkpoint's save-time mesh is irrelevant to a host dump,
        # and orbax's cross-topology warning never fires).
        md = ckptr.metadata(path).item_metadata.tree
        is_arr = lambda x: hasattr(x, "shape") and hasattr(x, "dtype")  # noqa: E731
        item = jax.tree_util.tree_map(
            lambda m: np.zeros(m.shape, m.dtype), md, is_leaf=is_arr)
        restore_args = jax.tree_util.tree_map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)
        state = ckptr.restore(path, item=item, restore_args=restore_args)
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
