"""Device-mesh construction and sharding rules.

Replaces the reference's process-group plumbing (torch.distributed /
torchrun rendezvous / NCCL all-reduce, ref: nanoGPT/train.py:72,86-99,378-379)
with the JAX SPMD model: build a ``jax.sharding.Mesh`` once, annotate
parameter/batch shardings, and let XLA emit collectives over ICI/DCN.

Axes:
- ``data``  — batch (data parallel; the reference's only strategy).
- ``model`` — tensor parallel over attention heads / MLP hidden dim
  (no reference equivalent; optional extra headroom for larger models).

FSDP (``fsdp=True`` in :func:`shardings_for_tree`) additionally shards every
matrix-shaped parameter — and, via path-suffix matching, its AdamW moment
buffers — across the ``data`` axis on a dim the TP rules leave free. XLA
then all-gathers each weight just-in-time for its matmul and reduce-scatters
its gradient (the ZeRO-3 schedule) with no manual collectives: per-device
param+optimizer memory drops ~n_data-fold, which is what lets >1 GB-scale
models train on small-HBM chips. The reference keeps full replicas per rank
(DDP, ref: nanoGPT/train.py:86-99); this is a strict superset.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    With the defaults, all devices go to the data axis — matching the
    reference's pure-DP DDP layout (ref: nanoGPT/train.py:226-227).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model == len(devices), (
        f"mesh {n_data}x{n_model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


# Sharding rules for GPT parameters, matched against the flax param path.
# Tensor-parallel layout follows the Megatron pattern: QKV/MLP-in column
# parallel, attn-out/MLP-out row parallel, embeddings sharded on vocab/embd.
_GPT_PARAM_RULES: list[tuple[str, P]] = [
    (r".*attn/c_attn/kernel", P(None, MODEL_AXIS)),
    (r".*attn/c_attn/bias", P(MODEL_AXIS)),
    (r".*attn/c_proj/kernel", P(MODEL_AXIS, None)),
    (r".*mlp/c_fc/kernel", P(None, MODEL_AXIS)),
    (r".*mlp/c_fc/bias", P(MODEL_AXIS)),
    (r".*mlp/c_proj/kernel", P(MODEL_AXIS, None)),
    (r".*wte/embedding", P(MODEL_AXIS, None)),
    (r".*wpe/embedding", P(None, None)),
    # MoE experts (models/moe.py): EXPERT parallelism — the leading expert
    # dim shards over the model axis, so each device owns E/n_model whole
    # expert MLPs and XLA turns the dispatch/combine einsums into
    # all-to-alls over ICI. The fp32 router stays replicated (tiny, and
    # every device needs every token's gate).
    (r".*moe/w_fc", P(MODEL_AXIS, None, None)),
    (r".*moe/w_proj", P(MODEL_AXIS, None, None)),
    (r".*moe/b_fc", P(MODEL_AXIS, None)),
    (r".*moe/b_proj", P(MODEL_AXIS, None)),
    # TunesFormer patch embedding [patch_size*128, n_embd]: column (embd)
    # sharded so the row gather stays shard-local and the position-sum
    # produces a model-sharded activation (same layout as c_fc output)
    (r".*patch_embedding/kernel", P(None, MODEL_AXIS)),
    (r".*patch_embedding/bias", P(MODEL_AXIS)),
    (r".*", P()),  # layernorms, remaining biases: replicated
]


def spec_for_param(path: str) -> P:
    for pattern, spec in _GPT_PARAM_RULES:
        if re.fullmatch(pattern, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def shardings_for_tree(mesh: Mesh, tree, fsdp: bool = False):
    """NamedSharding pytree for params OR optimizer state.

    Rules match on the leaf's tree path, so optax moment buffers (whose paths
    end with the parameter path, e.g. ``1/mu/h_0/attn/c_attn/kernel``) inherit
    their parameter's layout automatically; scalars/counters replicate.

    With ``fsdp=True``, every >=2-D leaf is additionally sharded over the
    ``data`` axis on the largest evenly-divisible dim its TP spec leaves
    free (ZeRO-3; see module docstring). 1-D leaves (biases, layernorms)
    stay replicated — they are a negligible fraction of the state and
    gathering them per-use costs more latency than the memory saved.
    """

    def shard(path, leaf):
        s = spec_for_param(_path_str(path))
        ndim = getattr(leaf, "ndim", 0)
        if len(s) > ndim:  # scalar or lower-rank leaf: trim trailing axes
            s = P(*s[:ndim])
        shape = getattr(leaf, "shape", ())
        # replicate any dim the mesh can't split evenly (e.g. an odd vocab
        # size from a dataset meta.pkl vs a 2-way model axis) — matches the
        # reference's tolerance for arbitrary meta vocab sizes
        # (ref: nanoGPT/train.py:152-158)
        fixed = list(
            None
            if axis is not None and shape[i] % mesh.shape[axis] != 0
            else axis
            for i, axis in enumerate(tuple(s) + (None,) * (ndim - len(s)))
        )
        if fsdp and ndim >= 2 and mesh.shape[DATA_AXIS] > 1:
            free = [i for i, axis in enumerate(fixed)
                    if axis is None and shape[i] % mesh.shape[DATA_AXIS] == 0]
            if free:
                fixed[max(free, key=lambda i: shape[i])] = DATA_AXIS
        return NamedSharding(mesh, P(*fixed))

    return jax.tree_util.tree_map_with_path(shard, tree)


# back-compat alias
def param_shardings(mesh: Mesh, params):
    return shardings_for_tree(mesh, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
