"""Mixture-of-Experts MLP with einsum (GShard-style) dispatch, TPU-first.

No reference analogue — nanoGPT's MLP is dense (ref: nanoGPT/model.py:78-92).
This is the capability that scales parameter count past one chip's HBM
without scaling per-token FLOPs: E expert MLPs live sharded over the mesh
``model`` axis (expert parallelism; rules in parallel/mesh.py), each token is
routed to its top-k experts, and only those experts' FLOPs are spent on it.

TPU-native design choices:
- **Static shapes everywhere.** Routing is expressed as one-hot dispatch /
  combine tensors ([N, E, capacity]) contracted with einsums — the classic
  GShard/Switch formulation — so XLA sees three big MXU matmuls per layer
  and zero gathers/scatters; tokens over an expert's capacity fall through
  the residual connection (combine weight 0).
- **Top-k gate renormalization** (Mixtral-style: the chosen k probabilities
  are rescaled to sum to 1). Besides being the modern default, it gives an
  exactness oracle: with all experts initialized IDENTICALLY the layer
  equals the dense MLP bit-tight regardless of routing — tests/test_moe.py
  pins that.
- **fp32 router.** Gate softmax/top-k run in fp32 (bf16 ties break
  differently across shardings); expert matmuls run in the model compute
  dtype for the MXU.
- Load-balance auxiliary loss (Switch Transformer eq. 4, generalized to
  top-k): ``E * sum_e f_e * p_e`` with f the routed-token fraction and p the
  mean gate probability; returned to the caller, weighted into the training
  loss by ``GPTConfig.moe_aux_coef``.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _init_normal(std: float):
    return nn.initializers.normal(stddev=std)


class MoEMLP(nn.Module):
    """Drop-in replacement for models/gpt.py::MLP when ``n_expert > 0``.

    Returns ``(y, aux_loss)`` — aux is a scalar fp32 load-balance term.
    """

    config: object  # GPTConfig (duck-typed to avoid a circular import)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True):
        cfg = self.config
        B, T, C = x.shape
        E, K = cfg.n_expert, min(cfg.expert_top_k, cfg.n_expert)
        N = B * T
        hidden = 4 * C

        w_fc = self.param("w_fc", _init_normal(0.02), (E, C, hidden),
                          cfg.param_dtype)
        w_proj = self.param(
            "w_proj", _init_normal(0.02 / math.sqrt(2 * cfg.n_layer)),
            (E, hidden, C), cfg.param_dtype)
        if cfg.bias:
            b_fc = self.param("b_fc", nn.initializers.zeros, (E, hidden),
                              cfg.param_dtype)
            b_proj = self.param("b_proj", nn.initializers.zeros, (E, C),
                                cfg.param_dtype)

        xt = x.reshape(N, C)
        # -- routing (fp32) ---------------------------------------------------
        logits = nn.Dense(
            E, use_bias=False, dtype=jnp.float32,
            param_dtype=jnp.float32, kernel_init=_init_normal(0.02),
            name="router",
        )(xt.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [N, E]
        gate, expert_idx = jax.lax.top_k(probs, K)  # [N, K]
        gate = gate / jnp.sum(gate, axis=-1, keepdims=True)

        # per-expert buffer size; ceil so capacity_factor=1.0 with perfectly
        # balanced routing drops nothing
        capacity = max(1, int(math.ceil(cfg.capacity_factor * N * K / E)))
        capacity = min(capacity, N)  # an expert can never see > N tokens

        sel = jax.nn.one_hot(expert_idx, E, dtype=jnp.int32)  # [N, K, E]
        # position of each (token, k) slot within its expert's buffer.
        # Priority order: all k=0 assignments across tokens first, then k=1
        # (GShard §3.2) — a token's primary expert is dropped last.
        flat = jnp.transpose(sel, (1, 0, 2)).reshape(K * N, E)
        pos_flat = jnp.cumsum(flat, axis=0) - flat  # [K*N, E]
        pos = jnp.transpose(
            pos_flat.reshape(K, N, E), (1, 0, 2))  # [N, K, E]
        keep = (pos < capacity) & (sel > 0)  # [N, K, E] bool
        slot = jnp.sum(pos * sel, axis=-1)  # [N, K] buffer row per slot

        # dispatch [N, E, capacity]: token n fills expert e's row `slot` for
        # each kept (n, k); combine carries the renormalized gate weight
        onehot_cap = jax.nn.one_hot(slot, capacity, dtype=jnp.float32)
        disp_nke = keep.astype(jnp.float32)  # [N, K, E]
        dispatch = jnp.einsum("nke,nkc->nec", disp_nke, onehot_cap)
        combine = jnp.einsum(
            "nke,nkc->nec", disp_nke * gate[..., None], onehot_cap)

        # -- expert compute (MXU, compute dtype) ------------------------------
        xe = jnp.einsum(
            "nec,nd->ecd", dispatch.astype(cfg.dtype), xt.astype(cfg.dtype))
        h = jnp.einsum("ecd,edf->ecf", xe, w_fc.astype(cfg.dtype))
        if cfg.bias:
            h = h + b_fc[:, None, :].astype(cfg.dtype)
        h = nn.gelu(h)
        ye = jnp.einsum("ecf,efd->ecd", h, w_proj.astype(cfg.dtype))
        if cfg.bias:
            ye = ye + b_proj[:, None, :].astype(cfg.dtype)
        y = jnp.einsum("nec,ecd->nd", combine.astype(cfg.dtype), ye)
        y = y.reshape(B, T, C)
        y = nn.Dropout(cfg.dropout)(y, deterministic=deterministic)

        # -- load-balance aux (Switch eq. 4; fractions use PRE-capacity
        # assignments so the gradient still pushes overflowing experts down)
        f = jnp.mean(jnp.sum(sel, axis=1).astype(jnp.float32), axis=0) / K
        p = jnp.mean(probs, axis=0)
        aux = E * jnp.sum(f * p)
        return y, aux
