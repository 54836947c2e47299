"""Flax WavLM audio encoder (TPU port of the Audiobox-aesthetics SSL backbone).

The reference scores audio with Meta's ``audio-aes`` CLI, whose predictor is
a WavLM-style SSL encoder + 4 regression heads
(ref: scripts/common/abc_to_midi_wav_and_aesthetics.py:323-355; model per
arXiv:2502.05139). This module is a from-scratch JAX/Flax implementation of
the WavLM encoder matching the Hugging Face ``WavLMModel`` semantics
(transformers/models/wavlm/modeling_wavlm.py — the canonical public
serialization of WavLM checkpoints), differentially tested against it in
``tests/test_audiobox.py``.

Architecture (inference path only — no SpecAugment/quantizer):

1. **Feature encoder** — stack of 1-D convs over raw 16 kHz audio
   (kernel 10,3,3,3,3,2,2 / stride 5,2,2,2,2,2,2 → 49.6 Hz frames);
   ``feat_extract_norm="group"`` (base): GroupNorm(C, C) after conv 0 only;
   ``"layer"`` (large): per-conv LayerNorm over channels. GELU throughout.
2. **Feature projection** — LayerNorm → Linear(conv_dim[-1] → hidden).
3. **Positional conv embedding** — grouped Conv1d(kernel 128, groups 16,
   weight-normalized in the torch checkpoint; the converter pre-composes
   g·v/||v||), same-pad trim for even kernels, GELU, residual add.
4. **Transformer** with WavLM's *gated relative position bias*: layer 0
   owns a bucketed relative-position embedding (T5-style log buckets,
   num_buckets=320, max_distance=800) shared by all layers; every layer
   gates it per query position from its own query states.
   Post-norm (base) or pre-norm + final LN (large).

TPU notes: everything is static-shape and jit-compiled once per canonical
chunk length (10 s = 160k samples, see ``eval/audiobox.py``); convs and
attention run in ``dtype`` (bf16 on TPU by default via AudioboxConfig) with
fp32 layernorms/softmax via explicit casts XLA fuses away.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False  # False = base (post-norm)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def frames_for_samples(self, n: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def _conv1d(x: Array, kernel: Array, stride: int, groups: int = 1,
            padding: int = 0, bias: Optional[Array] = None) -> Array:
    """Torch-layout Conv1d: x [B, C, T], kernel [O, I/groups, K]."""
    out = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(stride,),
        padding=[(padding, padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if bias is not None:
        out = out + bias.astype(out.dtype)[None, :, None]
    return out


class FeatureEncoder(nn.Module):
    """Raw-audio conv stack (HF WavLMFeatureEncoder semantics)."""

    config: WavLMConfig

    @nn.compact
    def __call__(self, wave: Array) -> Array:  # [B, T] -> [B, frames, C]
        cfg = self.config
        x = wave[:, None, :].astype(cfg.dtype)  # [B, 1, T]
        in_dim = 1
        for i, (out_dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            kernel = self.param(
                f"conv_{i}_kernel", nn.initializers.he_normal(),
                (out_dim, in_dim, k), jnp.float32)
            bias = (self.param(f"conv_{i}_bias", nn.initializers.zeros,
                               (out_dim,), jnp.float32)
                    if cfg.conv_bias else None)
            x = _conv1d(x, kernel, s, bias=bias)
            if cfg.feat_extract_norm == "group" and i == 0:
                # GroupNorm(C, C): per-channel norm over time, fp32
                scale = self.param(f"norm_{i}_scale", nn.initializers.ones,
                                   (out_dim,), jnp.float32)
                b = self.param(f"norm_{i}_bias", nn.initializers.zeros,
                               (out_dim,), jnp.float32)
                xf = x.astype(jnp.float32)
                mean = xf.mean(-1, keepdims=True)
                var = xf.var(-1, keepdims=True)
                xf = (xf - mean) * lax.rsqrt(var + cfg.layer_norm_eps)
                x = (xf * scale[None, :, None] + b[None, :, None]).astype(cfg.dtype)
            elif cfg.feat_extract_norm == "layer":
                # LayerNorm over channels at each timestep, fp32
                scale = self.param(f"norm_{i}_scale", nn.initializers.ones,
                                   (out_dim,), jnp.float32)
                b = self.param(f"norm_{i}_bias", nn.initializers.zeros,
                               (out_dim,), jnp.float32)
                xf = x.astype(jnp.float32)
                mean = xf.mean(1, keepdims=True)
                var = xf.var(1, keepdims=True)
                xf = (xf - mean) * lax.rsqrt(var + 1e-5)
                x = (xf * scale[None, :, None] + b[None, :, None]).astype(cfg.dtype)
            x = nn.gelu(x, approximate=False)
            in_dim = out_dim
        return x.transpose(0, 2, 1)  # [B, frames, C]


class _LayerNorm(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        out = (xf - mean) * lax.rsqrt(var + self.eps) * scale + bias
        return out.astype(x.dtype)


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> Array:
    """T5-style log-bucketed relative positions (HF WavLMAttention.compute_bias
    / _relative_positions_bucket semantics, bidirectional)."""
    context = jnp.arange(q_len)[:, None]
    memory = jnp.arange(k_len)[None, :]
    rel = memory - context  # [Q, K]
    half = num_buckets // 2
    buckets = (rel > 0).astype(jnp.int32) * half
    rel = jnp.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    rel_if_large = (
        jnp.log(rel.astype(jnp.float32) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    )
    rel_if_large = jnp.minimum(
        max_exact + rel_if_large.astype(jnp.int32), half - 1)
    return buckets + jnp.where(is_small, rel, rel_if_large)


class GatedRelPosAttention(nn.Module):
    """WavLM self-attention with gated relative position bias.

    ``position_bias`` [H, T, T] is computed by layer 0 (which owns
    ``rel_attn_embed``) and passed to later layers; every layer applies its
    own query-conditioned gate: gate_a·(gate_b·const − 1) + 2, per
    (batch, head, query-pos).
    """

    config: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(
        self, x: Array, position_bias: Optional[Array],
        key_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        cfg = self.config
        B, T, D = x.shape
        H, hd = cfg.num_heads, cfg.head_dim

        if position_bias is None:
            rel_embed = self.param(
                "rel_attn_embed", nn.initializers.normal(0.02),
                (cfg.num_buckets, H), jnp.float32)
            buckets = relative_position_buckets(
                T, T, cfg.num_buckets, cfg.max_distance)
            position_bias = rel_embed[buckets].transpose(2, 0, 1)  # [H, T, T]

        q = nn.Dense(D, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(D, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(D, dtype=cfg.dtype, name="v_proj")(x)

        # query-conditioned gate on the shared bias (HF modeling_wavlm.py
        # WavLMAttention.forward steps 1-4). NOTE: the gate input is the
        # layer's INPUT hidden states reshaped per head, not q.
        gate_in = x.reshape(B, T, H, hd).transpose(0, 2, 1, 3)  # [B,H,T,hd]
        gru_const = self.param("gru_rel_pos_const", nn.initializers.ones,
                               (1, H, 1, 1), jnp.float32)
        proj = nn.Dense(8, dtype=jnp.float32, name="gru_rel_pos_linear")(
            gate_in.astype(jnp.float32))
        proj = proj.reshape(B, H, T, 2, 4).sum(-1)  # [B,H,T,2]
        gate = jax.nn.sigmoid(proj)
        gate_a, gate_b = gate[..., 0:1], gate[..., 1:2]  # [B,H,T,1]
        gate_out = gate_a * (gate_b * gru_const - 1.0) + 2.0  # [B,H,T,1]
        gated_bias = gate_out * position_bias[None].astype(jnp.float32)

        qh = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        kh = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        vh = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
        scores = scores / math.sqrt(hd) + gated_bias
        if key_mask is not None:
            # HF adds (1-mask)*finfo.min to the scores (attention never
            # reaches padded frames); mirror the additive form for
            # numerical parity in the differential tests
            scores = scores + ((1.0 - key_mask[:, None, None, :])
                               * jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        out = nn.Dense(D, dtype=cfg.dtype, name="out_proj")(out)
        return out, position_bias


class EncoderLayer(nn.Module):
    config: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(
        self, x: Array, position_bias: Optional[Array],
        key_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        cfg = self.config
        attn = GatedRelPosAttention(
            cfg, self.has_relative_position_bias, name="attention")
        ln1 = _LayerNorm(cfg.layer_norm_eps, name="layer_norm")
        ln2 = _LayerNorm(cfg.layer_norm_eps, name="final_layer_norm")

        if cfg.do_stable_layer_norm:  # pre-norm (large)
            a, position_bias = attn(ln1(x), position_bias, key_mask)
            x = x + a
            x = x + self._ffn(ln2(x))
        else:  # post-norm (base)
            a, position_bias = attn(x, position_bias, key_mask)
            x = ln1(x + a)
            x = ln2(x + self._ffn(x))
        return x, position_bias

    def _ffn(self, x: Array) -> Array:
        cfg = self.config
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype,
                     name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                        name="output_dense")(h)


class WavLMEncoder(nn.Module):
    """Full encoder: wave [B, T] -> (last_hidden, all_hidden [L+1, B, F, D]).

    ``all_hidden`` matches HF ``output_hidden_states=True`` ordering: entry i
    is the input to transformer layer i (after pos-conv (+LN for post-norm)),
    entry L is the final output — the features the aesthetics heads weight.
    """

    config: WavLMConfig

    @nn.compact
    def __call__(self, wave: Array,
                 frame_mask: Optional[Array] = None) -> Tuple[Array, Array]:
        """``frame_mask``: optional [B, frames] 1.0/0.0 validity mask (HF
        ``attention_mask`` downsampled to frames). Padded frames are zeroed
        before the positional conv and excluded from attention — without
        this, a padded chunk's silent tail contaminates the valid frames'
        features (HF masks them; score parity requires the same)."""
        cfg = self.config
        feats = FeatureEncoder(cfg, name="feature_encoder")(wave)
        feats = _LayerNorm(cfg.layer_norm_eps, name="fp_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fp_projection")(feats)
        if frame_mask is not None:
            # HF zeroes hidden states at padded positions before pos-conv
            x = x * frame_mask[..., None].astype(x.dtype)

        # positional conv embedding (weight pre-composed from weight-norm g,v)
        k = cfg.num_conv_pos_embeddings
        groups = cfg.num_conv_pos_embedding_groups
        pos_kernel = self.param(
            "pos_conv_kernel",
            nn.initializers.normal(
                2.0 * math.sqrt(1.0 / (k * cfg.hidden_size))),
            (cfg.hidden_size, cfg.hidden_size // groups, k), jnp.float32)
        pos_bias = self.param("pos_conv_bias", nn.initializers.zeros,
                              (cfg.hidden_size,), jnp.float32)
        pc = _conv1d(x.transpose(0, 2, 1), pos_kernel, 1, groups=groups,
                     padding=k // 2, bias=pos_bias)
        if k % 2 == 0:
            pc = pc[:, :, :-1]
        x = x + nn.gelu(pc, approximate=False).transpose(0, 2, 1)

        if not cfg.do_stable_layer_norm:
            x = _LayerNorm(cfg.layer_norm_eps, name="layer_norm")(x)

        hiddens = [x]
        position_bias = None
        for i in range(cfg.num_layers):
            x, position_bias = EncoderLayer(
                cfg, has_relative_position_bias=(i == 0), name=f"layer_{i}"
            )(x, position_bias, frame_mask)
            hiddens.append(x)

        if cfg.do_stable_layer_norm:
            x = _LayerNorm(cfg.layer_norm_eps, name="layer_norm")(x)
            hiddens[-1] = x

        return x, jnp.stack(hiddens)
