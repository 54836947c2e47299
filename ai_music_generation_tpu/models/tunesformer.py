"""TunesFormer: hierarchical dual decoder over bar patches (TPU-native Flax).

Feature parity with ref: tunesformer/utils.py:84-255 —

- **PatchLevelDecoder** (ref :84-106): GPT-2 stack (9 layers, 768d) over
  patch embeddings. The reference one-hots each 32-char patch to
  [32*128] and applies a Linear; here the algebraically-identical
  embedding-gather-sum is used (one-hot @ W == sum of W rows at indices
  ``char + 128*position``) — no 4096-wide one-hot matmul on the hot path.
- **CharLevelDecoder** (ref :108-178): GPT-2 LM head (3 layers, vocab 128)
  over chars within a bar; input embedding 0 is REPLACED by the encoded
  patch vector; loss ignores pad positions (ref maps pad->-100).
  The reference additionally passes an attention_mask over pad keys; pads
  are strictly a suffix under causal masking, so masked keys are only ever
  attended from ignored positions — the mask is a loss no-op and is omitted.
- **TunesFormer** (ref :180-219): char decoder trains on
  ``encoded_patches[:-1]`` conditioning vs ``patches[1:]`` targets;
  optional weight sharing raises both stacks to max(layers)/max(context)
  and shares the transformer core.

TPU-native differences: everything is batched ([B, P, S] patch tensors with
a valid-length mask — the reference processes one tune per forward via
DataParallel scatter, ref train.py:35-36); generation runs as a jitted
per-bar step + 31-step char scan with on-device top-p/top-k/temperature
sampling (see decode/tunes_generate.py) instead of per-char GPU->CPU numpy
round trips (ref utils.py:245-248).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ai_music_generation_tpu.models.gpt import (
    Block,
    GPTConfig,
    KVCache,
    cross_entropy_ignore_index,
)

Array = jax.Array

CHAR_VOCAB = 128  # ASCII (ref: tunesformer/generate.py:52 vocab_size=128)


@dataclasses.dataclass(frozen=True)
class TunesFormerConfig:
    """Defaults = ref tunesformer/config.py:1-5 + HF GPT2Config defaults."""

    patch_length: int = 128
    patch_size: int = 32
    patch_layers: int = 9
    char_layers: int = 3
    n_embd: int = 768
    n_head: int = 12
    dropout: float = 0.1  # HF GPT2 default resid/embd/attn pdrop
    share_weights: bool = False
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    def patch_core_config(self) -> GPTConfig:
        layers = max(self.patch_layers, self.char_layers) if self.share_weights else self.patch_layers
        block = max(self.patch_length, self.patch_size) if self.share_weights else self.patch_length
        return GPTConfig(
            block_size=block, vocab_size=1, n_layer=layers, n_head=self.n_head,
            n_embd=self.n_embd, dropout=self.dropout, bias=True,
            dtype=self.dtype, param_dtype=self.param_dtype,
        )

    def char_core_config(self) -> GPTConfig:
        layers = max(self.patch_layers, self.char_layers) if self.share_weights else self.char_layers
        block = max(self.patch_length, self.patch_size) if self.share_weights else self.patch_size
        return GPTConfig(
            block_size=block, vocab_size=CHAR_VOCAB, n_layer=layers,
            n_head=self.n_head, n_embd=self.n_embd, dropout=self.dropout,
            bias=True, dtype=self.dtype, param_dtype=self.param_dtype,
        )


class TransformerCore(nn.Module):
    """GPT-2 stack over pre-computed input embeddings (wpe + blocks + ln_f)."""

    config: GPTConfig

    @nn.compact
    def __call__(self, embeds: Array, deterministic: bool = True,
                 cache: Optional[KVCache] = None):
        cfg = self.config
        B, T, C = embeds.shape
        wpe = nn.Embed(
            cfg.block_size, cfg.n_embd, dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02), name="wpe",
        )
        if cache is not None and cache.length.ndim == 1:
            # per-row ring cache (continuous-batching serving): row i's
            # token sits at its own logical position length[i]+t — same
            # contract as models/gpt.py's serving path
            pos = cache.length[:, None] + jnp.arange(T)[None, :]  # [B, T]
            pe = wpe(pos)
        else:
            pos = (cache.length + jnp.arange(T)) if cache is not None else jnp.arange(T)
            pe = wpe(pos)[None, :, :]
        x = embeds.astype(cfg.dtype) + pe
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        new_k, new_v = [], []
        for i in range(cfg.n_layer):
            layer_cache = None if cache is None else (cache.k[i], cache.v[i])
            cache_len = None if cache is None else cache.length
            x, lc = Block(cfg, i, name=f"h_{i}")(
                x, deterministic, layer_cache, cache_len,
                None if cache is None else cache.cursor)
            if lc is not None:
                new_k.append(lc[0])
                new_v.append(lc[1])
        x = nn.LayerNorm(
            use_bias=cfg.bias, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            epsilon=1e-5, name="ln_f",
        )(x)
        new_cache = None
        if cache is not None:
            new_cursor = (None if cache.cursor is None else
                          jnp.mod(cache.cursor + T, new_k[0].shape[1]))
            new_cache = KVCache(tuple(new_k), tuple(new_v), cache.length + T,
                                cursor=new_cursor)
        return x, new_cache


class PatchEmbedding(nn.Module):
    """one-hot(128) -> flatten -> Linear, as an embedding gather-sum
    (ref: tunesformer/utils.py:96-101)."""

    config: TunesFormerConfig

    @nn.compact
    def __call__(self, patches: Array) -> Array:  # [B, P, S] int32
        cfg = self.config
        table = self.param(
            "kernel", nn.initializers.normal(0.02),
            (cfg.patch_size * CHAR_VOCAB, cfg.n_embd), cfg.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (cfg.n_embd,), cfg.param_dtype)
        flat_idx = patches + jnp.arange(cfg.patch_size)[None, None, :] * CHAR_VOCAB
        emb = jnp.take(table.astype(cfg.dtype), flat_idx, axis=0).sum(axis=2)
        return emb + bias.astype(cfg.dtype)


class TunesFormer(nn.Module):
    """Dual decoder; ``__call__`` computes the training loss over a batch."""

    config: TunesFormerConfig

    def setup(self):
        cfg = self.config
        self.patch_embedding = PatchEmbedding(cfg, name="patch_embedding")
        self.char_wte = nn.Embed(
            CHAR_VOCAB, cfg.n_embd, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            embedding_init=nn.initializers.normal(0.02), name="char_wte",
        )
        if cfg.share_weights:
            core = TransformerCore(cfg.patch_core_config(), name="core")
            self.patch_core = core
            self.char_core = core
        else:
            self.patch_core = TransformerCore(cfg.patch_core_config(), name="patch_core")
            self.char_core = TransformerCore(cfg.char_core_config(), name="char_core")

    def encode_patches(self, patches: Array, deterministic: bool = True) -> Array:
        """[B, P, S] int32 -> [B, P, n_embd] encoded patch states."""
        emb = self.patch_embedding(patches)
        hidden, _ = self.patch_core(emb, deterministic)
        return hidden

    def encode_patches_cached(self, patches: Array, cache,
                              deterministic: bool = True):
        """``encode_patches`` that also fills a patch-core KVCache (the
        prefill half of incremental patch decoding). Returns
        (hidden [B, P, C], cache with length advanced by P)."""
        emb = self.patch_embedding(patches)
        return self.patch_core(emb, deterministic, cache=cache)

    def patch_step(self, new_patch: Array, cache, deterministic: bool = True):
        """One cached patch-decoder position (incremental
        ``encode_patches``).

        The reference re-encodes the FULL patch sequence every bar
        (ref: tunesformer/generate.py:136-140, utils.py:232-233) — O(P)
        patch positions per bar, and the patch stack dominates the bar
        step's FLOPs (patch_layers * P vs char_layers * S ~= 12:1 at
        reference shapes). Committed patches never change, so their K/V is
        append-only: this feeds only the newest patch through the patch
        core against the cache — O(1) positions per bar, byte-identical
        conditioning (pinned by tests/test_tunes_decode.py).

        new_patch: [B, S] int32 (the just-committed bar patch);
        cache: KVCache over the patch core. Returns (hidden [B, C] — the
        encoding that conditions the NEXT bar's chars, updated cache)."""
        emb = self.patch_embedding(new_patch[:, None, :])  # [B, 1, C]
        hidden, cache = self.patch_core(emb, deterministic, cache=cache)
        return hidden[:, 0, :], cache

    def char_logits(
        self, encoded_patch: Array, tokens: Array, deterministic: bool = True
    ) -> Array:
        """Char-decoder logits.

        encoded_patch: [N, n_embd]; tokens: [N, S] int32.
        Position 0's embedding is the encoded patch (ref: utils.py:146-149).
        Returns [N, S, 128] logits (weight-tied head, like GPT2LMHeadModel).
        """
        tok_emb = self.char_wte(tokens)
        embeds = jnp.concatenate(
            [encoded_patch[:, None, :].astype(tok_emb.dtype), tok_emb[:, 1:, :]], axis=1
        )
        hidden, _ = self.char_core(embeds, deterministic)
        return self.char_wte.attend(hidden)

    def char_step(
        self,
        encoded_patch: Array,  # [N, n_embd]
        tok: Array,  # [N] int32 — the token AT the cache's current position
        cache,  # KVCache (scalar length) over the char core, max_len >= S
        deterministic: bool = True,
    ):
        """One cached char-decoder position (incremental ``char_logits``).

        Feeds position ``cache.length``: the encoded patch at position 0
        (ref: utils.py:146-149), the char embedding otherwise. Returns
        (logits [N, 128] for this position, updated cache). The bar scan
        uses this to decode a bar in O(S) char-core tokens instead of the
        full-forward O(S^2) (decode/tunes_generate.py::char_bar_scan)."""
        tok_emb = self.char_wte(tok)[:, None, :]  # [N, 1, C]
        first = encoded_patch[:, None, :].astype(tok_emb.dtype)
        embeds = jnp.where(cache.length == 0, first, tok_emb)
        hidden, cache = self.char_core(embeds, deterministic, cache=cache)
        return self.char_wte.attend(hidden)[:, 0, :], cache

    def __call__(
        self,
        patches: Array,  # [B, P, S] int32, zero-padded rows beyond n_patches
        deterministic: bool = True,
        patch_indices: Optional[Array] = None,  # [B, K] int32
    ) -> Array:
        """Mean char cross-entropy (ref composition: utils.py:209-219).

        Conditioning: encoded patch p predicts the chars of patch p+1.
        Fully-padded rows contribute nothing (pad labels are ignored).

        ``patch_indices`` selects which conditioning rows (0..P-2) feed the
        char decoder — the reference's PATCH_SAMPLING_BATCH_SIZE memory
        saver (ref: utils.py:126-135); the trainer draws them per step.
        """
        cfg = self.config
        B, P, S = patches.shape
        encoded = self.encode_patches(patches, deterministic)  # [B, P, C]
        cond = encoded[:, :-1, :]  # [B, P-1, C]
        target = patches[:, 1:, :]  # [B, P-1, S]
        if patch_indices is not None:
            cond = jnp.take_along_axis(cond, patch_indices[:, :, None], axis=1)
            target = jnp.take_along_axis(target, patch_indices[:, :, None], axis=1)
        K = cond.shape[1]
        cond = cond.reshape(B * K, cfg.n_embd)
        target = target.reshape(B * K, S)
        logits = self.char_logits(cond, target, deterministic)  # [N, S, 128]
        labels = jnp.where(target == 0, -1, target)
        # HF-style shift: logits[:, :-1] predict labels[:, 1:]
        return cross_entropy_ignore_index(logits[:, :-1, :], labels[:, 1:])


def num_params(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def load_tunesformer(out_dir: str, name: str = "weights",
                     dtype=jnp.bfloat16):
    """(model, params, meta) from an orbax checkpoint written by
    cli/tunesformer_train — the ONE loading implementation shared by the
    generate / batch-sampling / serving CLIs (was triplicated; a new
    model_arg added to one site and not the others silently loaded a
    wrong config)."""
    import os

    from ai_music_generation_tpu.train import checkpoint as ckpt_lib

    torch_ckpt = os.path.join(out_dir, "weights.pth")
    if not ckpt_lib.checkpoint_exists(out_dir, name) and os.path.exists(torch_ckpt):
        # a reference TunesFormer directory: auto-import weights.pth in
        # memory so migrating users can point the generate/sampling/serving
        # CLIs at it unchanged (format: ref tunesformer/train.py:189-208;
        # patch_length/n_head are not in the tensors — reference defaults
        # assumed, use cli.convert_ckpt from-torch for other values)
        import dataclasses

        import torch

        from ai_music_generation_tpu.models.tunesformer_import import (
            config_from_reference_state, params_from_tunesformer_state)

        print(f"no orbax checkpoint in {out_dir}; importing {torch_ckpt}")
        ckpt = torch.load(torch_ckpt, map_location="cpu", weights_only=False)
        sd = ckpt["model"] if isinstance(ckpt, dict) and "model" in ckpt else ckpt
        sd = {k: v for k, v in sd.items()
              if not k.endswith(".attn.bias")
              and not k.endswith(".attn.masked_bias")}
        cfg = dataclasses.replace(
            config_from_reference_state(sd, dtype=dtype), dropout=0.0)
        params = params_from_tunesformer_state(sd, cfg)
        meta = {
            "model_args": dict(
                patch_length=cfg.patch_length, patch_size=cfg.patch_size,
                patch_layers=cfg.patch_layers, char_layers=cfg.char_layers,
                n_embd=cfg.n_embd, n_head=cfg.n_head,
                share_weights=cfg.share_weights),
            "iter_num": int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0,
            "best_val_loss": float(ckpt.get("min_eval_loss", 100.0))
            if isinstance(ckpt, dict) else 100.0,
            "config": {},
        }
        return TunesFormer(cfg), params, meta

    state, meta = ckpt_lib.load_checkpoint(out_dir, name)
    ma = meta["model_args"]
    cfg = TunesFormerConfig(
        patch_length=ma["patch_length"], patch_size=ma["patch_size"],
        patch_layers=ma["patch_layers"], char_layers=ma["char_layers"],
        n_embd=ma["n_embd"], n_head=ma["n_head"],
        share_weights=ma["share_weights"], dropout=0.0, dtype=dtype,
    )
    return TunesFormer(cfg), {"params": state["params"]["params"]}, meta
