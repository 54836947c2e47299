"""Training orchestration: init/resume, pjit train loop, eval, checkpoints.

Behavior parity with the reference trainer (ref: nanoGPT/train.py):
- config defaults and flag names (ref :34-79), config-file + --k=v overrides
- vocab_size from the dataset's meta.pkl, else 50304 (ref :152-158)
- init_from: scratch | resume (arch keys forced from checkpoint, ref :181-185)
- cosine LR with linear warmup (ref :247-259), AdamW decay groups, grad clip
- eval every eval_interval -> best-val ``ckpt`` (or always) + ``last_iter_ckpt``,
  JSONL loss log (ref :262-329)
- MFU EMA reporting (ref :363-369)

TPU-native differences:
- torch.compile/AMP/GradScaler/DDP are replaced by jit + bf16 + a
  (data, model) mesh with sharding-annotated state; gradient reduction is an
  XLA psum over ICI instead of NCCL all-reduce.
- gradient accumulation runs as an on-device lax.scan (see step.py); the
  reference's "divide accum steps by world size" (ref :96-99) becomes
  accum // n_data with the micro-batch widened by n_data.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ai_music_generation_tpu.data.memmap import BinDataset, load_meta
from ai_music_generation_tpu.models.gpt import (
    GPT,
    GPTConfig,
    estimate_mfu,
    num_params,
)
from ai_music_generation_tpu.parallel import mesh as pmesh
from ai_music_generation_tpu.train import checkpoint as ckpt_lib
from ai_music_generation_tpu.train.optimizer import (
    cosine_warmup_schedule,
    make_optimizer,
)
from ai_music_generation_tpu.train.step import TrainState, make_eval_step, make_train_step

# Reference trainer defaults (ref: nanoGPT/train.py:34-79). Keys kept
# name-compatible so the reference's config files apply unchanged.
DEFAULTS: dict[str, Any] = dict(
    out_dir="out",
    eval_interval=2000,
    log_interval=1,
    eval_iters=200,
    eval_only=False,
    always_save_checkpoint=True,
    init_from="scratch",  # 'scratch' | 'resume'
    wandb_log=False,
    wandb_project="owt",
    wandb_run_name="gpt2",
    dataset="openwebtext",
    gradient_accumulation_steps=5 * 8,
    batch_size=12,
    block_size=1024,
    n_layer=12,
    n_head=12,
    n_embd=768,
    dropout=0.0,
    bias=False,
    learning_rate=6e-4,
    max_iters=600000,
    weight_decay=1e-1,
    beta1=0.9,
    beta2=0.95,
    grad_clip=1.0,
    decay_lr=True,
    warmup_iters=2000,
    lr_decay_iters=600000,
    min_lr=6e-5,
    seed=1337,
    data_root="data",  # datasets live at <data_root>/<dataset>/
    # TPU-native knobs (replace device/dtype/compile/backend):
    n_model=1,  # tensor-parallel mesh axis size
    fsdp=False,  # ZeRO-3: shard params+opt state over the data axis
    n_expert=0,  # Mixture-of-Experts: experts per block MLP (0 = dense;
    # experts shard over the model axis — models/moe.py)
    n_kv_head=0,  # grouped-query attention: K/V heads (0 = n_head, the
    # reference architecture; models/gpt.py GPTConfig.n_kv_head)
    expert_top_k=2,
    capacity_factor=1.25,
    moe_aux_coef=0.01,
    dtype="bfloat16",  # 'bfloat16' | 'float32'
    eval_dataset="",  # optional override of the eval dataset dir
)

ARCH_KEYS = ("n_layer", "n_head", "n_embd", "block_size", "bias", "vocab_size")
# MoE architecture keys ride model_args only when n_expert > 0, so dense
# checkpoints (and reference-bridge ones) keep their exact key set
MOE_KEYS = ("n_expert", "expert_top_k", "capacity_factor", "moe_aux_coef")
# likewise n_kv_head rides only when GQA is on (nonzero / non-default)
OPT_ARCH_KEYS = MOE_KEYS + ("n_kv_head",)


class Trainer:
    def __init__(self, config: dict[str, Any]):
        self.c = dict(DEFAULTS)
        self.c.update(config)
        c = self.c

        os.makedirs(c["out_dir"], exist_ok=True)
        self.mesh = pmesh.make_mesh(n_model=c["n_model"])
        self.n_data = self.mesh.shape[pmesh.DATA_AXIS]
        # reference semantics: accum divided over data-parallel workers so
        # tokens/iter stays what the config specifies (ref ASSERTS
        # divisibility, nanoGPT/train.py:96-99). accum=1 is the documented
        # widened-batch mode (the music configs' setting: each device adds
        # batch_size rows, tokens/iter scales with the mesh). Any other
        # non-divisible accum would silently floor and change tokens/iter
        # — reject it like the reference does.
        accum = c["gradient_accumulation_steps"]
        if accum != 1 and accum % self.n_data != 0:
            raise ValueError(
                f"gradient_accumulation_steps={accum} must be 1 (widened-"
                f"batch mode) or divisible by the data-parallel size "
                f"{self.n_data} (ref nanoGPT/train.py:96-99)")
        self.grad_accum = max(1, accum // self.n_data)
        self.micro_batch = c["batch_size"] * self.n_data
        self.tokens_per_iter = self.grad_accum * self.micro_batch * c["block_size"]

        data_dir = os.path.join(c["data_root"], c["dataset"])
        self.train_data = BinDataset(os.path.join(data_dir, "train.bin"))
        eval_dir = os.path.join(c["data_root"], c["eval_dataset"]) if c["eval_dataset"] else data_dir
        self.val_data = BinDataset(os.path.join(eval_dir, "val.bin"))

        meta = load_meta(os.path.join(data_dir, "meta.pkl"))
        self.meta_vocab_size = meta.get("vocab_size") if meta else None

        self.iter_num = 0
        self.best_val_loss = 1e9
        self._build_model_and_state()
        self._build_steps()

    # -- init / resume ----------------------------------------------------
    def _model_args(self) -> dict:
        c = self.c
        vocab = self.meta_vocab_size or 50304  # (ref: nanoGPT/train.py:165-168)
        args = dict(
            n_layer=c["n_layer"], n_head=c["n_head"], n_embd=c["n_embd"],
            block_size=c["block_size"], bias=c["bias"], vocab_size=vocab,
        )
        if c["n_expert"] > 0:
            args.update({k: c[k] for k in MOE_KEYS})
        if c["n_kv_head"]:
            args["n_kv_head"] = c["n_kv_head"]
        return args

    def _build_model_and_state(self):
        c = self.c
        model_args = self._model_args()
        resuming = c["init_from"] == "resume" and ckpt_lib.checkpoint_exists(
            c["out_dir"], ckpt_lib.LAST
        )
        hf_params = None
        if resuming:
            # meta-only read: the full (sharded) restore happens below once
            # the state skeleton exists — a target=None restore here
            # materialized the whole params+optimizer tree just for meta
            meta = ckpt_lib.load_meta(c["out_dir"], ckpt_lib.LAST)
            # architecture comes from the checkpoint (ref: train.py:181-185)
            model_args.update({k: meta["model_args"][k] for k in ARCH_KEYS})
            for k in OPT_ARCH_KEYS:  # only present on MoE/GQA checkpoints
                if k in meta["model_args"]:
                    model_args[k] = meta["model_args"][k]
        elif c["init_from"] == "resume":
            hint = ""
            if os.path.exists(os.path.join(c["out_dir"], "ckpt.pt")):
                hint = (" — found a reference ckpt.pt there; to fine-tune "
                        "from it pass --init_from="
                        f"{os.path.join(c['out_dir'], 'ckpt.pt')}")
            elif ckpt_lib.checkpoint_exists(c["out_dir"], ckpt_lib.BEST):
                hint = (" — only a best-val checkpoint exists (e.g. from "
                        "cli.convert_ckpt from-torch, which carries no "
                        "optimizer state); resume needs last_iter_ckpt, "
                        "fine-tune inits go via --init_from=<path>.pt")
            raise FileNotFoundError(
                f"init_from=resume but no checkpoint in {c['out_dir']}{hint}"
            )
        elif c["init_from"].startswith("gpt2"):
            # HF GPT-2 weight import (ref: train.py:196-203)
            from ai_music_generation_tpu.models.hf_import import from_pretrained

            hf_config, hf_params = from_pretrained(c["init_from"], c["dropout"])
            model_args.update(
                n_layer=hf_config.n_layer, n_head=hf_config.n_head,
                n_embd=hf_config.n_embd, block_size=hf_config.block_size,
                bias=hf_config.bias, vocab_size=hf_config.vocab_size,
            )
        elif c["init_from"].endswith(".pt"):
            # fine-tune init from a reference nanoGPT ckpt.pt (format: ref
            # train.py:316-329): weights + architecture come from the torch
            # checkpoint, optimizer/iter start fresh — the migration analog
            # of the reference's cross-dataset transfer runs
            # (ref config/bach_from_irishman_512_context.py:5)
            from ai_music_generation_tpu.models.nanogpt_ckpt import (
                load_reference_ckpt)

            t_config, hf_params, t_meta = load_reference_ckpt(
                c["init_from"], dropout=c["dropout"])
            model_args.update({k: t_meta["model_args"][k] for k in ARCH_KEYS})
            print(f"initializing from reference checkpoint {c['init_from']} "
                  f"(trained to iter {t_meta['iter_num']})")

        dtype = jnp.bfloat16 if c["dtype"] == "bfloat16" else jnp.float32
        self.model_args = model_args
        self.gpt_config = GPTConfig(dropout=c["dropout"], dtype=dtype, **model_args)
        self.model = GPT(self.gpt_config)

        self.schedule = (
            cosine_warmup_schedule(
                c["learning_rate"], c["warmup_iters"], c["lr_decay_iters"], c["min_lr"]
            )
            if c["decay_lr"]
            else (lambda it: c["learning_rate"])
        )
        self.tx = make_optimizer(
            self.schedule, c["weight_decay"], c["beta1"], c["beta2"], c["grad_clip"]
        )

        if hf_params is not None:
            params = hf_params
        else:
            dummy = jnp.zeros((1, model_args["block_size"]), jnp.int32)
            params = jax.jit(self.model.init)(jax.random.PRNGKey(c["seed"]), dummy)
        state = TrainState.create(params, self.tx)

        # shard: params per TP rules (+ ZeRO-3 over the data axis when
        # --fsdp), opt-state moments inherit param layout by path suffix
        fsdp = bool(c["fsdp"])
        self.state_shardings = TrainState(
            params=pmesh.shardings_for_tree(self.mesh, params, fsdp=fsdp),
            opt_state=pmesh.shardings_for_tree(
                self.mesh, state.opt_state, fsdp=fsdp),
            step=pmesh.replicated(self.mesh),
        )
        if resuming:
            # Abstract cross-topology restore: the checkpoint may have been
            # written from ANY mesh shape; explicit shardings put every leaf
            # straight into THIS mesh's layout (no sharding-from-file
            # fallback, no double materialization of the fresh-init state).
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
            restored, meta = ckpt_lib.load_checkpoint(
                c["out_dir"], ckpt_lib.LAST,
                target=_as_tree(abstract),
                shardings=_as_tree(self.state_shardings),
            )
            self.state = TrainState(**restored)
            self.iter_num = meta["iter_num"]
            self.best_val_loss = meta["best_val_loss"]
        else:
            self.state = jax.device_put(state, self.state_shardings)

        self.n_params = num_params(self.state.params)
        print(f"number of parameters: {self.n_params/1e6:.2f}M")

    def _build_steps(self):
        batch_sh = pmesh.batch_sharding(self.mesh)
        accum_batch_sh = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, pmesh.DATA_AXIS)
        )
        self._batch_sh = batch_sh
        self._accum_batch_sh = accum_batch_sh
        state_sh = self.state_shardings
        self._train_step = jax.jit(
            make_train_step(self.model, self.tx, self.schedule),
            in_shardings=(state_sh, accum_batch_sh, accum_batch_sh, None),
            out_shardings=(state_sh, None),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            make_eval_step(self.model),
            in_shardings=(state_sh.params, batch_sh, batch_sh),
        )

    # -- data --------------------------------------------------------------
    def get_batch(self, split: str, it: int, for_accum: bool = True):
        """Globally-sharded (x, y) for one optimizer iteration.

        Each host gathers only the batch rows its devices own (disjoint
        slices by construction), replacing the reference's seed-offset
        per-rank draws (ref: nanoGPT/train.py:95-99).
        """
        c = self.c
        ds = self.train_data if split == "train" else self.val_data
        # distinct seed stream per split (replaces ref's shared torch RNG)
        seed = c["seed"] + (0 if split == "train" else 101)
        if for_accum:
            shape = (self.grad_accum, self.micro_batch)
            sharding = self._accum_batch_sh
        else:
            shape = (self.micro_batch,)
            sharding = self._batch_sh
        return ds.sharded_sample(seed, it, shape, c["block_size"], sharding)

    # -- eval ---------------------------------------------------------------
    def estimate_loss(self) -> dict[str, float]:
        """Mean loss over eval_iters batches per split (ref: train.py:231-244)."""
        out = {}
        params = self.state.params
        for split in ("train", "val"):
            losses = []
            for k in range(self.c["eval_iters"]):
                x, y = self.get_batch(split, 10_000_000 + self.iter_num + k, for_accum=False)
                losses.append(self._eval_step(params, x, y))
            out[split] = float(np.mean(jax.device_get(losses)))
        return out

    # -- checkpoint ----------------------------------------------------------
    def _save(self, name: str):
        from ai_music_generation_tpu.utils.configurator import config_snapshot

        ckpt_lib.save_checkpoint(
            self.c["out_dir"], name, _as_tree(self.state),
            self.model_args, self.iter_num, self.best_val_loss,
            config_snapshot(self.c),
        )

    # -- main loop ------------------------------------------------------------
    def run(self) -> float:
        c = self.c
        losses_path = os.path.join(c["out_dir"], "losses.jsonl")
        rng = jax.random.PRNGKey(c["seed"])
        running_mfu = -1.0
        local_iter = 0  # iterations THIS process (compile pollutes early dts)
        t0 = time.time()

        if c["wandb_log"]:
            try:
                import wandb

                wandb.init(project=c["wandb_project"], name=c["wandb_run_name"], config=c)
            except ImportError:
                print("wandb not available; skipping wandb logging")
                c["wandb_log"] = False

        while True:
            if self.iter_num % c["eval_interval"] == 0:
                losses = self.estimate_loss()
                print(
                    f"step {self.iter_num}: train loss {losses['train']:.4f}, "
                    f"val loss {losses['val']:.4f}"
                )
                rec = {
                    "iter": self.iter_num,
                    "train/loss": losses["train"],
                    "val/loss": losses["val"],
                    "lr": float(self.schedule(self.iter_num)),
                    "mfu": running_mfu * 100,
                }
                with open(losses_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if c["wandb_log"]:
                    import wandb

                    wandb.log(rec)
                if losses["val"] < self.best_val_loss or c["always_save_checkpoint"]:
                    self.best_val_loss = min(self.best_val_loss, losses["val"])
                    if self.iter_num > 0:
                        self._save(ckpt_lib.BEST)
                if self.iter_num > 0:
                    self._save(ckpt_lib.LAST)
            if self.iter_num == 0 and c["eval_only"]:
                break

            x, y = self.get_batch("train", self.iter_num)
            step_rng = jax.random.fold_in(rng, self.iter_num)
            self.state, metrics = self._train_step(self.state, x, y, step_rng)

            if self.iter_num % c["log_interval"] == 0:
                # float() syncs every step dispatched since the last log, so
                # amortize dt over the whole window for honest per-iter time
                loss = float(metrics["loss"])
                window = max(1, c["log_interval"]) if self.iter_num > 0 else 1
                dt = (time.time() - t0) / window
                if local_iter >= 5:  # skip compile-polluted early windows (ref :363-369)
                    mfu = estimate_mfu(
                        self.gpt_config, self.n_params,
                        self.micro_batch * self.grad_accum, dt,
                    )
                    running_mfu = mfu if running_mfu == -1.0 else 0.9 * running_mfu + 0.1 * mfu
                print(
                    f"iter {self.iter_num}: loss {loss:.4f}, time {dt*1000:.2f}ms, "
                    f"mfu {running_mfu*100:.2f}%"
                )
                t0 = time.time()

            self.iter_num += 1
            local_iter += 1
            if self.iter_num > c["max_iters"]:
                break
        return self.best_val_loss


def _as_tree(state: TrainState):
    """TrainState -> plain dict pytree (orbax- and jit-friendly)."""
    if isinstance(state, TrainState):
        return {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    return state
