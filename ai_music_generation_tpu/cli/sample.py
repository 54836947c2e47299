"""Sampling CLI, flag-compatible with the reference sampler (ref: nanoGPT/sample.py).

Parity surface:
- flags: out_dir, init_from, start (incl. ``FILE:`` prefix), num_samples,
  max_new_tokens, temperature, top_k, seed, use_validation_prefixes, dataset,
  tokens_format (char|midi), validation_path, n_conditional_measures
  (+ framework extensions beyond the reference: ``top_p`` nucleus sampling,
  ``speculative``/``n_draft``, ``kv_quantized``, ``batch_size``, ``window``
  decode-cache sizing)
- meta.pkl encode/decode: char join vs whitespace join (ref :76-100)
- prompt modes (ref :103-142):
  * fixed ``start`` prompt × num_samples
  * midi-text: ``start + " " + first n bars ("|"-split) + " |"`` per
    validation ``.txt`` file
  * irishman char: regex split on ``(:\\||::|\\s\\||\\|\\])`` taking 2n pieces
- output normalization + naming (ref :154-169): ``samples/sample_<id>.abc``
  with ``X:<id>`` header for irishman char; ``samples/sample_<id>.txt`` with
  trailing-bar fix for midi-text

TPU-native difference: prompts are decoded in BATCHES through the jitted
KV-cache generator (decode/generate.py) instead of one sequence at a time —
the whole 1,000-sample eval protocol runs as ~num_samples/batch_size compiled
decode calls. Fixed-seed determinism contract: same ``--seed`` AND same
``--batch_size`` -> byte-identical outputs (each batch decodes with
``seed + batch_offset``; regrouping the batches regroups the RNG streams,
so batch_size is part of the reproducibility key — sha goldens in
tests/test_golden_generation.py pin this).
"""

from __future__ import annotations

import json
import os
import re
import sys
from typing import Iterable, Optional

import numpy as np

from ai_music_generation_tpu.data.memmap import load_meta
from ai_music_generation_tpu.models.gpt import GPT, GPTConfig
from ai_music_generation_tpu.train import checkpoint as ckpt_lib
from ai_music_generation_tpu.utils.configurator import apply_overrides

DEFAULTS = dict(
    use_validation_prefixes=True,
    dataset="bach",
    tokens_format="midi",  # 'char' | 'midi' (midi => whitespace tokens)
    validation_path="",
    n_conditional_measures=4,
    out_dir="out",
    init_from="resume",
    start="$",
    num_samples=1000,
    max_new_tokens=500,
    temperature=0.8,
    top_k=200,
    top_p=1.0,  # nucleus sampling; 1.0 = off (framework extension, no ref analogue)
    seed=1337,
    data_root="data",
    batch_size=64,  # TPU-native: batched decode width
    dtype="bfloat16",
    kv_quantized=False,  # int8 KV cache (halves decode HBM traffic)
    flat_kv=False,  # Pallas flat-cache decode kernel (fastest for GQA
    # checkpoints — 840.8k vs 148k tok/s at bench scale; docs/PERF.md)
    speculative=False,  # prompt-lookup speculative decoding (decode/speculative.py)
    n_draft=4,  # draft chain length when speculative=True
    window=0,  # decode KV-cache window; 0 = block_size (parity). Smaller
    # windows trade guaranteed context (>= window/2 committed tokens) for
    # per-step cache-read bandwidth — measured contract in docs/PERF.md
    # "Decode-window contract"
)

IRISHMAN_BAR_REGEX = re.compile(r"(:\||::|\s\||\|\])")


def load_model(out_dir: str, dtype: str = "bfloat16", init_from: str = "resume",
               kv_quantized: bool = False, flat_kv: bool = False):
    """Load the best checkpoint (or a HF GPT-2, ref sample.py:55-71).

    ``flat_kv`` is a runtime decode-layout knob (no weight change): carry
    the decode KV cache flat and run T=1 steps through the Pallas GQA
    kernel (ops/gqa_decode.py) — the fastest measured decode for GQA
    checkpoints (docs/PERF.md "Grouped-query attention"); requires
    n_kv_head*head_dim % 128 == 0.
    """
    import dataclasses

    import jax.numpy as jnp

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if init_from.startswith("gpt2"):
        from ai_music_generation_tpu.models.hf_import import from_pretrained

        config, params = from_pretrained(init_from)
        config = dataclasses.replace(config, dtype=jdtype, flat_kv=flat_kv)
        return GPT(config), params, {"model_args": {}, "config": {}}
    torch_ckpt = os.path.join(out_dir, "ckpt.pt")
    if not ckpt_lib.checkpoint_exists(out_dir, ckpt_lib.BEST) and os.path.exists(torch_ckpt):
        # a reference nanoGPT out_dir: auto-import ckpt.pt in memory so a
        # migrating user can point --out_dir at it unchanged
        # (format: ref nanoGPT/train.py:316-329)
        from ai_music_generation_tpu.models.nanogpt_ckpt import load_reference_ckpt

        print(f"no orbax checkpoint in {out_dir}; importing {torch_ckpt}")
        config, params, meta = load_reference_ckpt(
            torch_ckpt, dtype=jdtype, kv_quantized=kv_quantized)
        if flat_kv:
            config = dataclasses.replace(config, flat_kv=True)
        return GPT(config), params, meta
    state, meta = ckpt_lib.load_checkpoint(out_dir, ckpt_lib.BEST)
    config = GPTConfig(dropout=0.0, dtype=jdtype, kv_quantized=kv_quantized,
                       flat_kv=flat_kv, **meta["model_args"])
    model = GPT(config)
    params = state["params"]
    return model, params, meta


def build_codec(meta_ckpt: dict, data_root: str, tokens_format: str):
    """encode/decode closures from the dataset meta.pkl (ref: sample.py:76-100)."""
    dataset = meta_ckpt.get("config", {}).get("dataset")
    meta = load_meta(os.path.join(data_root, dataset, "meta.pkl")) if dataset else None
    if meta is None:
        raise FileNotFoundError(
            f"meta.pkl not found for dataset {dataset!r} under {data_root!r}"
        )
    stoi, itos = meta["stoi"], meta["itos"]
    # vectorized decode: a numpy lookup table + C-level join. Per-token
    # Python dict lookups dominated protocol-scale sampling (measured: the
    # 4096x500 real-path run was host-bound at 32k tok/s before this).
    lut = np.array([itos[i] for i in range(len(itos))], dtype=object)
    joiner = "" if tokens_format == "char" else " "
    decode = lambda l: joiner.join(lut[np.asarray(l, np.int64)].tolist())
    if tokens_format == "char":
        encode = lambda s: [stoi[c] for c in s]
    else:
        encode = lambda s: [stoi[c] for c in s.split()]
    return encode, decode


def prompt_iter(c: dict) -> Iterable[tuple[object, str]]:
    """(id, prompt) pairs per the reference's three modes (ref: sample.py:103-142)."""
    start = c["start"]
    if start.startswith("FILE:"):
        with open(start[5:], encoding="utf-8") as f:
            start = f.read()

    if not c["use_validation_prefixes"]:
        return ((i, start) for i in range(c["num_samples"]))

    if not c["validation_path"]:
        raise ValueError("use_validation_prefixes is True but validation_path not set")

    if c["tokens_format"] == "midi":
        pairs = []
        for fname in sorted(os.listdir(c["validation_path"])):
            if fname.endswith(".txt"):
                with open(os.path.join(c["validation_path"], fname)) as f:
                    text = f.read()
                prefix = (
                    start + " "
                    + "|".join(text.split("|")[: c["n_conditional_measures"]]).strip()
                    + " |"
                )
                pairs.append((fname[:-4], prefix))
        return iter(pairs)

    if c["dataset"] == "irishman" and c["tokens_format"] == "char":
        with open(c["validation_path"]) as f:
            leadsheets = json.load(f)
        pairs = []
        for sheet in leadsheets:
            pieces = IRISHMAN_BAR_REGEX.split(sheet.get("abc notation"))
            pairs.append(
                (sheet.get("id"),
                 start + "".join(pieces[: c["n_conditional_measures"] * 2]))
            )
        return iter(pairs)

    raise NotImplementedError(
        f"prompt mode dataset={c['dataset']} tokens_format={c['tokens_format']}"
    )


def normalize_output(res: str, sample_id, dataset: str, tokens_format: str) -> tuple[str, str]:
    """(filename, normalized text) per ref: sample.py:154-169."""
    if tokens_format == "char" and dataset == "irishman":
        return f"sample_{sample_id}.abc", f"X:{sample_id}\n" + res.split("$")[1].strip()
    normalized = res.split("$")[1].strip()
    if not normalized.endswith("|"):
        # ref quirk reproduced exactly (sample.py:166-167): the fallback
        # rebuilds from the UNSTRIPPED `res`, reintroducing the '$ ' prompt
        # marker for mid-bar-truncated samples; byte parity wins here.
        normalized = "|".join(res.split("|")[:-1]).strip() + " |"
    return f"sample_{sample_id}.txt", normalized


def run_sampling(c: dict, write: bool = True) -> list[tuple[object, str]]:
    """Batched generation over all prompts; returns [(id, normalized_text)]."""
    import jax

    from ai_music_generation_tpu.decode.generate import Generator

    model, params, ckpt_meta = load_model(
        c["out_dir"], c["dtype"], c["init_from"],
        c.get("kv_quantized", False), c.get("flat_kv", False)
    )
    if c["init_from"].startswith("gpt2"):
        # GPT-2 BPE fallback (ref: sample.py:96-100)
        import tiktoken

        enc = tiktoken.get_encoding("gpt2")
        encode = lambda s: enc.encode(s, allowed_special={"<|endoftext|>"})
        decode = lambda l: enc.decode(list(map(int, l)))
    else:
        encode, decode = build_codec(ckpt_meta, c["data_root"], c["tokens_format"])
    prompts = list(prompt_iter(c))

    if c.get("speculative"):
        # Same temp/top-k output DISTRIBUTION as the plain Generator
        # (exact rejection sampling, decode/speculative.py), but a different
        # token stream at a given seed: the RNG advances per verify step,
        # not per position — so --speculative is part of the byte-level
        # reproducibility key alongside --seed/--batch_size.
        from ai_music_generation_tpu.decode.speculative import SpecGenerator

        gen = SpecGenerator(
            model,
            max_new_tokens=c["max_new_tokens"],
            temperature=c["temperature"],
            top_k=c["top_k"],
            n_draft=c["n_draft"],
            top_p=None if c["top_p"] >= 1.0 else c["top_p"],
        )
    else:
        gen = Generator(
            model,
            max_new_tokens=c["max_new_tokens"],
            temperature=c["temperature"],
            top_k=c["top_k"],
            top_p=None if c["top_p"] >= 1.0 else c["top_p"],
            window=c["window"] or None,
        )

    out_dir = os.path.join(c["out_dir"], "samples")
    if write:
        os.makedirs(out_dir, exist_ok=True)

    results = []
    B = c["batch_size"]
    for lo in range(0, len(prompts), B):
        chunk = prompts[lo : lo + B]
        ids = [encode(p) for _, p in chunk]
        # crop over-long prompts from the left (keep most recent context)
        bs = model.config.block_size
        ids = [i[-bs + 1 :] if len(i) >= bs else i for i in ids]
        maxlen = max(len(i) for i in ids)
        padded = np.zeros((len(ids), maxlen), np.int32)
        lens = np.zeros((len(ids),), np.int32)
        for j, seq in enumerate(ids):
            padded[j, : len(seq)] = seq
            lens[j] = len(seq)
        # deterministic per-batch seed stream: fixed seed + fixed flags
        # (incl. batch_size) => byte-identical outputs across runs
        tokens = jax.device_get(gen.generate(params, padded, lens, seed=c["seed"] + lo))
        for j, (sample_id, _prompt) in enumerate(chunk):
            seq = tokens[j, : lens[j] + c["max_new_tokens"]]
            res = decode(seq)
            fname, text = normalize_output(
                res, sample_id, c["dataset"], c["tokens_format"]
            )
            results.append((sample_id, text))
            if write:
                with open(os.path.join(out_dir, fname), "w") as f:
                    f.write(text)
    return results


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    c = apply_overrides(dict(DEFAULTS), argv)
    results = run_sampling(c)
    print(f"wrote {len(results)} samples to {os.path.join(c['out_dir'], 'samples')}")
    return results


if __name__ == "__main__":
    main()
