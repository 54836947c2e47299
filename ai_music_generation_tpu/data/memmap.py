"""Memmap token datasets + batch sampling.

Replaces the reference's "poor man's data loader" (ref: nanoGPT/train.py:122-144):
uint16 (or uint32 for large-vocab whitespace datasets, ref :126-134) token
bins sampled at random offsets. Differences:

- The token dtype is recorded in ``meta.pkl`` (key ``bin_dtype``) instead of
  being keyed off the out_dir name (ref hack at train.py:126).
- Batches are drawn for a whole optimizer iteration at once
  ([grad_accum, micro_batch, T]) so the jitted train step can scan over
  micro-batches on device with zero host round-trips in between.
- Sampling is a deterministic function of (seed, iter) — resume-stable,
  unlike the reference's global-RNG draws.
"""

from __future__ import annotations

import os
import pickle
from typing import Optional

import numpy as np


class BinDataset:
    """Random-offset sampler over a flat token bin file."""

    def __init__(self, path: str, dtype: Optional[np.dtype] = None):
        if dtype is None:
            meta = load_meta(os.path.join(os.path.dirname(path), "meta.pkl"))
            dtype = np.dtype(meta["bin_dtype"]) if meta and "bin_dtype" in meta else np.uint16
        self.path = path
        self.dtype = np.dtype(dtype)
        # re-open the memmap per batch to avoid paging the whole file into
        # resident memory over a long run (same rationale as the reference's
        # np.memmap-per-call, ref: nanoGPT/train.py:122-125)
        self._len = os.path.getsize(path) // self.dtype.itemsize

    def __len__(self) -> int:
        return self._len

    def global_indices(self, seed: int, it: int, n: int, block_size: int) -> np.ndarray:
        """Deterministic global batch offsets for (seed, it) — identical on
        every host, so per-host slices of it are disjoint by construction."""
        rng = np.random.default_rng(np.random.SeedSequence([seed, it]))
        # high is EXCLUSIVE: valid window starts are 0..len-block-1
        # inclusive (y = data[i+1 : i+1+block] must fit), matching the
        # reference's torch.randint(len - block_size) — the extra -1
        # made the bins' final tokens unreachable (review finding)
        return rng.integers(0, self._len - block_size, size=n)

    def gather(self, ix: np.ndarray, block_size: int):
        """Materialize (x, y) int32 windows for the given flat offsets."""
        data = np.memmap(self.path, dtype=self.dtype, mode="r")
        flat = np.asarray(ix).reshape(-1)
        x = np.stack([data[i : i + block_size] for i in flat]).astype(np.int32)
        y = np.stack([data[i + 1 : i + 1 + block_size] for i in flat]).astype(np.int32)
        shape = (*np.shape(ix), block_size)
        return x.reshape(shape), y.reshape(shape)

    def sample(self, seed: int, it: int, batch_shape: tuple[int, ...], block_size: int):
        """Sample (x, y) int32 arrays of shape [*batch_shape, block_size]."""
        n = int(np.prod(batch_shape))
        ix = self.global_indices(seed, it, n, block_size).reshape(batch_shape)
        return self.gather(ix, block_size)

    def sharded_sample(self, seed: int, it: int, batch_shape: tuple[int, ...],
                       block_size: int, sharding):
        """Sample directly into a globally-sharded jax.Array pair.

        Multi-host correct by construction (replaces the reference's
        seed-offset per-rank sampling, ref: nanoGPT/train.py:95-99): every
        host computes the same global offset grid, then gathers ONLY the rows
        its addressable devices own (``addressable_devices_indices_map``) —
        no replicated global batch, no host reads data it doesn't feed.
        """
        import jax

        global_shape = (*batch_shape, block_size)
        ix = self.global_indices(
            seed, it, int(np.prod(batch_shape)), block_size
        ).reshape(batch_shape)
        idx_map = sharding.addressable_devices_indices_map(global_shape)
        xs, ys = [], []
        cache: dict = {}  # model-axis replicas share one gather
        for dev, idx in idx_map.items():
            key = tuple((s.start, s.stop, s.step) for s in idx[:-1])
            if key not in cache:
                cache[key] = self.gather(ix[idx[:-1]], block_size)
            x, y = cache[key]
            xs.append(jax.device_put(x, dev))
            ys.append(jax.device_put(y, dev))
        make = jax.make_array_from_single_device_arrays
        return (
            make(global_shape, sharding, xs),
            make(global_shape, sharding, ys),
        )


def load_meta(meta_path: str) -> Optional[dict]:
    """Load the dataset meta.pkl (vocab, stoi/itos, tokens_format, bin_dtype)."""
    if not os.path.exists(meta_path):
        return None
    with open(meta_path, "rb") as f:
        return pickle.load(f)


def write_bin(tokens: np.ndarray, path: str, dtype=np.uint16) -> None:
    np.asarray(tokens, dtype=dtype).tofile(path)


def write_meta(meta: dict, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(meta, f)
