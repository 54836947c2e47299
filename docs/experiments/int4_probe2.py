"""Probe 2: isolate pure cache-read cost per dtype (no scan, no DUS).

int4_probe.py's scan carries 4.8 GB of caches per step — double-buffer
copies and sub-byte DUS costs contaminate the comparison. Here each
variant jits ONE function that does 6 production-shaped attention reads
over device-resident caches (built on device by a separate jit — s4
never crosses the host boundary) plus a raw `sum` pass that measures the
best-achievable read bandwidth for each storage dtype.

Questions answered:
  - is XLA:TPU s4 stored packed (sum of s4 buffer ~2x faster than s8)?
  - does the s4->bf16 convert fused into the einsum read at full rate?
  - does the nibble-unpack concat fuse or materialize?

MEASURED (v5e via axon, 2026-08-19, traces /tmp/int4p2_*_1787119286):

  attn-int8    10.23 ms/call  (6 layer-reads, 4.8 GB -> 472 GB/s w/ compute)
  attn-int4    FAILED         (s4 array across the jit boundary: axon relay
                               device_put recursion — consistent w/ round 3)
  attn-packed  23.12 ms/call  (2.3x WORSE than int8 despite half the bytes:
                               XLA materializes the shift+concat unpack as a
                               full [B,S,H,D] bf16 intermediate)
  sum-int8      6.40 ms/call  (4.8 GB -> 756 GB/s, the HBM read roofline)
  sum-int4     FAILED         (same relay limitation)
  sum-packed    3.20 ms/call  (2.4 GB -> 756 GB/s: nibble-PACKED int8
                               storage READS at full rate)

Conclusion: the bytes win is real (sum-packed) but XLA cannot keep the
unpack in registers — an int4 cache only pays through a Pallas kernel that
unpacks nibbles in VMEM between the DMA and the dot
(docs/experiments/int4_kernel_probe.py, ops/ring_decode_attention.py).

Run: python docs/experiments/int4_probe2.py
"""

import collections
import glob
import gzip
import json
import math
import os
import sys
import time

sys.path.insert(0, os.environ.get("SPEC_REPO", "/root/repo"))

import jax
import jax.numpy as jnp

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 256))
H = 6
D = 64
L = 6


def device_ms_per_module(trace_root):
    path = sorted(
        glob.glob(f"{trace_root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pidmap, tidmap = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidmap[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidmap[(e["pid"], e["tid"])] = e["args"]["name"]
    tpu = [p for p, n in pidmap.items() if "TPU" in n]
    if not tpu:
        return {}
    mod_tid = [t_ for (p, t_), n in tidmap.items()
               if p == tpu[0] and n == "XLA Modules"]
    out = collections.defaultdict(list)
    for e in ev:
        if (e.get("pid") == tpu[0] and e.get("tid") == mod_tid[0]
                and e.get("ph") == "X"):
            out[e["name"]].append(e["dur"] / 1000.0)
    return {n: (sum(d) / len(d), len(d)) for n, d in out.items()}


def report(label, root, nbytes_read):
    mods = device_ms_per_module(root)
    for n, (ms, cnt) in sorted(mods.items(), key=lambda kv: -kv[1][0])[:1]:
        bw = nbytes_read / (ms / 1000.0) / 1e9
        print(f"  {label}: {ms:.2f} ms/call x{cnt} "
              f"({bw:.0f} GB/s over {nbytes_read/1e6:.0f} MB)", flush=True)


def unpack_nib(x):  # [..., D//2] int8 -> [..., D] bf16
    lo = jax.lax.shift_right_arithmetic(
        jax.lax.shift_left(x, jnp.int8(4)), jnp.int8(4))
    hi = jax.lax.shift_right_arithmetic(x, jnp.int8(4))
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)


def main():
    print("devices:", jax.devices(), flush=True)
    salt = int(time.time())
    sm = 1.0 / math.sqrt(D)

    @jax.jit
    def build():
        # direct int8 generation keeps the intermediate at 2.4 GB (an int32
        # base of this shape is 19 GB and OOMs the 16 GB HBM)
        c8 = jax.random.randint(
            jax.random.PRNGKey(salt), (L, 2, B, S, H, D), -7, 8, jnp.int8)
        c4 = c8.astype(jnp.int4)
        lo = c8[..., :D // 2] & jnp.int8(0xF)
        hi = jax.lax.shift_left(c8[..., D // 2:], jnp.int8(4))
        cp = lo | hi
        return c8, c4, cp

    c8, c4, cp = build()
    c8.block_until_ready()
    print("caches built", flush=True)

    def attend(q4, ck, cv, unpack):
        att = jnp.einsum("bthd,bshd->bhts", q4, unpack(ck)) * jnp.bfloat16(sm)
        att = jax.nn.softmax(att.astype(jnp.float32),
                             axis=-1).astype(jnp.bfloat16)
        return jnp.einsum("bhts,bshd->bthd", att, unpack(cv))

    def six_layers(q, caches, unpack):
        for l in range(L):
            o = attend(q[:, None], caches[l, 0], caches[l, 1], unpack)[:, 0]
            q = q + o * jnp.bfloat16(1e-3)
        return jnp.sum(q.astype(jnp.float32))

    as_bf16 = lambda x: x.astype(jnp.bfloat16)

    step8 = jax.jit(lambda q, c: six_layers(q, c, as_bf16))
    step4 = jax.jit(lambda q, c: six_layers(q, c, as_bf16))
    stepp = jax.jit(lambda q, c: six_layers(q, c, unpack_nib))
    # t varies per call: identical program+input replays hit the relay
    # result cache and report bogus times (verify skill)
    sum8 = jax.jit(lambda c, t: jnp.sum(c.astype(jnp.int32)) * t)
    sum4 = jax.jit(lambda c, t: jnp.sum(c.astype(jnp.int32)) * t)
    sump = jax.jit(lambda c, t: jnp.sum(c.astype(jnp.int32)) * t)

    bytes8 = L * 2 * B * S * H * D          # 1 byte/elem
    bytes4 = bytes8 // 2                     # if truly bit-packed
    cases = [
        ("attn-int8", step8, c8, bytes8),
        ("attn-int4", step4, c4, bytes4),
        ("attn-packed", stepp, cp, bytes4),
        ("sum-int8", sum8, c8, bytes8),
        ("sum-int4", sum4, c4, bytes4),
        ("sum-packed", sump, cp, bytes4),
    ]
    for label, fn, cache, nbytes in cases:
        try:
            if label.startswith("attn"):
                q0 = jax.random.normal(jax.random.PRNGKey(salt + 1),
                                       (B, H, D)).astype(jnp.bfloat16)
                out = float(fn(q0, cache))  # compile
                root = f"/tmp/int4p2_{label}_{salt}"
                with jax.profiler.trace(root):
                    for i in range(3):
                        q0 = q0 + jnp.bfloat16(i + 1)
                        out = float(fn(q0, cache))
            else:
                out = float(fn(cache, 1))
                root = f"/tmp/int4p2_{label}_{salt}"
                with jax.profiler.trace(root):
                    for i in range(3):
                        out = float(fn(cache, i + 2))
            report(label, root, nbytes)
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)
    print("DONE", flush=True)


main()
