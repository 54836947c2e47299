"""Probe: can an int4 KV cache move the decode bandwidth roofline?

The production decode step (bench.py config: 6L/6H/384d, batch 4096,
S=256 ring cache, GPTConfig.kv_quantized int8) is AT the int8 cache-read
roofline: ~4.8 GB of K/V bytes per step -> ~6 ms at the v5e's ~800 GB/s,
measured 9.05 ms/step whole-step device time. Halving the cache bytes is
the only lever that moves that floor. This script trace-times a stripped
decode-attention loop (6 layer-reads per step, loop-carried caches so
converts cannot be hoisted) for these storage schemes:

  int8     k/v int8 [B,S,H,D]          (the production layout, baseline)
  int4     k/v jnp.int4 [B,S,H,D]      (native s4: packed by XLA:TPU?)
  packed   k/v int8 [B,S,H,D//2], two s4 nibbles per byte, single
           einsum over the concat-unpacked operand (does the
           shift+concat fuse into the dot read, or materialize?)

Layout lesson baked in (round 4, spec kernel): NO reshape of a
loop-carried buffer anywhere - the compiler materializes such "views"
as full-cache copies (the first version of this probe stored [B,S,HD]
flat and reshaped per layer: int8 measured 10.5 ms/layer-read, 7x the
production path, all of it reshape copies).

Each variant reports the device-side "XLA Modules" ms/step via the
jax.profiler trace (wall clock through the axon relay is not a
barrier - see verify skill). The host never transfers an s4 array
(axon relay bug: recursive-jit error on S4 host args); all caches are
created on device inside jit.

MEASURED (v5e via axon, 2026-08-19): the scan-carried caches contaminate
the comparison — jit_run device times swung 281-1014 ms/call BETWEEN SALTS
for the same variant (double-buffer copies of the 4.8 GB carried caches
dominate and vary with scheduling), so this probe is NOT usable for the
dtype comparison. int4_probe2.py (read-only caches, no scan) is the
authoritative read-cost measurement.

Run: python docs/experiments/int4_probe.py  (env: B, STEPS, VARIANTS)
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
STEPS = int(os.environ.get("STEPS", 16))


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


def make_step(scheme):
    sm = 1.0 / math.sqrt(D)

    if scheme == "int8":
        store_shape, store_dtype = (B, S, H, D), jnp.int8

        def quant(x):  # [B, 1, H, D] bf16 -> storage
            return jnp.clip(jnp.round(x.astype(jnp.float32)), -127,
                            127).astype(jnp.int8)

        def attend(q4, ck, cv, ks, vs):
            # production cached_att shape: "bthd,bshd->bhts" at T=1
            att = jnp.einsum("bthd,bshd->bhts", q4,
                             ck.astype(jnp.bfloat16)) * jnp.bfloat16(sm)
            att = att * ks[:, :, None, :]
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(jnp.bfloat16)
            att = att * vs[:, :, None, :]
            return jnp.einsum("bhts,bshd->bthd", att,
                              cv.astype(jnp.bfloat16))

    elif scheme == "int4":
        store_shape, store_dtype = (B, S, H, D), jnp.int4

        def quant(x):
            return jnp.clip(jnp.round(x.astype(jnp.float32)), -7,
                            7).astype(jnp.int4)

        def attend(q4, ck, cv, ks, vs):
            att = jnp.einsum("bthd,bshd->bhts", q4,
                             ck.astype(jnp.bfloat16)) * jnp.bfloat16(sm)
            att = att * ks[:, :, None, :]
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(jnp.bfloat16)
            att = att * vs[:, :, None, :]
            return jnp.einsum("bhts,bshd->bthd", att,
                              cv.astype(jnp.bfloat16))

    elif scheme == "packed":
        store_shape, store_dtype = (B, S, H, D // 2), jnp.int8

        def quant(x):  # [B, 1, H, D] -> [B, 1, H, D//2] nibble-packed
            q = jnp.clip(jnp.round(x.astype(jnp.float32)), -7,
                         7).astype(jnp.int8)
            lo = q[..., :D // 2] & jnp.int8(0xF)
            hi = jax.lax.shift_left(q[..., D // 2:], jnp.int8(4))
            return lo | hi

        def unpack(x):  # [B, S, H, D//2] int8 -> [B, S, H, D] bf16
            lo = jax.lax.shift_right_arithmetic(
                jax.lax.shift_left(x, jnp.int8(4)), jnp.int8(4))
            hi = jax.lax.shift_right_arithmetic(x, jnp.int8(4))
            return jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)

        def attend(q4, ck, cv, ks, vs):
            att = jnp.einsum("bthd,bshd->bhts", q4,
                             unpack(ck)) * jnp.bfloat16(sm)
            att = att * ks[:, :, None, :]
            att = jax.nn.softmax(att.astype(jnp.float32),
                                 axis=-1).astype(jnp.bfloat16)
            att = att * vs[:, :, None, :]
            return jnp.einsum("bhts,bshd->bthd", att, unpack(cv))

    else:
        raise ValueError(scheme)

    @jax.jit
    def run(q0):
        caches = [(jnp.zeros(store_shape, store_dtype),
                   jnp.zeros(store_shape, store_dtype),
                   jnp.full((B, H, S), 0.01, jnp.bfloat16),
                   jnp.full((B, H, S), 0.01, jnp.bfloat16))
                  for _ in range(L)]

        def step(carry, i):
            q, caches = carry  # q [B, H, D] bf16
            new_caches = []
            for (ck, cv, ks, vs) in caches:
                o = attend(q[:, None], ck, cv, ks, vs)[:, 0]
                q = q + o * jnp.bfloat16(1e-3)
                # write one fresh row so the cache is genuinely
                # loop-carried (no convert hoisting); static index 0
                row = quant(q[:, None] * 8)
                ck = jax.lax.dynamic_update_slice(ck, row, (0, 0, 0, 0))
                cv = jax.lax.dynamic_update_slice(cv, row, (0, 0, 0, 0))
                new_caches.append((ck, cv, ks, vs))
            return (q, new_caches), ()

        (q, caches), _ = jax.lax.scan(step, (q0, caches), jnp.arange(STEPS))
        return jnp.sum(q.astype(jnp.float32))

    return run


def main():
    print("devices:", jax.devices(), flush=True)
    salt = int(time.time())
    variants = os.environ.get("VARIANTS", "int8,packed,int4").split(",")
    for scheme in variants:
        try:
            run = make_step(scheme)
            q0 = jax.random.normal(
                jax.random.PRNGKey(salt), (B, H, D)).astype(jnp.bfloat16)
            t0 = time.time()
            out = float(run(q0))
            print(f"{scheme}: compiled+ran in {time.time()-t0:.0f}s "
                  f"(out={out:.1f})", flush=True)
            root = f"/tmp/int4probe_{scheme}_{salt}"
            with jax.profiler.trace(root):
                for i in range(3):
                    q0 = q0 + jnp.bfloat16(i + 1)
                    out = float(run(q0))
            mods = device_ms_per_module(root)
            for n, (ms, cnt) in sorted(mods.items(),
                                       key=lambda kv: -kv[1][0]):
                if ms > 0.5:
                    print(f"  {scheme} module {n.split('(')[0]}: "
                          f"{ms:.1f} ms/call x{cnt} -> "
                          f"{ms / STEPS:.3f} ms/step "
                          f"({ms / STEPS / L:.3f} ms/layer-read)",
                          flush=True)
        except Exception as e:
            print(f"{scheme}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    print("DONE", flush=True)


main()
