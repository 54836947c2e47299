"""Probe 3: a lean T=1 Pallas decode-attention kernel over int8/int4 caches.

int4_probe2.py established that nibble-PACKED int8 storage reads at the HBM
roofline (756 GB/s) but XLA materializes the unpack. This probe measures
whether a Pallas kernel specialized for T=1 decode can run near the packed
DMA floor (0.53 ms/layer at [4096, 256, 6, 64] vs the XLA int8 path's
~1.07), which would be a ~1.4x whole-step win for bench.py.

Kernel design (vs ops/spec_attention.py, which pads T to a sublane tile and
pays 8x MXU/VPU inflation at T=1):

- everything stays in [H, S] / [H, HD] orientation: scores =
  dot(q_masked [H, HD], k8 [S, HD]) -> [H, S], so the per-(position, head)
  scale rows (stored [B, H, S] like the spec cache) multiply DIRECTLY, the
  softmax is a natural lane-dim reduction, and PV is dot(p8 [H, S],
  v8 [S, HD]) -> [H, HD] folded to [1, HD] by a block-diagonal mask + ones
  dot. Zero transposes, zero Tp padding.
- int8 x int8 MXU dots throughout (q and probs quantized per head row in
  VMEM): the cache operands are never cast to bf16 — on this kernel the
  VPU budget is the nibble unpack ALONE.
- int4 storage packs POSITION halves, not lane halves: packed [B, S//2, HD]
  int8 with position s in the low nibble and s + S//2 in the high nibble.
  Lane dim stays HD = 384 (tile-aligned); a [B, S, HD//2] lane-packing
  would pad 192 lanes to 256 physically and forfeit a third of the win.

Variants (each a 6-layer read loop, fresh q between layers, like probe2):

  xla8     production cached_att einsum over int8 [B,S,H,D] + [B,S,H] scales
  lean8    the Pallas kernel over an UNPACKED int8 [B,S,HD] cache
           (isolates kernel overhead; also tests a no-quality-loss win)
  lean4    the Pallas kernel over the packed int4 cache (the prize)

MEASURED (v5e via axon, 2026-08-19) — ms per layer-read, B=4096:

  xla8          1.77   (in-harness; the fused production step reaches ~1.07)
  lean8  R=16   2.06   int8 DMA floor 1.07
  lean8  R=32   2.04   (flat in R: NOT program-overhead-bound)
  lean4  R=16   1.91   int4 DMA floor 0.53 — 3.6x its floor

VERDICT: no-go. The kernel is bound by PER-ROW serialization: each batch
row's unpack -> QK dot -> softmax -> PV dot chain costs ~0.5 us and Mosaic
does not overlap independent rows' MXU/VPU stages (R=16 vs R=32 identical;
halving the DMA bytes moved the total only 7%). The int4 budget is 0.13
us/row — unreachable under that scheduling, and a cross-row batched-dot
variant (one [R*Hp, R*S] masked joint softmax per program) still lands at
an estimated >= 1.3 ms/layer from the R^2 MXU waste + big-matrix VPU
passes. The production XLA int8 path stays the floor at this model scale;
the framework's decode bandwidth lever is the Generator's decode-window
knob instead (decode/generate.py ``window``).

Mosaic findings baked in: int8 vector shifts and bf16 ``floor`` both crash
the backend compiler (HTTP 500 from remote_compile); i32 shifts and all-f32
float unpack compile. The committed unpack is the float path (floor/mul in
f32, concat, cast bf16) — 7 cheap passes over the packed block.

Run: python docs/experiments/int4_kernel_probe.py   (env: B, VARIANTS, R)
"""

import collections
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("B", 4096))
S = int(os.environ.get("S", 256))
H = 6
D = 64
HD = H * D
L = 6
R = int(os.environ.get("R", 16))


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


# ---------------------------------------------------------------- kernels

def _lean_kernel(R, S, H, HD, packed):
    """T=1 decode attention, R rows per program, int8 MXU dots.

    Refs: q [R, 8, HD] bf16 (row's query broadcast to 8 sublanes so the
    block slices stay tile-legal; only sublane 0 is meaningful),
    k/v [R, Sp, HD] int8 (Sp = S//2 if packed else S),
    ks/vs [R, 8, S] bf16 scale rows (sublanes 0..H-1 real),
    o [R, 8, HD] fp32 (row output in sublane 0).
    """
    Hp = 8  # head rows padded to one sublane tile
    sm = 1.0 / math.sqrt(D)

    def unpack(x):  # [S//2, HD] int8 nibbles -> [S, HD] bf16 values
        # int8 vector shifts crash the Mosaic compiler, and so does floor on
        # a bf16 vector (probed 2026-08-19: i8-shifts FAILED, bf16-floor
        # FAILED, f32 ops OK; i32 shifts work but 4x the vreg traffic).
        # Float unpack in f32: hi = floor(x/16) (exact for |x| <= 127),
        # u = x - 16*hi is the unsigned low nibble (floor handles the sign),
        # lo = u - 16*(u >= 8) restores two's-complement.
        xf = x.astype(jnp.float32)
        hi = jnp.floor(xf * 0.0625)
        u = xf - hi * 16.0
        lo = u - jnp.where(u >= 8.0, 16.0, 0.0)
        return jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)

    def kernel(q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref):
        # lane -> head ownership over [Hp, HD]: row h keeps head h's lanes
        own = (jax.lax.broadcasted_iota(jnp.int32, (Hp, HD), 1) // D
               == jax.lax.broadcasted_iota(jnp.int32, (Hp, HD), 0))
        for r in range(R):
            if packed:
                k8 = unpack(k_ref[r])  # [S, HD] bf16
                v8 = unpack(v_ref[r])
            else:
                k8, v8 = k_ref[r], v_ref[r]  # [S, HD] int8
            # per-head masked query stack [Hp, HD] (pad rows h >= H zero)
            qm = jnp.where(own, jnp.broadcast_to(
                q_ref[r][0:1], (Hp, HD)).astype(jnp.float32), 0.0)
            if packed:
                # bf16 x bf16 MXU dots against the unpacked values: no
                # q/probs requantize passes needed
                scores = jax.lax.dot_general(
                    qm.astype(jnp.bfloat16), k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Hp, S]
                scores = scores * ks_ref[r].astype(jnp.float32) * sm
                probs = jax.nn.softmax(scores, axis=-1)
                probs = probs * vs_ref[r].astype(jnp.float32)
                pv = jax.lax.dot_general(
                    probs.astype(jnp.bfloat16), v8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [Hp, HD]
            else:
                qs = jnp.maximum(
                    jnp.max(jnp.abs(qm), axis=1, keepdims=True), 1e-20
                ) / 127.0
                q8 = jnp.clip(jnp.round(qm / qs), -127, 127).astype(jnp.int8)
                scores = jax.lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)  # [Hp, S]
                scores = scores * qs * ks_ref[r].astype(jnp.float32) * sm
                probs = jax.nn.softmax(scores, axis=-1)  # [Hp, S] fp32
                probs = probs * vs_ref[r].astype(jnp.float32)
                ps = jnp.maximum(
                    jnp.max(probs, axis=1, keepdims=True), 1e-20) / 127.0
                p8 = jnp.clip(jnp.round(probs / ps), 0, 127).astype(jnp.int8)
                pv = jax.lax.dot_general(
                    p8, v8, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * ps  # [Hp, HD]
            pv = jnp.where(own, pv, 0.0)
            # fold the diagonal head blocks to one row: ones [Hp] dot
            out = jax.lax.dot_general(
                jnp.ones((8, Hp), jnp.float32), pv,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [8, HD] (all 8 sublanes equal; harmless)
            o_ref[r] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("packed",))
def lean_attention(q, k, v, ks, vs, packed):
    """q [B, 8, HD] bf16; k/v [B, Sp, HD] int8; ks/vs [B, 8, S] bf16."""
    Sp = k.shape[1]
    grid_spec = pl.GridSpec(
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, 8, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Sp, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, Sp, HD), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 8, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 8, HD), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _lean_kernel(R, S, H, HD, packed),
        out_shape=jax.ShapeDtypeStruct((B, 8, HD), jnp.float32),
        grid_spec=grid_spec,
    )(q, k, v, ks, vs)


# ------------------------------------------------------------- harnesses

def run_variant(name, salt):
    key = jax.random.PRNGKey(salt)

    if name == "xla8":
        @jax.jit
        def build():
            c = jax.random.randint(
                key, (L, 2, B, S, H, D), -127, 128, jnp.int8)
            s_ = jax.random.uniform(
                key, (L, 2, B, S, H), jnp.float32, 0.5, 1.5
            ).astype(jnp.bfloat16)
            return c, s_

        c, s_ = build()
        c.block_until_ready()

        @jax.jit
        def step(q, c, s_):
            sm = jnp.bfloat16(1.0 / math.sqrt(D))
            for l in range(L):
                ck, cv = c[l, 0], c[l, 1]
                ks, vs = s_[l, 0], s_[l, 1]
                att = jnp.einsum("bthd,bshd->bhts", q[:, None],
                                 ck.astype(jnp.bfloat16)) * sm
                att = att * jnp.swapaxes(ks, 1, 2)[:, :, None, :].astype(
                    jnp.bfloat16)
                att = jax.nn.softmax(
                    att.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
                att = att * jnp.swapaxes(vs, 1, 2)[:, :, None, :].astype(
                    jnp.bfloat16)
                o = jnp.einsum("bhts,bshd->bthd", att,
                               cv.astype(jnp.bfloat16))[:, 0]
                q = q + o.reshape(B, H, D) * jnp.bfloat16(1e-3)
            return jnp.sum(q.astype(jnp.float32))

        q0 = jax.random.normal(key, (B, H, D)).astype(jnp.bfloat16)
        out = float(step(q0, c, s_))
        root = f"/tmp/int4p3_{name}_{salt}"
        with jax.profiler.trace(root):
            for i in range(3):
                q0 = q0 + jnp.bfloat16(i + 1)
                out = float(step(q0, c, s_))
        return root, out

    packed = name == "lean4"
    Sp = S // 2 if packed else S

    # per-layer caches as SEPARATE arrays (production KVCache stores
    # per-layer tuple leaves for the same reason): a static slice of one
    # stacked [L, 2, ...] array materializes a full-buffer copy when fed
    # to a pallas_call operand, which would charge ~0.5 ms/layer of fake
    # copies to the kernel
    @jax.jit
    def build(i):
        lim = 8 if packed else 128
        kk = jax.random.fold_in(key, i)
        c = jax.random.randint(kk, (2, B, Sp, HD), -lim, lim, jnp.int8)
        if packed:
            # re-pack the random int4 values into both nibbles
            lo = c & jnp.int8(0xF)
            hi = jax.lax.shift_left(c, jnp.int8(4))
            c = lo | hi
        s_ = jax.random.uniform(
            kk, (2, B, 8, S), jnp.float32, 0.5, 1.5
        ).astype(jnp.bfloat16)
        return c[0], c[1], s_[0], s_[1]

    layers = [build(i) for i in range(L)]
    layers[-1][0].block_until_ready()

    @jax.jit
    def step(q, layers):
        for (ck, cv, ks, vs) in layers:
            o = lean_attention(q, ck, cv, ks, vs, packed=packed)
            q = q + o.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)
        return jnp.sum(q.astype(jnp.float32))

    q0 = jax.random.normal(key, (B, 8, HD)).astype(jnp.bfloat16)
    out = float(step(q0, layers))
    root = f"/tmp/int4p3_{name}_{salt}"
    with jax.profiler.trace(root):
        for i in range(3):
            q0 = q0 + jnp.bfloat16(i + 1)
            out = float(step(q0, layers))
    return root, out


def main():
    print("devices:", jax.devices(), flush=True)
    salt = int(time.time())
    variants = os.environ.get("VARIANTS", "lean8,lean4,xla8").split(",")
    for name in variants:
        try:
            t0 = time.time()
            root, out = run_variant(name, salt)
            mods = device_ms_per_module(root)
            print(f"{name}: compiled+ran in {time.time()-t0:.0f}s "
                  f"(out={out:.1f})", flush=True)
            for n, (ms, cnt) in sorted(mods.items(), key=lambda kv: -kv[1][0]):
                if ms > 0.3:
                    print(f"  {name} {n.split('(')[0][:28]}: {ms:.2f} "
                          f"ms/call x{cnt} -> {ms / L:.3f} ms/layer",
                          flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
    print("DONE", flush=True)


main()
