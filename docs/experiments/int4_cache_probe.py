"""int4-in-program cache read probe: convert int8->int4 INSIDE the jit
(the Generator's cache never crosses a program boundary, so this mirrors
the real decode structure; the axon client cannot ship S4 args)."""
import sys, time, json, glob, gzip
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from jax import lax

B, S, H, D = 4096, 256, 6, 64
STEPS = 200

def attn_step(q, ck, cv, ks, vs):
    att = jnp.einsum("bthd,bshd->bhts", q, ck.astype(jnp.bfloat16)) * (1.0 / D**0.5)
    att = att * jnp.swapaxes(ks, 1, 2)[:, :, None, :].astype(jnp.bfloat16)
    att = jax.nn.softmax(att.astype(jnp.float32), axis=-1).astype(jnp.bfloat16)
    y = jnp.einsum("bhts,bshd->bthd", att, cv.astype(jnp.bfloat16))
    return y

def run(dtype_name, dtype):
    key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    ck8 = jax.random.randint(key, (B, S, H, D), -7, 8, jnp.int8)
    cv8 = jax.random.randint(jax.random.fold_in(key, 1), (B, S, H, D), -7, 8, jnp.int8)
    ks = jnp.ones((B, S, H), jnp.bfloat16)
    vs = jnp.ones((B, S, H), jnp.bfloat16)

    @jax.jit
    def loop(c0, ck8, cv8, ks, vs):
        ck = ck8.astype(dtype)   # one-time in-program conversion
        cv = cv8.astype(dtype)
        def body(carry, i):
            q = (carry + i).astype(jnp.bfloat16).reshape(B, 1, H, D)
            y = attn_step(q, ck, cv, ks, vs)
            return carry + y.reshape(B, H, D).astype(jnp.float32) * 1e-6, ()
        c, _ = lax.scan(body, c0, jnp.arange(STEPS, dtype=jnp.float32))
        return jnp.sum(c)

    c0 = jnp.zeros((B, H, D), jnp.float32)
    float(loop(c0, ck8, cv8, ks, vs))
    root = f"/tmp/int4b_trace_{dtype_name}"
    with jax.profiler.trace(root):
        float(loop(c0 + 1.0, ck8, cv8, ks, vs))
    path = sorted(glob.glob(f"{root}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        t = json.load(f)
    ev = t["traceEvents"]
    pidmap, tidmap = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pidmap[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tidmap[(e["pid"], e["tid"])] = e["args"]["name"]
    tpu = [p for p, n in pidmap.items() if "TPU" in n][0]
    tids = [t_ for (p, t_), n in tidmap.items() if p == tpu and n == "XLA Modules"]
    best = 0.0
    for e in ev:
        if e.get("pid") == tpu and e.get("tid") in tids and e.get("ph") == "X" and "loop" in e["name"]:
            best = max(best, e["dur"] / 1000.0)
    per_step = best / STEPS
    gb = 2 * B * S * H * D * (1 if dtype_name == "int8" else 0.5) / 1e9
    print(f"{dtype_name}: {best:.1f} ms module, {per_step:.3f} ms/step, "
          f"cache read {gb:.2f} GB/step -> {gb/per_step*1000:.0f} GB/s", flush=True)

run("int8", jnp.int8)
run("int4", jnp.int4)
