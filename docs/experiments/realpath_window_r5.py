"""Real-path window composition: the promoted headline config through
`cli.sample` on the trained KH=2 flagship checkpoint.

Round-5 follow-up to realpath_bench_r5.py (which measured the user path
at full window: 372.9k tok/s at the 4,096-sample comparison shape). With
window 128 promoted to the bench.py headline (quality contract measured
flat on this very checkpoint — docs/PERF.md "Decode-window contract"),
this measures what a USER gets from `cli.sample --window=128` at the
same protocol: 4-measure validation conditioning, 500 new tokens,
T=0.8 / top-k 200 (ref: nanoGPT/sample.py:27,33-37), warm
differently-seeded timed pass (relay replay-cache defense).

Requires the /tmp/r5_kh2 checkpoint + /tmp/r5data corpus left by
realpath_bench_r5.py (re-run it first if absent).

Run: python docs/experiments/realpath_window_r5.py   (real chip; one
fresh multi-minute axon compile per batch shape)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r5_kh2"
DATA_ROOT = "/tmp/r5data"
VAL_JSON = os.path.join(DATA_ROOT, "validation.json")
for p in (OUT, VAL_JSON):
    if not os.path.exists(p):
        sys.exit(f"missing {p} — run realpath_bench_r5.py first")

from ai_music_generation_tpu.cli import sample as sample_cli


def run_protocol(num_samples, batch_size, seed, window):
    argv = [f"--out_dir={OUT}", f"--data_root={DATA_ROOT}",
            "--dataset=irishman", "--tokens_format=char",
            f"--validation_path={VAL_JSON}", "--n_conditional_measures=4",
            f"--num_samples={num_samples}", "--max_new_tokens=500",
            "--temperature=0.8", "--top_k=200", f"--seed={seed}",
            f"--batch_size={batch_size}", "--kv_quantized=True",
            "--flat_kv=True", f"--window={window}"]
    t0 = time.perf_counter()
    results = sample_cli.main(argv)
    return results, time.perf_counter() - t0


# The sampler conditions ONE sample per validation entry (ref
# nanoGPT/sample.py:114-138), so the entry count IS the sample count:
# trim/extend validation.json to n before each leg (the first run of
# this script skipped that and its "protocol-1000" row actually decoded
# 4,096 samples at batch 1,000 — discard any such row).
with open(VAL_JSON) as f:
    val_entries = json.load(f)


def set_val(n):
    reps = [dict(e, id=f"{e['id']}_{k}")
            for k in range(-(-n // len(val_entries)))
            for e in val_entries][:n]
    with open(VAL_JSON, "w") as f:
        json.dump(reps, f)


for label, n, b in (("comparison-4096", 4096, 4096),
                    ("protocol-1000", 1000, 1000)):
    set_val(n)
    # pass 1: compile at the protocol seed; pass 2: warm, salted seed
    _, dt_cold = run_protocol(n, b, 1337, 128)
    salt = 1337 + (int(time.time()) % 1000) + 1
    results, dt = run_protocol(n, b, salt, 128)
    assert len(results) == n, (len(results), n)
    print(f"[real-path window128 {label}] cold {dt_cold:.1f}s, "
          f"warm {dt:.1f}s -> {n * 500 / dt / 1000:.1f}k tok/s "
          f"({len(results)} samples)", flush=True)
print("DONE", flush=True)
