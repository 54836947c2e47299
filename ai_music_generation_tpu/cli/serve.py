"""Generation server CLI: continuous-batching decode over a checkpoint.

The reference has no serving path (generation is batch scripts only,
ref: nanoGPT/sample.py); this is the production-serving extension of the
same checkpoint + meta contract the sampler uses.

    python -m ai_music_generation_tpu.cli.serve --out_dir=out-bach-512-context \\
        --port=8000 --n_slots=64

then:

    curl -s localhost:8000/generate -d '{"prompt": "$ /0 o0 p60 d12", "max_new_tokens": 200}'

Tuning (measured sweeps in docs/SERVING.md): the default ticks_per_call=32
favors time-to-first-result for interactive use; for throughput-bound
loads run --ticks_per_call=128 --n_slots=2048 --kv_quantized=True (the
fastest measured PARITY configuration, 221.9k tok/s steady state on a
v5e chip); adding --cache_len=128 --ticks_per_call=64 opts into the
decode-window contract (+0.057 teacher NLL, docs/PERF.md) and reads
262.9k at 2048 slots / 303.1k at 4096; GQA checkpoints with
--flat_kv=True --n_slots=8192 --admit_group=512 read the measured
maximum (372.0k — the 3× smaller KV cache becomes slot capacity).
--mesh=NxM serves sharded over a (data=N, model=M) device mesh (slot
state on the data axis, params on the TP rules) for multi-chip slices;
flat_kv engines are single-chip (one replica per device) — the two
flags are mutually exclusive.
"""

from __future__ import annotations

import sys

from ai_music_generation_tpu.cli.sample import build_codec, load_model
from ai_music_generation_tpu.serve.engine import GenerationServer
from ai_music_generation_tpu.serve.http import EngineRunner, serve
from ai_music_generation_tpu.utils.configurator import apply_overrides

DEFAULTS = dict(
    out_dir="out",
    init_from="resume",
    data_root="data",
    tokens_format="midi",
    host="127.0.0.1",
    port=8000,
    n_slots=64,
    ticks_per_call=32,
    admit_group=64,
    cache_len=0,  # ring-cache length; 0 = block_size (parity). Smaller =
    # the decode-window throughput lever (docs/PERF.md "Decode-window
    # contract"): every token still sees >= cache_len/2 committed context.
    dtype="bfloat16",
    kv_quantized=False,
    flat_kv=False,  # Pallas flat-cache decode kernel: the fastest serving
    # config for GQA checkpoints (single-chip engines; incompatible with
    # --mesh — see GenerationServer's guard / docs/SERVING.md)
    prewarm=False,  # compile all admission/decode programs before serving
    mesh="",  # "NxM" = serve sharded over a (data=N, model=M) device mesh
)


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    c = apply_overrides(dict(DEFAULTS), argv)
    model, params, ckpt_meta = load_model(
        c["out_dir"], c["dtype"], c["init_from"], c["kv_quantized"],
        c["flat_kv"])
    encode, decode = build_codec(ckpt_meta, c["data_root"], c["tokens_format"])
    mesh = None
    if c["mesh"]:
        from ai_music_generation_tpu.parallel.mesh import make_mesh

        n_data, n_model = (int(x) for x in c["mesh"].lower().split("x"))
        mesh = make_mesh(n_data=n_data, n_model=n_model)
    engine = GenerationServer(
        model, params, n_slots=c["n_slots"],
        ticks_per_call=c["ticks_per_call"], admit_group=c["admit_group"],
        cache_len=c["cache_len"] or None, mesh=mesh)
    if c["prewarm"]:
        print("prewarming admission/decode programs...", flush=True)
        engine.prewarm()
    runner = EngineRunner(engine)
    httpd = serve(runner, encode, decode, c["host"], c["port"])
    print(f"serving {c['out_dir']} on {c['host']}:{httpd.server_address[1]} "
          f"({c['n_slots']} slots)")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        runner.shutdown()


if __name__ == "__main__":
    main()
