"""TPU-native symbolic-music-generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Jakub-Kucinski/ai-music-generation (reference mounted at /root/reference):

- ``models``      — Flax GPT (nanoGPT-parity, ref: nanoGPT/model.py) and the
                    TunesFormer dual patch/char decoder (ref: tunesformer/utils.py).
- ``ops``         — Pallas TPU kernels (fused decode attention, sampling, synth).
- ``parallel``    — device-mesh construction + sharding rules (replaces the
                    reference's torch.distributed/NCCL DDP, ref: nanoGPT/train.py:86-99).
- ``tokenizers``  — char / whitespace / BPE / WordPiece / Patchilizer.
- ``codec``       — quantized MIDI <-> token-text codec
                    (ref: src/ai_music_generation/core/encodings/quantized_converter.py).
- ``abcnotation`` — ABC parsing / ABC -> MIDI event compilation (replaces abc2midi).
- ``data``        — memmap loaders + dataset prepare pipelines (ref: nanoGPT/data/*).
- ``train``       — pjit train step, optax optimizer, orbax checkpoints.
- ``decode``      — batched KV-cache autoregressive decoding with on-device sampling.
- ``synth``       — on-TPU wavetable synthesis (replaces FluidSynth/Timidity) and
                    silence trimming (replaces sox).
- ``eval``        — structural similarity metrics + aggregation + ranking
                    (ref: src/ai_music_generation/core/metrics/, scripts/common/).
"""

__version__ = "0.1.0"
