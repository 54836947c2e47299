"""Audiobox-aesthetics predictor: Flax WavLM vs the canonical HF torch
implementation, converter mapping, and end-to-end chunked scoring.

The encoder is verified NUMERICALLY against ``transformers.WavLMModel``
(random weights, exported via state_dict, converted) — the same layout the
real audiobox checkpoint's encoder uses. (VERDICT #2; ref scorer:
scripts/common/abc_to_midi_wav_and_aesthetics.py:323-355.)
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_music_generation_tpu.eval.audiobox import (
    AesPredictor,
    AudioboxAesthetics,
    AudioboxConfig,
    convert_torch_state_dict,
)
from ai_music_generation_tpu.eval.wavlm import WavLMConfig, WavLMEncoder

pytestmark = pytest.mark.slow  # HF cross-checks + chunked scoring compiles

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

TINY = dict(
    hidden_size=64, num_layers=2, num_heads=4, intermediate_size=96,
    conv_dim=(24, 24, 24), conv_kernel=(10, 3, 3), conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    num_buckets=32, max_distance=80,
)


def _hf_model(stable: bool):
    cfg = transformers.WavLMConfig(
        hidden_size=TINY["hidden_size"], num_hidden_layers=TINY["num_layers"],
        num_attention_heads=TINY["num_heads"],
        intermediate_size=TINY["intermediate_size"],
        conv_dim=TINY["conv_dim"], conv_kernel=TINY["conv_kernel"],
        conv_stride=TINY["conv_stride"],
        num_conv_pos_embeddings=TINY["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=TINY["num_conv_pos_embedding_groups"],
        num_buckets=TINY["num_buckets"], max_bucket_distance=TINY["max_distance"],
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group",
        hidden_dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
        feat_proj_dropout=0.0, layerdrop=0.0, mask_time_prob=0.0,
        mask_feature_prob=0.0, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    return transformers.WavLMModel(cfg).eval()


def _flax_cfg(stable: bool) -> WavLMConfig:
    return WavLMConfig(
        do_stable_layer_norm=stable,
        feat_extract_norm="layer" if stable else "group", **TINY)


@pytest.mark.parametrize("stable", [False, True],
                         ids=["base-postnorm", "large-prenorm"])
@pytest.mark.nightly
def test_flax_wavlm_matches_hf(stable):
    hf = _hf_model(stable)
    wave = np.random.default_rng(1).normal(size=(2, 2000)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wave), output_hidden_states=True)

    fcfg = _flax_cfg(stable)
    enc = WavLMEncoder(fcfg)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(wave[:, :400]))
    params, loaded, unmapped = convert_torch_state_dict(
        hf.state_dict(), template)
    assert unmapped == [], unmapped
    last, hiddens = enc.apply(params, jnp.asarray(wave))

    np.testing.assert_allclose(
        np.asarray(last), ref.last_hidden_state.numpy(),
        rtol=2e-4, atol=2e-5)
    assert hiddens.shape[0] == len(ref.hidden_states)
    for i, h in enumerate(ref.hidden_states):
        np.testing.assert_allclose(
            np.asarray(hiddens[i]), h.numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"hidden state {i}")


# nightly (15s solo — builds two full predictors just to exercise the
# error contract); the happy-path conversion stays in the verification
# tier via the head-path and padding-mask tests.
@pytest.mark.nightly
def test_converter_reports_unmapped_and_shape_errors():
    fcfg = _flax_cfg(False)
    model = AudioboxAesthetics(AudioboxConfig(wavlm=fcfg))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 800), jnp.float32))
    sd = {"totally.unknown.key": np.zeros((3, 3), np.float32)}
    _, loaded, unmapped = convert_torch_state_dict(sd, template)
    assert loaded == [] and unmapped == ["totally.unknown.key"]

    bad = {"encoder.layers.0.attention.q_proj.bias":
           np.zeros((7,), np.float32)}
    with pytest.raises(ValueError, match="shape"):
        convert_torch_state_dict(bad, template)


def test_head_key_hints_map_mlp_heads():
    fcfg = _flax_cfg(False)
    model = AudioboxAesthetics(AudioboxConfig(wavlm=fcfg))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 800), jnp.float32))
    d, hh = TINY["hidden_size"], 256
    sd = {
        "proj_PQ.0.weight": np.full((hh, d), 0.5, np.float32),
        "proj_PQ.0.bias": np.zeros((hh,), np.float32),
        "proj_PQ.2.weight": np.ones((1, hh), np.float32),
        "proj_PQ.2.bias": np.zeros((1,), np.float32),
    }
    params, loaded, unmapped = convert_torch_state_dict(sd, template)
    assert len(loaded) == 4 and unmapped == []
    np.testing.assert_allclose(
        np.asarray(params["params"]["head_PQ_0"]["kernel"]), 0.5)


@pytest.mark.nightly
def test_predictor_end_to_end_jsonl(tmp_path):
    """Full compute path with random weights: chunking, batching, masking,
    JSONL schema — same row shape as the audio-aes CLI output."""
    from ai_music_generation_tpu.synth.wav_io import write_wav

    cfg = AudioboxConfig(wavlm=_flax_cfg(False))
    pred = AesPredictor(cfg, batch=2, chunk_seconds=0.5)
    rng = np.random.default_rng(0)
    paths = []
    for i, sec in enumerate((0.7, 1.9)):
        w = (0.1 * rng.normal(size=int(16000 * sec))).astype(np.float32)
        p = tmp_path / f"t{i}.wav"
        write_wav(str(p), w, 16000)
        paths.append(str(p))
    inp = tmp_path / "in.jsonl"
    inp.write_text("".join(json.dumps({"path": p}) + "\n" for p in paths))
    out = tmp_path / "out.jsonl"
    pred.score_jsonl(str(inp), str(out))
    rows = [json.loads(x) for x in out.read_text().splitlines()]
    assert len(rows) == 2
    for row in rows:
        assert set(row) == {"CE", "CU", "PC", "PQ"}
        assert all(np.isfinite(v) for v in row.values())

    # chunk invariance: a file shorter than one chunk scores identically
    # whether scored alone or alongside others (mask correctness)
    wave = (0.05 * rng.normal(size=12345)).astype(np.float32)
    alone = pred.score_wave(wave)
    crowd = pred.score_waves([(np.zeros(16000, np.float32), 16000),
                              (wave, 16000)])[1]
    for a in alone:
        np.testing.assert_allclose(alone[a], crowd[a], rtol=1e-5)


def test_run_aesthetics_prefers_jax_port_when_weights_exist(
        tmp_path, monkeypatch):
    """Scorer precedence: audio-aes CLI > Flax port (weights file) > proxy."""
    import ai_music_generation_tpu.eval.aesthetics as aes
    import ai_music_generation_tpu.eval.audiobox as ab

    calls = {}

    class Stub:
        def __init__(self, config=None, weights=None, batch=8):
            calls["weights"] = weights

        def score_jsonl(self, inp, out):
            with open(out, "w") as f:
                f.write(json.dumps({a: 5.0 for a in AXES_}) + "\n")

    AXES_ = ("CE", "CU", "PC", "PQ")
    monkeypatch.setattr(ab, "AesPredictor", Stub)
    monkeypatch.setattr(aes.shutil, "which", lambda _: None)  # no CLI
    ckpt = tmp_path / "w.pt"
    ckpt.write_bytes(b"stub")
    monkeypatch.setenv("AUDIOBOX_WEIGHTS", str(ckpt))
    inp = tmp_path / "in.jsonl"
    inp.write_text(json.dumps({"path": "x.wav"}) + "\n")
    out = tmp_path / "out.jsonl"
    assert aes.run_aesthetics(str(inp), str(out)) is True
    assert calls["weights"] == str(ckpt)
    assert json.loads(out.read_text())["PQ"] == 5.0

    # force_proxy still wins over the weights file
    monkeypatch.delenv("AUDIOBOX_WEIGHTS")
    assert aes.run_aesthetics(str(inp), str(out), force_proxy=True) is False


def test_config_autodetect_from_state_dict():
    """Checkpoint geometry (hidden/layers/heads/ffn/convs/buckets/norm mode)
    is inferred from shapes, so a real torch file needs no manual config."""
    from ai_music_generation_tpu.eval.audiobox import config_from_state_dict

    for stable in (False, True):
        hf = _hf_model(stable)
        cfg = config_from_state_dict(
            {k: v.numpy() for k, v in hf.state_dict().items()}).wavlm
        assert cfg.hidden_size == TINY["hidden_size"]
        assert cfg.num_layers == TINY["num_layers"]
        assert cfg.num_heads == TINY["num_heads"]
        assert cfg.intermediate_size == TINY["intermediate_size"]
        assert cfg.conv_dim == TINY["conv_dim"]
        assert cfg.conv_kernel == TINY["conv_kernel"]
        assert cfg.num_buckets == TINY["num_buckets"]
        assert cfg.num_conv_pos_embeddings == TINY["num_conv_pos_embeddings"]
        assert cfg.num_conv_pos_embedding_groups == TINY[
            "num_conv_pos_embedding_groups"]
        assert cfg.feat_extract_norm == ("layer" if stable else "group")


def test_resample_path():
    from ai_music_generation_tpu.eval.audiobox import _to_mono_16k

    w = np.sin(np.linspace(0, 100, 44100)).astype(np.float32)
    out = _to_mono_16k(w, 44100)
    assert abs(len(out) - 16000) <= 1
    stereo = np.stack([w, w], axis=1)
    np.testing.assert_allclose(_to_mono_16k(stereo, 44100), out, atol=1e-6)


@pytest.mark.nightly
def test_audio_aes_cli_drop_in(tmp_path, monkeypatch, capsys):
    """cli/audio_aes.py reproduces the audio-aes command surface: positional
    input.jsonl, --batch-size, one stdout JSON line per input line, NaN row
    for unreadable files (ref invocation: abc_to_midi_wav_and_aesthetics.py:323-325)."""
    import ai_music_generation_tpu.eval.audiobox as ab
    from ai_music_generation_tpu.cli import audio_aes
    from ai_music_generation_tpu.synth.wav_io import write_wav

    real = ab.AesPredictor

    class Tiny(real):
        def __init__(self, config=None, weights=None, batch=8):
            real.__init__(self, AudioboxConfig(wavlm=_flax_cfg(False)),
                          weights=None, batch=batch, chunk_seconds=0.5)

    monkeypatch.setattr(ab, "AesPredictor", Tiny)

    rng = np.random.default_rng(1)
    good = tmp_path / "a.wav"
    write_wav(str(good), (0.1 * rng.normal(size=8000)).astype(np.float32),
              16000)
    inp = tmp_path / "in.jsonl"
    inp.write_text(json.dumps({"path": str(good)}) + "\n"
                   + json.dumps({"path": str(tmp_path / "missing.wav")}) + "\n")

    # refuses without weights unless --allow-random
    assert audio_aes.main([str(inp)]) == 2
    rc = audio_aes.main([str(inp), "--batch-size", "2", "--allow-random"])
    assert rc == 0
    rows = [json.loads(x) for x in
            capsys.readouterr().out.strip().splitlines()]
    assert len(rows) == 2
    assert set(rows[0]) == {"CE", "CU", "PC", "PQ"}
    assert all(np.isfinite(v) for v in rows[0].values())
    assert all(np.isnan(v) for v in rows[1].values())

    # --output writes a file instead of stdout
    outf = tmp_path / "out.jsonl"
    assert audio_aes.main([str(inp), "--allow-random",
                           "--output", str(outf)]) == 0
    assert len(outf.read_text().splitlines()) == 2


class _TorchAesReplica(torch.nn.Module):
    """Minimal torch replica of the audiobox-aesthetics predictor head
    (per arXiv:2502.05139 / the audio-aes inference path the reference
    shells out to, ref: abc_to_midi_wav_and_aesthetics.py:323-355):
    per-axis softmax weighting over the L+1 encoder hidden states, masked
    mean-pool over frames, Linear->GELU->Linear, affine de-normalization.
    Key names follow the spellings HEAD_KEY_HINTS accepts (proj_<AXIS>.{0,2},
    layer_weights_<AXIS>), so its state_dict round-trips through
    convert_torch_state_dict unchanged."""

    AXES = ("CE", "CU", "PC", "PQ")

    def __init__(self, n_states: int, d: int, hidden: int = 256):
        super().__init__()
        g = torch.Generator().manual_seed(7)
        for ax in self.AXES:
            setattr(self, f"layer_weights_{ax}",
                    torch.nn.Parameter(torch.randn(n_states, generator=g)))
            setattr(self, f"proj_{ax}", torch.nn.Sequential(
                torch.nn.Linear(d, hidden), torch.nn.GELU(),
                torch.nn.Linear(hidden, 1)))
        # affine output de-normalization (identity would hide layout bugs)
        self.out_mean = {ax: 3.0 + 0.5 * i for i, ax in enumerate(self.AXES)}
        self.out_std = {ax: 1.0 + 0.25 * i for i, ax in enumerate(self.AXES)}

    def forward(self, hiddens, frame_mask):
        # hiddens: [L+1, B, F, D]; frame_mask: [B, F]
        denom = frame_mask.sum(-1, keepdim=True) + 1e-6
        outs = []
        for ax in self.AXES:
            w = torch.softmax(getattr(self, f"layer_weights_{ax}"), dim=0)
            feat = torch.einsum("l,lbfd->bfd", w, hiddens)
            pooled = (feat * frame_mask[..., None]).sum(1) / denom
            y = getattr(self, f"proj_{ax}")(pooled)[:, 0]
            outs.append(y * self.out_std[ax] + self.out_mean[ax])
        return torch.stack(outs, dim=-1)


def test_audiobox_head_path_matches_torch_replica():
    """END-TO-END score equality vs a torch replica: HF WavLM encoder +
    the torch head above, identical weights loaded into the Flax
    AudioboxAesthetics via convert_torch_state_dict. Closes the previously
    unverified segment between WavLM embeddings and CE/CU/PC/PQ
    (VERDICT r3 #4). When the real facebook/audiobox-aesthetics checkpoint
    is available, docs/MIGRATION.md has the one-command parity replay."""
    hf = _hf_model(False)
    fcfg = _flax_cfg(False)
    d = TINY["hidden_size"]
    head = _TorchAesReplica(TINY["num_layers"] + 1, d).eval()

    # ragged batch: row 1 padded, mask must reach encoder AND pooling
    rng = np.random.default_rng(11)
    T = 2400
    valid = np.array([T, 1500], np.int64)
    wave = rng.normal(size=(2, T)).astype(np.float32) * 0.3
    wave[1, valid[1]:] = 0.0

    nf = np.array([fcfg.frames_for_samples(int(v)) for v in valid])
    F = fcfg.frames_for_samples(T)
    frame_mask = (np.arange(F)[None, :] < nf[:, None]).astype(np.float32)
    am = (np.arange(T)[None, :] < valid[:, None]).astype(np.int64)
    with torch.no_grad():
        enc_out = hf(torch.from_numpy(wave),
                     attention_mask=torch.from_numpy(am),
                     output_hidden_states=True)
        hiddens = torch.stack(enc_out.hidden_states)  # [L+1, B, F, D]
        # zero padded frames before the head (the flax encoder guarantees
        # this; HF leaves padded-frame outputs unspecified)
        hiddens = hiddens * torch.from_numpy(frame_mask)[None, :, :, None]
        want = head(hiddens, torch.from_numpy(frame_mask)).numpy()

    model = AudioboxAesthetics(AudioboxConfig(wavlm=fcfg))
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 800), jnp.float32))
    sd = {**hf.state_dict(),
          **{k: v for k, v in head.state_dict().items()}}
    params, loaded, unmapped = convert_torch_state_dict(sd, template)
    assert unmapped == [], unmapped
    # every head tensor actually landed (4 axes x (w,b,w,b) + 4 layer wts)
    assert sum(k.startswith(("proj_", "layer_weights_")) for k in loaded) == 20
    for ax, mean in head.out_mean.items():
        params["params"][f"out_mean_{ax}"] = jnp.asarray(mean, jnp.float32)
        params["params"][f"out_std_{ax}"] = jnp.asarray(
            head.out_std[ax], jnp.float32)

    got = np.asarray(model.apply(params, jnp.asarray(wave),
                                 jnp.asarray(valid.astype(np.int32))))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.nightly  # HF cross-check family; head-path test stays in tier
def test_flax_wavlm_matches_hf_with_padding_mask():
    """Padded (ragged) inputs: the encoder must zero padded frames and mask
    attention exactly like HF (attention_mask path) — pooling-only masking
    let the silent tail contaminate valid frames (review finding)."""
    hf = _hf_model(False)
    rng = np.random.default_rng(3)
    T = 2400
    valid = np.array([T, 1400], np.int64)
    wave = rng.normal(size=(2, T)).astype(np.float32)
    wave[1, valid[1]:] = 0.0
    am = (np.arange(T)[None, :] < valid[:, None]).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(wave),
                 attention_mask=torch.from_numpy(am),
                 output_hidden_states=True)

    fcfg = _flax_cfg(False)
    enc = WavLMEncoder(fcfg)
    template = enc.init(jax.random.PRNGKey(0), jnp.asarray(wave[:, :400]))
    params, _, unmapped = convert_torch_state_dict(hf.state_dict(), template)
    assert unmapped == []
    F = fcfg.frames_for_samples(T)
    nf = np.array([fcfg.frames_for_samples(int(v)) for v in valid])
    frame_mask = (np.arange(F)[None, :] < nf[:, None]).astype(np.float32)
    last, _ = enc.apply(params, jnp.asarray(wave), jnp.asarray(frame_mask))

    # compare VALID frames only (HF leaves padded-frame outputs unspecified)
    got = np.asarray(last)
    want = ref.last_hidden_state.numpy()
    for b in range(2):
        np.testing.assert_allclose(got[b, :nf[b]], want[b, :nf[b]],
                                   rtol=2e-4, atol=2e-5,
                                   err_msg=f"row {b}")
    # and the masked row must differ from the unmasked forward (the mask
    # does something)
    last_nomask, _ = enc.apply(params, jnp.asarray(wave))
    assert not np.allclose(np.asarray(last_nomask)[1, :nf[1]],
                           got[1, :nf[1]], atol=1e-4)
