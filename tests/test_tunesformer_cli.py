"""TunesFormer CLI end-to-end: train on a tiny data.json, then generate."""

import argparse
import json
import os

import pytest

from ai_music_generation_tpu.cli.tunesformer_train import main as train_main

pytestmark = pytest.mark.slow  # compile-heavy (see pyproject)


@pytest.fixture(scope="module")
def tiny_data(tmp_path_factory):
    root = tmp_path_factory.mktemp("tf")
    items = []
    for i in range(24):
        items.append({
            "control code": "S:1\nB:2\nE:8\n",
            "abc notation": f"X:{i}\nL:1/8\nM:4/4\nK:C\nCDEF GABc|cBAG FEDC|",
        })
    path = str(root / "data.json")
    with open(path, "w") as f:
        json.dump(items, f)
    return str(root), path


# nightly (32s solo, VERDICT r4 #6): full CLI train->generate e2e; the
# verification tier keeps the flag/prompt/oracle coverage in this file
# and the model-level oracles in test_tunesformer.py.
@pytest.mark.nightly
def test_train_and_generate(tiny_data, tmp_path):
    root, data_path = tiny_data
    out = str(tmp_path / "tf_out")
    loss = train_main([
        f"--data_path={data_path}", f"--out_dir={out}",
        "--num_epochs=2", "--batch_size=4", "--patch_length=16",
        "--patch_size=16", "--patch_layers=2", "--char_layers=2",
        "--n_embd=32", "--n_head=2", "--dtype=float32",
    ])
    assert loss < 100
    assert os.path.exists(os.path.join(out, "weights", "meta.json"))
    assert os.path.exists(os.path.join(out, "logs.txt"))
    logs = open(os.path.join(out, "logs.txt")).read()
    assert "Epoch 1" in logs and "eval_loss" in logs

    # generate with the trained weights
    from ai_music_generation_tpu.cli.tunesformer_generate import generate_abc

    prompt_path = str(tmp_path / "prompt.txt")
    with open(prompt_path, "w") as f:
        f.write("S:1\nL:1/8\nM:4/4\nK:C\n CD")
    args = argparse.Namespace(
        num_tunes=2, max_patch=8, top_p=0.9, top_k=8, temperature=1.0,
        seed=3, show_control_code=True, weights=out, prompt=prompt_path,
        output_dir=str(tmp_path / "output_tunes"),
    )
    out_path = generate_abc(args)
    text = open(out_path).read()
    assert "X:1\n" in text and "X:2\n" in text
    assert "K:C" in text


@pytest.mark.nightly
def test_sample_tunesformer_batch(tiny_data, tmp_path):
    """Batch sampler over validation leadsheets -> sample_<id>.abc files."""
    root, data_path = tiny_data
    out = str(tmp_path / "tf_out2")
    train_main([
        f"--data_path={data_path}", f"--out_dir={out}",
        "--num_epochs=1", "--batch_size=4", "--patch_length=16",
        "--patch_size=16", "--patch_layers=2", "--char_layers=2",
        "--n_embd=32", "--n_head=2", "--dtype=float32",
    ])
    val_json = tmp_path / "val.json"
    with open(val_json, "w") as f:
        json.dump([
            {"id": "t1", "control code": "S:1\nB:2\n",
             "abc notation": "L:1/8\nK:C\nCDEF GABc|cBAG FEDC|"},
            {"id": "t2", "abc notation": "L:1/8\nK:C\nCCEE GGcc|"},
        ], f)
    from ai_music_generation_tpu.cli.sample_tunesformer import main as st_main

    samples_dir = str(tmp_path / "samples")
    n = st_main([str(val_json), f"--weights={out}",
                 f"--output_dir={samples_dir}", "--n_measures=1",
                 "--max_patch=6", "--seed=3", "--temperature=1.0"])
    assert n == 2
    files = sorted(os.listdir(samples_dir))
    assert files == ["sample_t1.abc", "sample_t2.abc"]
    text = open(os.path.join(samples_dir, "sample_t1.abc")).read()
    assert text.startswith("X:t1\n")


@pytest.mark.nightly
def test_tunesformer_train_runs_on_multi_device_mesh(tiny_data, tmp_path):
    """The DP-sharded TunesFormer train step must run across the 8-device
    virtual mesh (batch divisible by device count)."""
    root, data_path = tiny_data
    out = str(tmp_path / "tf_dp")
    loss = train_main([
        f"--data_path={data_path}", f"--out_dir={out}",
        "--num_epochs=1", "--batch_size=8", "--patch_length=16",
        "--patch_size=16", "--patch_layers=2", "--char_layers=2",
        "--n_embd=32", "--n_head=2", "--dtype=float32",
    ])
    assert loss < 100


@pytest.mark.nightly
def test_train_torch_init_from_reference_weights(tiny_data, tmp_path):
    """--torch_init=<weights.pth> fine-tunes from a reference checkpoint
    (weights in, fresh optimizer/epoch)."""
    pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp

    from ai_music_generation_tpu.models.tunesformer import (
        TunesFormer, TunesFormerConfig)
    from ai_music_generation_tpu.models.tunesformer_export import (
        save_reference_checkpoint)

    root, data_path = tiny_data
    cfg = TunesFormerConfig(patch_length=16, patch_size=16, patch_layers=2,
                            char_layers=2, n_embd=32, n_head=2, dropout=0.0,
                            share_weights=False, dtype=jnp.float32)
    model = TunesFormer(cfg)
    src = model.init(jax.random.PRNGKey(11),
                     jnp.ones((1, 16, 16), jnp.int32))
    pth = str(tmp_path / "weights.pth")
    save_reference_checkpoint(pth, src, cfg, epoch=9)

    out = str(tmp_path / "tf_ft")
    loss = train_main([
        f"--data_path={data_path}", f"--out_dir={out}",
        f"--torch_init={pth}",
        "--num_epochs=1", "--batch_size=4", "--patch_length=16",
        "--patch_size=16", "--patch_layers=2", "--char_layers=2",
        "--n_embd=32", "--n_head=2", "--dtype=float32",
    ])
    assert loss < 100
    # fresh epoch counter: trained exactly epoch 1, not 10
    logs = open(os.path.join(out, "logs.txt")).read()
    assert "Epoch 1" in logs and "Epoch 10" not in logs
