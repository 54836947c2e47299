"""Project shell tests: pipeline framework, catalog, registry, CLI, configs."""

import os

import pytest

from ai_music_generation_tpu.project.framework import (
    DataCatalog,
    Pipeline,
    node,
    register_pipelines,
)


def test_pipeline_dependency_order(tmp_path):
    catalog = DataCatalog()
    catalog.save("a", 1)
    calls = []

    def add_one(x):
        calls.append("add_one")
        return x + 1

    def double(x):
        calls.append("double")
        return x * 2

    # declared out of order: runner must topologically order them
    p = Pipeline([
        node(double, "b", "c", name="double"),
        node(add_one, "a", "b", name="add_one"),
    ])
    p.run(catalog)
    assert calls == ["add_one", "double"]
    assert catalog.load("c") == 4


def test_pipeline_missing_input():
    p = Pipeline([node(lambda x: x, "nope", "out")])
    with pytest.raises(RuntimeError, match="missing inputs"):
        p.run(DataCatalog())


def test_register_pipelines_discovers_data_processing():
    pipelines = register_pipelines()
    assert "data_processing" in pipelines
    assert "__default__" in pipelines
    assert len(pipelines["__default__"].nodes) >= 1


def test_catalog_yaml_and_cli(tmp_path, monkeypatch):
    # project layout: conf/base/catalog.yaml + data/01_raw csv
    root = tmp_path
    (root / "conf" / "base").mkdir(parents=True)
    (root / "data" / "01_raw").mkdir(parents=True)
    (root / "data" / "01_raw" / "test-run-data.csv").write_text("x,y\n1,2\n3,4\n")
    (root / "conf" / "base" / "catalog.yaml").write_text(
        "test_run_data:\n  type: csv\n  filepath: data/01_raw/test-run-data.csv\n"
        "processed_data:\n  type: csv\n"
        "  filepath: data/02_preprocessed/out.csv\n"
    )
    (root / "conf" / "base" / "parameters.yaml").write_text(
        "data_processing:\n  drop_duplicates: false\n"
    )
    monkeypatch.chdir(root)
    from ai_music_generation_tpu.__main__ import main

    main(["run", "--pipeline", "data_processing"])
    out = root / "data" / "02_preprocessed" / "out.csv"
    assert out.exists()
    assert "1,2" in out.read_text()


def test_catalog_params_injection(tmp_path, monkeypatch):
    """parameters.yaml values reach nodes via params: inputs (kedro contract)."""
    root = tmp_path
    (root / "conf" / "base").mkdir(parents=True)
    (root / "data" / "01_raw").mkdir(parents=True)
    (root / "data" / "01_raw" / "t.csv").write_text("x,y\n1,2\n1,2\n3,4\n")
    (root / "conf" / "base" / "catalog.yaml").write_text(
        "test_run_data:\n  type: csv\n  filepath: data/01_raw/t.csv\n"
    )
    (root / "conf" / "base" / "parameters.yaml").write_text(
        "data_processing:\n  drop_duplicates: true\n"
    )
    monkeypatch.chdir(root)
    catalog = DataCatalog.from_yaml(str(root / "conf" / "base" / "catalog.yaml"))
    assert catalog.load("params:data_processing.drop_duplicates") in (True, "true")
    assert "data_processing" in catalog.load("parameters")
    with pytest.raises(KeyError, match="not in parameters.yaml"):
        catalog.load("params:nope")
    pipelines = register_pipelines()
    pipelines["data_processing"].run(catalog)
    df = catalog.load("processed_data")
    # drop_duplicates=true: the duplicated row is removed (pyyaml parses the
    # bool; the fallback string "true" is truthy too)
    assert len(df) == 2


def test_all_experiment_configs_apply_cleanly():
    """Every generated config must only use known trainer keys."""
    import glob

    from ai_music_generation_tpu.train.trainer import DEFAULTS
    from ai_music_generation_tpu.utils.configurator import apply_overrides

    configs = glob.glob("ai_music_generation_tpu/configs/*.py")
    configs = [c for c in configs if "generate_configs" not in c and "__init__" not in c]
    assert len(configs) == 26
    for path in configs:
        merged = apply_overrides(dict(DEFAULTS), [path])
        assert merged["batch_size"] > 0


def test_configurator_rejects_bool_for_int():
    """Exact-type check (ref configurator.py:44): --n_layer=True must not
    silently become a 1-layer model (bool is an int subclass)."""
    import pytest

    from ai_music_generation_tpu.utils.configurator import apply_overrides

    with pytest.raises(TypeError, match="bool"):
        apply_overrides({"n_layer": 12}, ["--n_layer=True"])
    assert apply_overrides({"flag": True}, ["--flag=False"])["flag"] is False
    assert apply_overrides({"lr": 1e-3}, ["--lr=1"])["lr"] == 1.0  # int->float ok


def test_bin_dataset_samples_last_window(tmp_path):
    """global_indices must be able to draw the LAST valid window offset
    (len - block - 1): the prior exclusive bound made every bin's final
    tokens unreachable (ref torch.randint(len - block_size) includes it)."""
    import numpy as np

    from ai_music_generation_tpu.data.memmap import BinDataset

    path = tmp_path / "train.bin"
    np.arange(10, dtype=np.uint16).tofile(path)
    ds = BinDataset(str(path))
    draws = np.concatenate([
        ds.global_indices(seed=1, it=i, n=64, block_size=4) for i in range(8)
    ])
    assert draws.max() == 10 - 4 - 1 and draws.min() == 0


def test_pipeline_runs_producer_before_consumer(tmp_path):
    """A catalog-registered file dataset produced by a node in the pipeline
    must not count as available up front (the consumer ran first / read a
    stale file — review finding); wrong-arity node returns fail loudly."""
    import pytest

    from ai_music_generation_tpu.project.framework import (
        DataCatalog,
        Pipeline,
        node,
    )

    order = []
    catalog = DataCatalog(
        {"inter": {"type": "text.TextDataset",
                   "filepath": str(tmp_path / "inter.txt")}},
        base_path=str(tmp_path))

    def producer():
        order.append("producer")
        return "payload"

    def consumer(x):
        order.append("consumer")
        assert x == "payload"

    Pipeline([
        node(consumer, inputs=["inter"], outputs=[], name="c"),
        node(producer, inputs=[], outputs="inter", name="p"),
    ]).run(catalog)
    assert order == ["producer", "consumer"]

    def bad():
        return "xy"  # one value for two outputs

    with pytest.raises(ValueError, match="2 outputs"):
        Pipeline([node(bad, inputs=[], outputs=["a", "b"], name="bad")]).run(
            DataCatalog({}))
