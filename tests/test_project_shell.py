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
