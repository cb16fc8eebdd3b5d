"""Config system tests: defaults, YAML merge, reference configs, templating."""

import os

import pytest

from dualvgr_tpu.config import Config, cfg_from_file, default_config, resolve_dataset_paths

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_defaults_match_reference_keys():
    c = default_config()
    assert c.seed == 666
    assert c.train.module_dim == 768
    assert c.train.vision_dim == 2048
    assert c.train.word_dim == 300
    assert c.graph_layers == 1
    assert c.dataset.appearance_feat == "{}_appearance_feat.h5"


@pytest.mark.parametrize(
    "name,nodes,ds",
    [
        ("svqa_DualVGR_20.yml", 20, "svqa"),
        ("msvd_qa_DualVGR.yml", 8, "msvd-qa"),
        ("msrvtt_qa_DualVGR_16.yml", 16, "msrvtt-qa"),
    ],
)
def test_reference_yamls_parse(name, nodes, ds):
    c = cfg_from_file(os.path.join(REPO, "configs", name))
    assert c.train.num_of_nodes == nodes
    assert c.dataset.name == ds
    assert c.train.batch_size == 256
    assert c.graph_module == "GAT"
    assert c.model_type == "DualVGR"


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("nonexistent_key: 1\n")
    with pytest.raises(KeyError):
        cfg_from_file(str(p))


def test_type_mismatch_rejected(tmp_path):
    p = tmp_path / "bad.yml"
    p.write_text("train:\n  batch_size: 'big'\n")
    with pytest.raises(ValueError):
        cfg_from_file(str(p))


def test_int_to_float_coercion(tmp_path):
    p = tmp_path / "ok.yml"
    p.write_text("train:\n  lr: 1\n")
    c = cfg_from_file(str(p))
    assert isinstance(c.train.lr, float) and c.train.lr == 1.0


def test_path_templating():
    c = default_config()
    c.dataset.name = "msvd-qa"
    c.dataset.data_dir = "/data/x"
    r = resolve_dataset_paths(c)
    assert r.dataset.appearance_feat == "/data/x/msvd-qa_appearance_feat.h5"
    assert r.dataset.train_question_pt == "/data/x/msvd-qa_train_questions.pt"
    # original untouched
    assert c.dataset.appearance_feat == "{}_appearance_feat.h5"


def test_attribute_access():
    c = Config.wrap({"a": {"b": 3}})
    assert c.a.b == 3
    c.a.b = 4
    assert c["a"]["b"] == 4


def test_tp_forces_xla_path_loudly(caplog):
    """tensor_parallel > 1 disables the Pallas kernels AND logs a warning
    (a silent ~2.4x kernel-path speedup loss would be a footgun)."""
    import logging

    from dualvgr_tpu.config import model_runtime_kwargs

    c = default_config()
    c.tpu.use_pallas = True  # explicit: pallas requested
    c.tpu.tensor_parallel = 2
    with caplog.at_level(logging.WARNING):
        kw = model_runtime_kwargs(c)
    assert kw["use_pallas"] is False
    assert any(
        "tensor_parallel" in r.message and "Pallas" in r.message
        for r in caplog.records
    ), f"expected a loud TP-forces-XLA warning, got {caplog.records}"

    # no warning when pallas is off or tp == 1
    caplog.clear()
    c.tpu.tensor_parallel = 1
    with caplog.at_level(logging.WARNING):
        kw = model_runtime_kwargs(c)
    assert kw["use_pallas"] is True
    assert not caplog.records
