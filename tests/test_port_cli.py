"""Checkpoint interchange CLI: reference .pt <-> orbax roundtrip.

The NAME MAPPING itself is proven against the actual reference
implementation in tests/test_reference_port.py (slow tier). This quick-tier
test proves the whole-file conversion plumbing without the reference:
export_reference_state_dict is the exact inverse of
port_reference_state_dict, a synthesized reference *_model.pt imports into
an orbax checkpoint that restore_checkpoint + the drivers' rebuild path
consume with identical logits, and the exporter writes a .pt with the
reference's checkpoint schema (reference train.py:359-367).
"""

import numpy as np
import pytest

import jax

from dualvgr_tpu import train_lib
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu.utils import port_reference
from dualvgr_tpu.utils.checkpoint import load_model_kwargs, restore_checkpoint

TINY = dict(
    vision_dim=24,
    module_dim=16,
    word_dim=8,
    question_vocab_size=30,
    num_answers=10,
    num_of_nodes=4,
    graph_layers=1,
    unit_layers=1,
)

REF_KWARG_KEYS = (
    "vision_dim", "module_dim", "word_dim", "num_of_nodes",
    "graph_module", "graph_layers",
)


def _tiny_state(rng_seed=0):
    model = DualVGR(**TINY)
    example = (
        np.zeros((1, 4, 3, 24), np.float32),
        np.zeros((1, 4, 24), np.float32),
        np.ones((1, 5), np.int32),
        np.asarray([5], np.int32),
    )
    opt = train_lib.make_optimizer(1e-3, 1)
    state = train_lib.create_train_state(model, jax.random.PRNGKey(rng_seed), example, opt)
    return model, state


def _logits(model, params, batch_stats, batch):
    app, mot, q, qlen = batch
    out = model.apply(
        {"params": params, "batch_stats": batch_stats}, app, mot, q, qlen, train=False
    )
    return np.asarray(out[0])


@pytest.fixture(scope="module")
def batch(rng_module):
    r = rng_module
    app = r.randn(3, 4, 3, 24).astype(np.float32)
    mot = r.randn(3, 4, 24).astype(np.float32)
    q = r.randint(1, 30, (3, 5)).astype(np.int32)
    qlen = np.asarray([5, 3, 1], np.int32)
    return app, mot, q, qlen


@pytest.fixture(scope="module")
def rng_module():
    return np.random.RandomState(7)


def _fake_reference_pt(state, path, epoch=7):
    """Synthesize a reference *_model.pt from a live state via the exporter."""
    import torch

    sd = port_reference.export_reference_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)}
    )
    ref_sd = {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}
    model_kwargs = {k: TINY[k] for k in REF_KWARG_KEYS if k in TINY}
    model_kwargs["graph_module"] = "GAT"
    torch.save(
        {"epoch": epoch, "state_dict": ref_sd, "optimizer": None,
         "model_kwargs": model_kwargs},
        path,
    )


@pytest.mark.slow
def test_export_is_exact_inverse_of_import(batch):
    """flax -> reference names -> flax reproduces every leaf bit-exactly."""
    model, state = _tiny_state()
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    sd = port_reference.export_reference_state_dict(variables)
    back = port_reference.port_reference_state_dict(sd, unit_layers=1, graph_layers=1)
    flat_a = jax.tree_util.tree_flatten_with_path(variables)[0]
    flat_b = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_flatten_with_path(back)[0]}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        np.testing.assert_array_equal(np.asarray(v), flat_b[jax.tree_util.keystr(k)])


@pytest.mark.slow
def test_import_cli_roundtrip(tmp_path, batch):
    """Synthesized reference .pt -> orbax ckpt -> driver-style restore ->
    identical logits; epoch and model_kwargs survive."""
    model, state = _tiny_state()
    pt = str(tmp_path / "ref_model.pt")
    _fake_reference_pt(state, pt, epoch=7)

    ckpt_dir = str(tmp_path / "ckpt")
    port_reference.main(["import", pt, ckpt_dir])

    kw = load_model_kwargs(ckpt_dir)
    assert kw["unit_layers"] == 1 and kw["num_of_nodes"] == 4
    assert kw["module_dim"] == 16 and kw["graph_module"] == "GAT"

    # the drivers' rebuild path: fresh state of the same architecture,
    # then restore into it (validate.py:67-86)
    model2, fresh = _tiny_state(rng_seed=99)
    epoch, restored = restore_checkpoint(ckpt_dir, fresh)
    assert epoch == 7
    want = _logits(model, jax.device_get(state.params),
                   jax.device_get(state.batch_stats), batch)
    got = _logits(model2, restored.params, restored.batch_stats, batch)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_export_cli_writes_reference_schema(tmp_path):
    """orbax -> reference .pt: reference checkpoint schema, strict key set."""
    import torch

    model, state = _tiny_state()
    pt = str(tmp_path / "ref_model.pt")
    _fake_reference_pt(state, pt)
    ckpt_dir = str(tmp_path / "ckpt")
    port_reference.convert_reference_checkpoint(pt, ckpt_dir)

    out_pt = str(tmp_path / "exported.pt")
    port_reference.main(["export", ckpt_dir, out_pt])
    ckpt = torch.load(out_pt, map_location="cpu", weights_only=False)
    assert set(ckpt) == {"epoch", "state_dict", "optimizer", "model_kwargs"}
    assert set(ckpt["model_kwargs"]) == set(REF_KWARG_KEYS)
    orig = torch.load(pt, map_location="cpu", weights_only=False)["state_dict"]
    assert set(ckpt["state_dict"]) == set(orig)
    for k, v in orig.items():
        np.testing.assert_array_equal(ckpt["state_dict"][k].numpy(), v.numpy())


def test_import_infers_graph_layers_from_banks(tmp_path):
    """A bare state_dict with 2 GAT banks per unit must NOT be silently
    truncated to graph_layers=1 — the bank count is inferred from the
    acGCN key indices."""
    import torch

    from dualvgr_tpu import train_lib
    from dualvgr_tpu.models import DualVGR

    model = DualVGR(**{**TINY, "graph_layers": 2})
    example = (
        np.zeros((1, 4, 3, 24), np.float32),
        np.zeros((1, 4, 24), np.float32),
        np.ones((1, 5), np.int32),
        np.asarray([5], np.int32),
    )
    opt = train_lib.make_optimizer(1e-3, 1)
    state = train_lib.create_train_state(model, jax.random.PRNGKey(2), example, opt)
    sd = port_reference.export_reference_state_dict(
        {"params": jax.device_get(state.params),
         "batch_stats": jax.device_get(state.batch_stats)}
    )
    assert port_reference.infer_gat_banks(sd) == 2
    pt = str(tmp_path / "bare2.pt")
    torch.save({k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, pt)

    kw = port_reference.convert_reference_checkpoint(
        pt, str(tmp_path / "c"), num_of_nodes=4
    )
    assert kw["graph_layers"] == 2 and kw["unit_layers"] == 1

    # and a model_kwargs/weights contradiction is an error, not silence
    torch.save(
        {"state_dict": {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
         "model_kwargs": {"graph_layers": 1, "num_of_nodes": 4}},
        pt,
    )
    with pytest.raises(ValueError, match="banks"):
        port_reference.convert_reference_checkpoint(pt, str(tmp_path / "c2"))


def test_import_requires_num_of_nodes_when_absent(tmp_path):
    """Checkpoints without model_kwargs need --num_of_nodes, with a clear error."""
    import torch

    model, state = _tiny_state()
    pt = str(tmp_path / "bare.pt")
    _fake_reference_pt(state, pt)
    ckpt = torch.load(pt, map_location="cpu", weights_only=False)
    torch.save(ckpt["state_dict"], pt)  # bare state_dict, no kwargs

    with pytest.raises(ValueError, match="num_of_nodes"):
        port_reference.convert_reference_checkpoint(pt, str(tmp_path / "c1"))
    kw = port_reference.convert_reference_checkpoint(
        pt, str(tmp_path / "c2"), num_of_nodes=4
    )
    assert kw["num_of_nodes"] == 4 and kw["unit_layers"] == 1
