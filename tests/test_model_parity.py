"""Full-model numerical parity: flax DualVGR vs the independent torch twin.

Ports the flax-initialized weights into benchmarks/torch_twin.py and requires
eval-mode logits to agree — one test validating LSTM packing equivalence,
punishment-gating order, GAT softmax, SFGCN fusion, MFB factorization,
context attention, and BatchNorm inference in composition.
"""

import numpy as np
import pytest
import torch

import jax

from benchmarks.torch_twin import TorchDualVGR, load_flax_params
from dualvgr_tpu.models import DualVGR

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("unit_layers,graph_layers", [(1, 1), (2, 1), (2, 2)])
def test_full_model_logits_match_torch_twin(rng, unit_layers, graph_layers):
    dims = dict(
        vision_dim=20,
        module_dim=16,
        word_dim=10,
        num_of_nodes=5,
        graph_layers=graph_layers,
        unit_layers=unit_layers,
    )
    vocab_size, num_answers = 33, 14
    model = DualVGR(
        question_vocab_size=vocab_size, num_answers=num_answers, **dims
    )
    b, c, f, t = 6, 5, 4, 9
    app = rng.randn(b, c, f, 20).astype(np.float32)
    mot = rng.randn(b, c, 20).astype(np.float32)
    q = rng.randint(1, vocab_size, (b, t)).astype(np.int32)
    qlen = rng.randint(1, t + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0

    variables = model.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(0)},
        app, mot, q, qlen, train=False,
    )
    out = model.apply(variables, app, mot, q, qlen, train=False)
    got = np.asarray(out.logits)

    twin = TorchDualVGR(
        vocab_size=vocab_size, num_answers=num_answers, **dims
    ).eval()
    load_flax_params(twin, variables["params"], variables["batch_stats"])
    with torch.no_grad():
        want = twin(
            torch.from_numpy(app),
            torch.from_numpy(mot),
            torch.from_numpy(q.astype(np.int64)),
            torch.from_numpy(qlen.astype(np.int64)),
        ).numpy()

    np.testing.assert_allclose(got, want, atol=2e-4)


def test_every_parameter_is_consumed_by_twin(rng):
    """The twin must consume every flax param (no silently unported weights)."""
    model = DualVGR(
        vision_dim=12, module_dim=8, word_dim=6, question_vocab_size=20,
        num_answers=9, num_of_nodes=3, graph_layers=1, unit_layers=1,
    )
    b, c, f, t = 2, 3, 2, 4
    app = rng.randn(b, c, f, 12).astype(np.float32)
    mot = rng.randn(b, c, 12).astype(np.float32)
    q = np.ones((b, t), np.int32)
    qlen = np.full((b,), t, np.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        app, mot, q, qlen, train=False,
    )
    n_flax = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    twin = TorchDualVGR(
        vision_dim=12, module_dim=8, word_dim=6, vocab_size=20, num_answers=9,
        num_of_nodes=3, graph_layers=1, unit_layers=1,
    )
    # both sides carry torch's two LSTM bias vectors per direction
    n_torch = sum(p.numel() for p in twin.parameters())
    assert n_torch == n_flax
