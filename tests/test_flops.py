"""Cross-check the analytic FLOPs model against XLA's HLO cost analysis.

The analytic model (dualvgr_tpu/utils/flops.py) counts every dense
contraction at its true trip count. XLA's cost analysis counts a
``lax.scan``/while-loop body ONCE (times the unroll factor), so it
undercounts the LSTM recurrent matmuls by a factor of steps/unroll; the
test subtracts exactly that known undercount before comparing. XLA also
counts elementwise/softmax work the analytic model deliberately omits, so
the corrected ratio sits slightly below 1.
"""

import jax
import numpy as np
import pytest

from dualvgr_tpu.models import DualVGR
from dualvgr_tpu.ops.lstm import SCAN_UNROLL
from dualvgr_tpu.utils.flops import dualvgr_forward_flops, dualvgr_train_flops


@pytest.fixture(scope="module")
def shapes():
    return dict(
        vision_dim=256, module_dim=128, word_dim=64, num_answers=50,
        num_of_nodes=8, frames_per_clip=8, q_len=16,
        unit_layers=2, graph_layers=1,
    )


def _example(shapes, b):
    rng = np.random.RandomState(0)
    s = shapes
    app = rng.randn(b, s["num_of_nodes"], s["frames_per_clip"], s["vision_dim"]).astype(np.float32)
    mot = rng.randn(b, s["num_of_nodes"], s["vision_dim"]).astype(np.float32)
    q = rng.randint(1, 100, (b, s["q_len"])).astype(np.int32)
    qlen = rng.randint(2, s["q_len"] + 1, (b,)).astype(np.int32)
    for i in range(b):
        q[i, qlen[i]:] = 0
    return app, mot, q, qlen


def test_forward_flops_match_xla_cost_analysis(shapes):
    b = 16
    s = shapes
    model = DualVGR(
        vision_dim=s["vision_dim"], module_dim=s["module_dim"],
        word_dim=s["word_dim"], question_vocab_size=100,
        num_answers=s["num_answers"], num_of_nodes=s["num_of_nodes"],
        graph_layers=s["graph_layers"], unit_layers=s["unit_layers"],
    )
    app, mot, q, qlen = _example(shapes, b)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        app[:1], mot[:1], q[:1], qlen[:1], train=False,
    )

    def fn(variables, app, mot, q, qlen):
        return model.apply(variables, app, mot, q, qlen, train=False).logits

    compiled = jax.jit(fn).lower(variables, app, mot, q, qlen).compile()
    xla_flops = compiled.cost_analysis()["flops"]

    analytic = b * dualvgr_forward_flops(**shapes)

    # XLA counts each scan body once x unroll: subtract the recurrence
    # flops it never sees. Per step per direction: 2 * 4h * h.
    h = s["module_dim"] // 2
    per_step_dir = 2.0 * 4 * h * h
    t, f, c = s["q_len"], s["frames_per_clip"], s["num_of_nodes"]
    undercount = b * (
        2 * 2 * t * per_step_dir * (1 - SCAN_UNROLL / t)  # two text BiLSTMs
        + c * 2 * f * per_step_dir * (1 - SCAN_UNROLL / f)  # appearance BiLSTM
    )
    corrected = analytic - undercount
    ratio = corrected / xla_flops
    assert 0.93 <= ratio <= 1.03, (analytic, corrected, xla_flops, ratio)


def test_flagship_flops_magnitude():
    """Flagship MSRVTT config: appearance BiLSTM dominates (~85%)."""
    f = dualvgr_forward_flops(
        vision_dim=2048, module_dim=768, word_dim=300, num_answers=4000,
        num_of_nodes=16, frames_per_clip=16, q_len=24,
        unit_layers=1, graph_layers=1,
    )
    assert 3e9 < f < 8e9, f
    assert dualvgr_train_flops(
        vision_dim=2048, module_dim=768, word_dim=300, num_answers=4000,
        num_of_nodes=16, frames_per_clip=16, q_len=24,
        unit_layers=1, graph_layers=1,
    ) == 3.0 * f
