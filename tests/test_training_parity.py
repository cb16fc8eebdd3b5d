"""Training-math parity vs torch: with identical weights and data, the full
loss (CE + alpha*common + beta*HSIC), its gradients, the global-norm clip,
and Adam produce the same parameter trajectory in both frameworks.

Dropout is disabled on both sides (deterministic forward; it's the only
stochastic element) and BatchNorm runs in eval mode so batch statistics
don't mix into the comparison — the point is the optimization math:
losses (reference utils.py:10-31, train.py:146-154), clip 12
(train.py:158), Adam lr (train.py:85).
"""

import pytest

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from benchmarks.torch_twin import TorchDualVGR, load_flax_params
from dualvgr_tpu.models import DualVGR
from dualvgr_tpu.ops.losses import dualvgr_total_loss

pytestmark = pytest.mark.slow

ALPHA, BETA, LR = 0.8, 1e-6, 1e-3


def torch_total_loss(twin, app, mot, q, qlen, ans, num_nodes):
    logits, com_app, com_mot, aq, mq = twin(app, mot, q, qlen, return_aux=True)
    loss = torch.nn.functional.cross_entropy(logits, ans)
    t = len(aq)
    dep, com = 0.0, 0.0
    for i in range(t):
        for e1, e2 in ((aq[i], com_app[i]), (mq[i], com_mot[i])):
            r = torch.eye(num_nodes) - torch.ones(num_nodes, num_nodes) / num_nodes
            k1 = torch.bmm(e1, e1.transpose(1, 2))
            k2 = torch.bmm(e2, e2.transpose(1, 2))
            ans_m = torch.bmm(torch.bmm(r.expand_as(k1), k1), torch.bmm(r.expand_as(k2), k2))
            dep = dep + sum(torch.trace(ans_m[b]) for b in range(ans_m.size(0)))
        e1 = com_app[i] - com_app[i].mean(dim=1, keepdim=True)
        e2 = com_mot[i] - com_mot[i].mean(dim=1, keepdim=True)
        e1 = torch.nn.functional.normalize(e1, p=2, dim=2)
        e2 = torch.nn.functional.normalize(e2, p=2, dim=2)
        c1 = torch.bmm(e1, e1.transpose(1, 2))
        c2 = torch.bmm(e2, e2.transpose(1, 2))
        com = com + torch.mean((c1 - c2) ** 2)
    return loss + ALPHA * com / t + BETA * dep / t


def test_two_training_steps_match_torch(rng):
    dims = dict(
        vision_dim=14, module_dim=16, word_dim=10, num_of_nodes=4,
        graph_layers=1, unit_layers=1,
    )
    vocab_size, num_answers = 22, 9
    b, c, f, t = 6, 4, 3, 7
    app = rng.randn(b, c, f, 14).astype(np.float32)
    mot = rng.randn(b, c, 14).astype(np.float32)
    q = rng.randint(1, vocab_size, (b, t)).astype(np.int32)
    qlen = rng.randint(1, t + 1, (b,)).astype(np.int32)
    ans = rng.randint(0, num_answers, (b,)).astype(np.int32)

    model = DualVGR(question_vocab_size=vocab_size, num_answers=num_answers, **dims)
    variables = model.init(
        {"params": jax.random.PRNGKey(11), "dropout": jax.random.PRNGKey(0)},
        app, mot, q, qlen, train=False,
    )
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    twin = TorchDualVGR(vocab_size=vocab_size, num_answers=num_answers, **dims)
    load_flax_params(twin, params, batch_stats)
    twin.train()  # grads on; BN uses batch stats in torch train mode...
    twin.bn.eval()  # ...so pin BN to eval on both sides

    # ---- JAX side: deterministic forward (train=False), full loss
    opt = optax.chain(optax.clip_by_global_norm(12.0), optax.adam(LR))
    opt_state = opt.init(params)

    def loss_fn(p):
        out = model.apply(
            {"params": p, "batch_stats": batch_stats}, app, mot, q, qlen, train=False
        )
        total, _ = dualvgr_total_loss(
            out.logits, ans, out.aq_fusion, out.com_app, out.mq_fusion,
            out.com_motion, alpha=ALPHA, beta=BETA, num_of_nodes=dims["num_of_nodes"],
        )
        return total

    # ---- torch side
    t_opt = torch.optim.Adam(twin.parameters(), lr=LR)
    t_app = torch.from_numpy(app)
    t_mot = torch.from_numpy(mot)
    t_q = torch.from_numpy(q.astype(np.int64))
    t_qlen = torch.from_numpy(qlen.astype(np.int64))
    t_ans = torch.from_numpy(ans.astype(np.int64))

    for step in range(2):
        loss_j, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

        t_opt.zero_grad()
        loss_t = torch_total_loss(twin, t_app, t_mot, t_q, t_qlen, t_ans, dims["num_of_nodes"])
        loss_t.backward()
        torch.nn.utils.clip_grad_norm_(twin.parameters(), max_norm=12)
        t_opt.step()

        np.testing.assert_allclose(
            float(loss_j), float(loss_t.detach()), rtol=2e-4,
            err_msg=f"loss mismatch at step {step}",
        )

    # parameter trajectories agree after two steps: spot-check several
    fresh = TorchDualVGR(vocab_size=vocab_size, num_answers=num_answers, **dims)
    load_flax_params(fresh, params, batch_stats)
    for name in ["classifier_out.weight", "motion_proj.weight", "embedding.weight",
                 "ac_gat.0.heads.0.W.weight", "concat_rnn.weight_ih_l0"]:
        a = dict(fresh.named_parameters())[name].detach().numpy()
        b_ = dict(twin.named_parameters())[name].detach().numpy()
        np.testing.assert_allclose(
            a, b_, atol=5e-5, err_msg=f"param {name} diverged after 2 Adam steps"
        )
