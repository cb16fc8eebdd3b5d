"""Validation with per-question-type accuracy splits.

Behavioral port of the reference's ``validate`` (reference validate.py:23-235):

* MSVD-QA / MSRVTT-QA: 5-way buckets by the question's FIRST token —
  what/who/how/when/where, looked up through the vocab's inverted map
  (validate.py:61-80),
* SVQA: 15-way buckets by stored ``question_category`` id, named per the
  id->name map at validate.py:18-21,
* returns the same tuple orders as the reference (validate.py:226-235),
  with optional write_preds extras (decoded answer strings, ground truths,
  video/question ids — validate.py:133-146).

TPU-native: the forward is one jitted sharded eval step per batch; the
bucketing is vectorized numpy on host (the reference loops per sample).
Empty buckets return accuracy 0.0 instead of the reference's
ZeroDivisionError.
"""

from __future__ import annotations

import numpy as np

SVQA_CATEGORY_NAMES = [
    "count", "exist", "query_color", "query_size", "query_actiontype",
    "query_direction", "query_shape", "compare_more", "compare_equal",
    "compare_less", "attribute_compare_color", "attribute_compare_size",
    "attribute_compare_actiontype", "attribute_compare_direction",
    "attribute_compare_shape",
]

MSVD_BUCKETS = ["what", "who", "how", "when", "where"]


def _safe_div(a, b):
    return float(a) / float(b) if b else 0.0


def _prefetch_pairs(pair_iter, mesh):
    """Device-prefetch the input tuples of (inputs, host_batch) pairs."""
    from dualvgr_tpu.parallel.mesh import shard_batch

    import collections

    buf = collections.deque()
    it = iter(pair_iter)

    def enqueue():
        try:
            inputs, b = next(it)
            buf.append((shard_batch(inputs, mesh), b))
            return True
        except StopIteration:
            return False

    for _ in range(2):
        if not enqueue():
            break
    while buf:
        item = buf.popleft()
        enqueue()
        yield item


def validate(cfg, eval_fn, state, loader, write_preds: bool = False, mesh=None):
    """Run a full eval pass.

    eval_fn(state, (app, motion, question, qlen)) -> logits (B, A) or
    already-argmaxed predictions (B,) (jit_pred_step — preferred: only B
    ints cross the host boundary per batch). Batches come from a
    VideoQADataLoader; padded rows (valid == 0) are excluded from all
    counts. Returns reference-ordered tuples (validate.py:226-235).
    """
    name = cfg.dataset.name
    all_agree, all_preds_idx, all_gts_idx = [], [], []
    all_first_tok, all_cats, all_vids, all_qids = [], [], [], []

    def host_inputs():
        for b in loader:
            yield (b.appearance_feat, b.motion_feat, b.question, b.question_len), b

    batches = _prefetch_pairs(host_inputs(), mesh) if mesh is not None else host_inputs()

    for inputs, batch in batches:
        out = np.asarray(eval_fn(state, inputs))
        preds = out.argmax(1) if out.ndim == 2 else out
        keep = batch.valid > 0
        all_agree.append((preds == batch.answer)[keep])
        all_preds_idx.append(preds[keep])
        all_gts_idx.append(batch.answer[keep])
        all_first_tok.append(batch.question[keep, 0])
        if batch.question_category is not None:
            all_cats.append(batch.question_category[keep])
        all_vids.append(batch.video_idx[keep])
        all_qids.append(batch.question_idx[keep])

    agree = np.concatenate(all_agree)
    acc = _safe_div(agree.sum(), len(agree))

    if name in ("msvd-qa", "msrvtt-qa"):
        # first-token bucketing through the vocab (validate.py:61-80)
        itos = loader.vocab["question_idx_to_token"]
        first = np.concatenate(all_first_tok)
        cat_accs = []
        for word in MSVD_BUCKETS:
            mask = np.asarray([itos.get(int(t)) == word for t in first])
            cat_accs.append(_safe_div(agree[mask].sum(), mask.sum()))
    else:
        cats = np.concatenate(all_cats)
        cat_accs = [
            _safe_div(agree[cats == c].sum(), (cats == c).sum()) for c in range(15)
        ]

    if not write_preds:
        return (acc, *cat_accs)

    answer_vocab = loader.vocab["answer_idx_to_token"]
    preds_idx = np.concatenate(all_preds_idx)
    gts_idx = np.concatenate(all_gts_idx)
    all_pred_strs = [answer_vocab[int(p)] for p in preds_idx]
    gt_strs = [answer_vocab[int(g)] for g in gts_idx]
    v_ids = [int(v) for v in np.concatenate(all_vids)]
    q_ids = [int(q) for q in np.concatenate(all_qids)]
    return (acc, all_pred_strs, gt_strs, v_ids, q_ids, *cat_accs)


def category_names(dataset_name: str):
    return MSVD_BUCKETS if dataset_name in ("msvd-qa", "msrvtt-qa") else SVQA_CATEGORY_NAMES
