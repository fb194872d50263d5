"""Tests for loss functions and evaluation metrics (closed-form numpy golden)."""

import jax.numpy as jnp
import numpy as np

from besskge_tpu.loss import (
    LogSigmoidLoss,
    MarginRankingLoss,
    SampledSoftmaxCrossEntropyLoss,
)
from besskge_tpu.metric import Evaluation

RNG = np.random.default_rng(0)
POS = RNG.normal(size=(8,)).astype(np.float32)
NEG = RNG.normal(size=(8, 5)).astype(np.float32)
W = np.full((8,), 1 / 8, np.float32)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_logsigmoid_loss_golden():
    loss = LogSigmoidLoss(margin=3.0, negative_adversarial_sampling=False)
    got = float(loss(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    pos_logs = np.log(_sigmoid(POS + 3.0))
    neg_logs = np.log(_sigmoid(-NEG - 3.0)).mean(-1)
    expected = -0.5 * np.sum(W * (pos_logs + neg_logs))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_logsigmoid_adversarial_weights():
    loss = LogSigmoidLoss(
        margin=1.0, negative_adversarial_sampling=True,
        negative_adversarial_scale=0.5,
    )
    got = float(loss(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    e = np.exp(0.5 * NEG)
    aw = e / e.sum(-1, keepdims=True)
    pos_logs = np.log(_sigmoid(POS + 1.0))
    neg_logs = (aw * np.log(_sigmoid(-NEG - 1.0))).sum(-1)
    expected = -0.5 * np.sum(W * (pos_logs + neg_logs))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_margin_ranking_loss_golden():
    loss = MarginRankingLoss(margin=2.0, negative_adversarial_sampling=False)
    got = float(loss(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    hinge = np.maximum(NEG - POS[:, None] + 2.0, 0.0).mean(-1)
    expected = np.sum(W * hinge)
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_sampled_softmax_loss_golden():
    n_entity = 1000
    loss = SampledSoftmaxCrossEntropyLoss(n_entity=n_entity)
    got = float(loss(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    corr = np.log(n_entity - 1) - np.log(NEG.shape[1])
    logits = np.concatenate([POS[:, None], NEG + corr], axis=-1)
    lse = np.log(np.exp(logits).sum(-1))
    expected = np.sum(W * (lse - logits[:, 0]))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_loss_scale():
    base = LogSigmoidLoss(margin=0.0, negative_adversarial_sampling=False)
    scaled = LogSigmoidLoss(
        margin=0.0, negative_adversarial_sampling=False, loss_scale=128.0
    )
    a = float(base(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    b = float(scaled(jnp.asarray(POS), jnp.asarray(NEG), jnp.asarray(W)))
    np.testing.assert_allclose(b, 128.0 * a, rtol=1e-6)


# ---------------------------------------------------------------- metrics


def test_ranks_modes():
    pos = jnp.asarray([1.0, 5.0])
    cand = jnp.asarray([[1.0, 2.0, 0.0], [0.0, 1.0, 2.0]])
    opt = Evaluation(["mrr"], mode="optimistic")
    pess = Evaluation(["mrr"], mode="pessimistic")
    avg = Evaluation(["mrr"], mode="average")
    np.testing.assert_array_equal(
        np.asarray(opt.ranks_from_scores(pos, cand)), [2.0, 1.0]
    )
    np.testing.assert_array_equal(
        np.asarray(pess.ranks_from_scores(pos, cand)), [3.0, 1.0]
    )
    np.testing.assert_array_equal(
        np.asarray(avg.ranks_from_scores(pos, cand)), [2.5, 1.0]
    )


def test_worst_rank_infty():
    pos = jnp.asarray([-5.0])
    cand = jnp.asarray([[0.0, 1.0, 2.0]])
    ev = Evaluation(["mrr"], mode="optimistic", worst_rank_infty=True)
    assert np.isinf(np.asarray(ev.ranks_from_scores(pos, cand))[0])
    ev2 = Evaluation(["mrr"], mode="optimistic", worst_rank_infty=False)
    np.testing.assert_array_equal(
        np.asarray(ev2.ranks_from_scores(pos, cand)), [4.0]
    )


def test_ranks_from_indices():
    ev = Evaluation(["mrr"], worst_rank_infty=False)
    gt = jnp.asarray([7, 3, 9])
    topk = jnp.asarray([[7, 1, 2], [5, 6, 3], [1, 2, 4]])
    ranks = np.asarray(ev.ranks_from_indices(gt, topk))
    np.testing.assert_array_equal(ranks, [1.0, 3.0, 4.0])
    ev_inf = Evaluation(["mrr"], worst_rank_infty=True)
    ranks = np.asarray(ev_inf.ranks_from_indices(gt, topk))
    assert np.isinf(ranks[2])


def test_metrics_parsing_and_reduction():
    ev = Evaluation(["mrr", "hits@1", "hits@3"], reduction="sum")
    ranks = jnp.asarray([1.0, 2.0, 4.0])
    out = ev.dict_metrics_from_ranks(ranks)
    np.testing.assert_allclose(float(out["mrr"]), 1.0 + 0.5 + 0.25)
    np.testing.assert_allclose(float(out["hits@1"]), 1.0)
    np.testing.assert_allclose(float(out["hits@3"]), 2.0)
    # Mask zeroes contributions.
    out = ev.dict_metrics_from_ranks(ranks, jnp.asarray([True, False, True]))
    np.testing.assert_allclose(float(out["mrr"]), 1.25)
    # Stacked layout.
    stacked = ev.stacked_metrics_from_ranks(ranks)
    assert stacked.shape == (1, 3)
