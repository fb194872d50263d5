"""Loss functions on positive/negative triple scores (device math, JAX).

Capability parity with reference ``besskge/loss.py:17-251``
(graphcore-research/bess-kge). Losses are always computed in FP32 — the
inputs are upcast here, which is the jit-visible equivalent of the
reference's ``poptorch.identity_loss``+cast rule (``bess.py:254-261``) —
with an optional ``loss_scale`` for low-precision training.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BaseLossFunction",
    "MarginBasedLossFunction",
    "LogSigmoidLoss",
    "MarginRankingLoss",
    "SampledSoftmaxCrossEntropyLoss",
]


class BaseLossFunction(ABC):
    """Base class; see reference ``besskge/loss.py:14-74``."""

    #: Use self-adversarial weighting of negative samples (:cite RotatE).
    negative_adversarial_sampling: bool
    #: Reciprocal temperature of self-adversarial weighting.
    negative_adversarial_scale: float
    #: Loss scaling factor (for fp16/bf16 training).
    loss_scale: float

    def get_negative_weights(self, negative_score: jnp.ndarray) -> jnp.ndarray:
        """Self-adversarial softmax weights (stop-gradient), or the uniform
        ``1/n_negative`` scalar."""
        if self.negative_adversarial_sampling:
            return jax.lax.stop_gradient(
                jax.nn.softmax(
                    self.negative_adversarial_scale * negative_score, axis=-1
                )
            )
        return jnp.asarray(1.0 / negative_score.shape[-1], jnp.float32)

    @abstractmethod
    def __call__(
        self,
        positive_score: jnp.ndarray,
        negative_score: jnp.ndarray,
        triple_weight: jnp.ndarray,
    ) -> jnp.ndarray:
        """Compute the (summed) batch loss.

        :param positive_score: (batch_size,) scores of positive triples.
        :param negative_score: (batch_size, n_negative) scores of negatives.
        :param triple_weight: (batch_size,) or () positive-triple weights.
        :return: () the batch loss.
        """
        raise NotImplementedError


class MarginBasedLossFunction(BaseLossFunction, ABC):
    """Base for margin losses (reference ``besskge/loss.py:77-106``)."""

    def __init__(
        self,
        margin: float,
        negative_adversarial_sampling: bool,
        negative_adversarial_scale: float = 1.0,
        loss_scale: float = 1.0,
    ) -> None:
        self.margin = float(margin)
        self.negative_adversarial_sampling = negative_adversarial_sampling
        self.negative_adversarial_scale = float(negative_adversarial_scale)
        self.loss_scale = float(loss_scale)


class LogSigmoidLoss(MarginBasedLossFunction):
    """RotatE-style log-sigmoid loss (reference ``besskge/loss.py:109-134``)."""

    def __call__(self, positive_score, negative_score, triple_weight):
        pos = positive_score.astype(jnp.float32)
        neg = negative_score.astype(jnp.float32)
        w = jnp.asarray(triple_weight, jnp.float32)
        neg_w = self.get_negative_weights(neg)
        pos_logs = jax.nn.log_sigmoid(pos + self.margin)
        neg_logs = jax.nn.log_sigmoid(-neg - self.margin)
        neg_reduced = jnp.sum(neg_w * neg_logs, axis=-1)
        return self.loss_scale * (-0.5) * jnp.sum(w * (pos_logs + neg_reduced))


class MarginRankingLoss(MarginBasedLossFunction):
    """Pairwise hinge loss (reference ``besskge/loss.py:137-195``)."""

    def __init__(
        self,
        margin: float,
        negative_adversarial_sampling: bool,
        negative_adversarial_scale: float = 1.0,
        loss_scale: float = 1.0,
        activation_function: str = "relu",
    ) -> None:
        super().__init__(
            margin,
            negative_adversarial_sampling,
            negative_adversarial_scale,
            loss_scale,
        )
        if activation_function != "relu":
            raise ValueError(
                f"Activation function {activation_function} not supported"
                " for MarginRankingLoss"
            )

    def __call__(self, positive_score, negative_score, triple_weight):
        pos = positive_score.astype(jnp.float32)
        neg = negative_score.astype(jnp.float32)
        w = jnp.asarray(triple_weight, jnp.float32)
        neg_w = self.get_negative_weights(neg)
        combined = jax.nn.relu(neg - pos[:, None] + self.margin)
        reduced = jnp.sum(neg_w * combined, axis=-1)
        return self.loss_scale * jnp.sum(w * reduced)


class SampledSoftmaxCrossEntropyLoss(BaseLossFunction):
    """Sampled softmax cross-entropy with the candidate-count correction
    ``log((n_entity−1)/n_negative)`` (reference ``besskge/loss.py:198-251``)."""

    def __init__(self, n_entity: int, loss_scale: float = 1.0) -> None:
        self.negative_adversarial_sampling = False
        self.negative_adversarial_scale = 0.0
        self.loss_scale = float(loss_scale)
        self.n_entity = n_entity

    def __call__(self, positive_score, negative_score, triple_weight):
        pos = positive_score.astype(jnp.float32)
        neg = negative_score.astype(jnp.float32)
        w = jnp.asarray(triple_weight, jnp.float32)
        # Correction is constant over negatives, zero for the target class.
        neg = neg + jnp.float32(
            np.log(self.n_entity - 1) - np.log(negative_score.shape[1])
        )
        logits = jnp.concatenate([pos[:, None], neg], axis=-1)
        # Cross entropy with target class 0.
        xent = jax.nn.logsumexp(logits, axis=-1) - logits[:, 0]
        return self.loss_scale * jnp.sum(w * xent)
