"""Speaker-verification losses: GE2E (softmax/contrast) + AngleProto.

Capability parity with /root/reference/TTS/speaker_encoder/losses.py:7-160.
Implemented as flax modules because both carry learnable (w, b) scale/offset.
Input layout: (N speakers, M utterances, D) d-vectors.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _cosine(a: Array, b: Array) -> Array:
    a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
    b = b / jnp.maximum(jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-8)
    return jnp.einsum("...d,...d->...", a, b)


class GE2ELoss(nn.Module):
    """(≙ GE2ELoss, losses.py:7-124)."""

    loss_method: str = "softmax"  # or "contrast"
    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, dvecs: Array) -> Array:
        N, M, D = dvecs.shape
        w = self.param("w", lambda k: jnp.asarray(self.init_w))
        b = self.param("b", lambda k: jnp.asarray(self.init_b))
        w = jnp.maximum(w, 1e-6)  # ≙ torch.clamp(self.w, 1e-6)

        centroids = dvecs.mean(axis=1)  # (N, D)
        # exclusive centroids per utterance: (sum - x) / (M - 1)
        excl = (dvecs.sum(axis=1, keepdims=True) - dvecs) / jnp.maximum(M - 1, 1)

        # cos sim matrix (N, M, N): utterance ij vs centroid k
        sim = _cosine(dvecs[:, :, None, :],
                      jnp.broadcast_to(centroids[None, None], (N, M, N, D)))
        own = _cosine(dvecs, excl)  # (N, M)
        eye = jnp.eye(N, dtype=bool)[:, None, :]
        sim = jnp.where(eye, own[:, :, None], sim)
        sim = w * sim + b

        if self.loss_method == "softmax":
            logp = jax.nn.log_softmax(sim, axis=-1)
            own_logp = jnp.take_along_axis(
                logp, jnp.arange(N)[:, None, None].repeat(M, 1), axis=2)[..., 0]
            return -own_logp.mean()
        # contrast
        sig = jax.nn.sigmoid(sim)
        own_sig = jnp.take_along_axis(
            sig, jnp.arange(N)[:, None, None].repeat(M, 1), axis=2)[..., 0]
        others = jnp.where(eye, -jnp.inf, sig)
        hardest = others.max(axis=-1)
        return (1.0 - own_sig + hardest).mean()


class AngleProtoLoss(nn.Module):
    """(≙ AngleProtoLoss, losses.py:126-160): last utterance is the query,
    the other M-1 form the prototype; cross-entropy over speakers."""

    init_w: float = 10.0
    init_b: float = -5.0

    @nn.compact
    def __call__(self, dvecs: Array) -> Array:
        N, M, D = dvecs.shape
        w = self.param("w", lambda k: jnp.asarray(self.init_w))
        b = self.param("b", lambda k: jnp.asarray(self.init_b))
        w = jnp.maximum(w, 1e-6)

        query = dvecs[:, -1]             # (N, D)
        proto = dvecs[:, :-1].mean(1)    # (N, D)
        sim = _cosine(query[:, None, :],
                      jnp.broadcast_to(proto[None], (N, N, D)))  # (N, N)
        sim = w * sim + b
        logp = jax.nn.log_softmax(sim, axis=-1)
        return -jnp.diagonal(logp).mean()
