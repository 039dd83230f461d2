"""Adversarial + contrastive (InfoNCE) losses.

Re-design of the loss functions in `GanTrainer.py:221-451` for NHWC JAX.
All functions are pure and jittable; the TMQI-ranked variants run the
naturalness score on device (vs the reference's per-step CPU scipy sync).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from uncltmo_tpu.metrics.tmqi import batched_naturalness
from uncltmo_tpu.ops.windows import contrast_map


def contrastive_d_loss(real_logits: jnp.ndarray,
                       fake_logits: jnp.ndarray) -> jnp.ndarray:
    """Relativistic pairwise cross-entropy (`GanTrainer.py:221-231`).

    Each real logit competes against every fake logit (and vice versa with
    signs flipped): loss_half(t1, t2) = mean_i CE([t1_i, t2_0..t2_m], 0).
    """
    r = real_logits.reshape(-1)
    f = fake_logits.reshape(-1)

    def loss_half(t1, t2):
        logits = jnp.concatenate(
            [t1[:, None], jnp.broadcast_to(t2[None, :],
                                           (t1.shape[0], t2.shape[0]))],
            axis=1)
        return jnp.mean(jax.nn.logsumexp(logits, axis=1) - t1)

    return loss_half(r, f) + loss_half(-f, -r)


def _similarity(a: jnp.ndarray, b: jnp.ndarray, k: float,
                c: float) -> jnp.ndarray:
    """sum_ch (a*b) / (c + k|a-b|), then spatial mean -> (B,)
    (`GanTrainer.py:421-430`).  NHWC feature maps."""
    s = jnp.sum(a * b * (1.0 / (c + k * jnp.abs(a - b))), axis=-1)
    return jnp.mean(s, axis=(1, 2))


def lmcl_loss(pos: jnp.ndarray, negs: jnp.ndarray) -> jnp.ndarray:
    """Large-margin cosine-style contrastive loss (`GanTrainer.py:441-451`):
    -log(exp(pos) / sum_j exp(neg_j)), mean over the batch.  Unlike InfoNCE
    the positive is NOT in the denominator.  pos: (B,), negs: (B, K).
    Computed as logsumexp(negs) - pos (exactly the reference's value,
    without its exp overflow)."""
    return jnp.mean(jax.nn.logsumexp(negs, axis=1) - pos)


def nce(fea_anchor: jnp.ndarray, fea_positive: jnp.ndarray,
        fea_negative: jnp.ndarray, k: float, c: float,
        loss_type: str = "InfoNCE") -> jnp.ndarray:
    """Contrastive loss over one positive and one negative similarity
    (`GanTrainer.py:411-440`).  loss_type selects InfoNCE (published; all
    reference call sites hardcode it) or LMCL (`GanTrainer.py:434-436`)."""
    pos = _similarity(fea_anchor, fea_positive, k, c)
    neg = _similarity(fea_anchor, fea_negative, k, c)
    if loss_type == "LMCL":
        return lmcl_loss(pos, neg[:, None])
    if loss_type != "InfoNCE":
        raise ValueError(f"unknown cl_loss_type {loss_type!r} "
                         "(InfoNCE or LMCL)")
    logits = jnp.stack([pos, neg], axis=1)
    return jnp.mean(jax.nn.logsumexp(logits, axis=1) - pos)


def info_nce2(fea_fake: jnp.ndarray, fake: jnp.ndarray, k: float,
              c: float, loss_type: str = "InfoNCE") -> jnp.ndarray:
    """TMQI-naturalness-ranked in-batch contrastive (`GanTrainer.py:385-409`).

    The best-N sample's features are the positive, the worst-N the negative.
    The ranking itself is non-differentiable (reference scores detached CPU
    copies); here it's an on-device argmax over stop_gradient'ed scores.
    """
    scores = batched_naturalness(
        jax.lax.stop_gradient(fake[..., 0]) * 255.0)
    i_best = jnp.argmax(scores)
    i_worst = jnp.argmin(scores)
    b = fea_fake.shape[0]
    fea_pos = jnp.broadcast_to(fea_fake[i_best][None], fea_fake.shape)
    fea_neg = jnp.broadcast_to(fea_fake[i_worst][None], fea_fake.shape)
    return nce(fea_fake, fea_pos, fea_neg, k, c, loss_type)


def _spatial_mean(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2))


def mean_brightness_l1(fake: jnp.ndarray, ldr_pos: jnp.ndarray) -> jnp.ndarray:
    """L1 between per-image mean luminances (`GanTrainer.py:308`)."""
    return jnp.mean(jnp.abs(_spatial_mean(fake) - _spatial_mean(ldr_pos)))


def mean_contrast_l1(fake: jnp.ndarray, ldr_pos: jnp.ndarray) -> jnp.ndarray:
    """L1 between per-image mean local-contrast maps
    (`GanTrainer.py:309-312`)."""
    return jnp.mean(jnp.abs(_spatial_mean(contrast_map(fake))
                            - _spatial_mean(contrast_map(ldr_pos))))


def pseudo_label_loss(fake: jnp.ndarray, split: int = 2) -> jnp.ndarray:
    """TMQI-ranked patch pseudo-label loss (`GanTrainer.py:340-369`).

    Splits each fake into split^2 patches, scores naturalness per patch,
    takes the best patch as pseudo label, and pulls every patch's mean
    brightness and mean contrast toward it.  (The reference computes the
    scores with B*split^2 CPU scipy TMQI calls per step.)
    """
    b, h, w, _ = fake.shape
    ps = h // split
    patches = fake.reshape(b, split, ps, split, ps, 1)
    patches = patches.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ps, ps, 1)
    scores = batched_naturalness(
        jax.lax.stop_gradient(patches[..., 0]) * 255.0)
    best = jnp.argmax(scores)
    pseudo = patches[best][None]

    m = _spatial_mean(patches)                       # (P, 1)
    m_p = _spatial_mean(pseudo)                      # (1, 1)
    loss = jnp.mean(jnp.abs(m - m_p))
    cm = _spatial_mean(contrast_map(patches))
    cm_p = _spatial_mean(contrast_map(pseudo))
    loss = loss + jnp.mean(jnp.abs(cm - cm_p))
    return loss


def tv_loss(x: jnp.ndarray) -> jnp.ndarray:
    """Total variation (`GanTrainer.py:669-682`), NHWC."""
    b, h, w, _ = x.shape
    count_h = (h - 1) * w
    count_w = h * (w - 1)
    h_tv = jnp.sum(jnp.square(x[:, 1:] - x[:, :-1]))
    w_tv = jnp.sum(jnp.square(x[:, :, 1:] - x[:, :, :-1]))
    return 2.0 * (h_tv / count_h + w_tv / count_w) / b
