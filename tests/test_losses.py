"""Loss parity tests against direct (unfused) reference formulations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.losses import adversarial as adv
from uncltmo_tpu.losses.struct import struct_loss_pyramid, struct_loss_single


def _struct_loss_direct(fake, hdr, wsize=5, e2=1e-5):
    """Direct windowed computation of the reference struct loss
    (`models/struct_loss.py:57-104`): per-window standardization + MSE."""
    b, h, w, _ = fake.shape
    hp, wp = h - wsize + 1, w - wsize + 1
    terms = []
    for bi in range(b):
        x = fake[bi, :, :, 0]
        y = hdr[bi, :, :, 0]
        for i in range(hp):
            for j in range(wp):
                wx = x[i:i + wsize, j:j + wsize].ravel()
                wy = y[i:i + wsize, j:j + wsize].ravel()
                mux, muy = wx.mean(), wy.mean()
                vx = (wx * wx).mean() - mux ** 2
                vy = (wy * wy).mean() - muy ** 2
                sx = np.sqrt(max(vx, 0.0) + e2)
                sy = np.sqrt(max(vy, 0.0) + e2)
                nx = (wx - mux) / (sx + e2)
                ny = (wy - muy) / (sy + e2)
                terms.append(((nx - ny) ** 2).mean())
    return np.mean(terms)


def test_struct_loss_fused_equals_direct(rng):
    fake = rng.random((2, 12, 14, 1)).astype(np.float32)
    hdr = rng.random((2, 12, 14, 1)).astype(np.float32)
    direct = _struct_loss_direct(fake, hdr)
    fused = float(jax.jit(struct_loss_single)(jnp.asarray(fake),
                                              jnp.asarray(hdr)))
    assert fused == pytest.approx(direct, rel=1e-4)


def test_struct_loss_matches_reference_torch(rng):
    """End-to-end check vs the reference StructLoss module."""
    torch = pytest.importorskip("torch")
    import reference_shim
    reference_shim.install()
    from models import struct_loss as ref_sl

    fake = rng.random((2, 64, 64, 1)).astype(np.float32)
    hdr = rng.random((2, 64, 64, 1)).astype(np.float32)
    weights = [0.2, 0.4, 0.6]
    mod = ref_sl.StructLoss(pyramid_weight_list=weights, window_size=5,
                            crop_input=False)
    ref = float(mod(torch.tensor(fake.transpose(0, 3, 1, 2)),
                    None, torch.tensor(hdr.transpose(0, 3, 1, 2)),
                    torch.tensor(weights)))
    mine = float(jax.jit(lambda a, b: struct_loss_pyramid(a, b, weights))(
        jnp.asarray(fake), jnp.asarray(hdr)))
    assert mine == pytest.approx(ref, rel=1e-3)


def test_contrastive_d_loss_matches_torch(rng):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    r = rng.standard_normal(6).astype(np.float32)
    f = rng.standard_normal(6).astype(np.float32)

    def loss_half(t1, t2):
        t1 = t1.reshape(-1, 1)
        t2 = t2.expand(t1.shape[0] if False else t1.shape[0], -1) \
            if t2.dim() > 1 else t2.repeat(t1.shape[0], 1)
        t = torch.cat((t1, t2), dim=-1)
        return F.cross_entropy(t, torch.zeros(t1.shape[0], dtype=torch.long))

    rt, ft = torch.tensor(r), torch.tensor(f)
    ref = float(loss_half(rt, ft) + loss_half(-ft, -rt))
    mine = float(adv.contrastive_d_loss(jnp.asarray(r), jnp.asarray(f)))
    assert mine == pytest.approx(ref, rel=1e-5)


def test_nce_matches_direct(rng):
    a = rng.random((4, 1, 1, 2)).astype(np.float32)
    p = rng.random((4, 1, 1, 2)).astype(np.float32)
    n = rng.random((4, 1, 1, 2)).astype(np.float32)
    k, c = 1.0, 1e-2

    def sim(x, y):
        s = (x * y / (c + k * np.abs(x - y))).sum(-1)
        return s.mean((1, 2))

    pos, neg = sim(a, p), sim(a, n)
    logits = np.stack([pos, neg], 1).astype(np.float64)
    ce = np.mean(np.log(np.exp(logits).sum(1)) - logits[:, 0])
    mine = float(adv.nce(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), k, c))
    assert mine == pytest.approx(ce, rel=1e-4)


def test_tv_loss_matches_direct(rng):
    x = rng.random((2, 8, 9, 1)).astype(np.float32)
    h_tv = np.square(x[:, 1:] - x[:, :-1]).sum()
    w_tv = np.square(x[:, :, 1:] - x[:, :, :-1]).sum()
    ref = 2 * (h_tv / (7 * 9) + w_tv / (8 * 8)) / 2
    assert float(adv.tv_loss(jnp.asarray(x))) == pytest.approx(ref, rel=1e-5)


def test_pseudo_label_loss_runs(rng):
    fake = jnp.asarray(rng.random((2, 256, 256, 1)).astype(np.float32))
    loss = jax.jit(adv.pseudo_label_loss)(fake)
    assert np.isfinite(float(loss))


def test_info_nce2_prefers_best(rng):
    fake = jnp.asarray(rng.random((4, 256, 256, 1)).astype(np.float32))
    fea = jnp.asarray(rng.random((4, 1, 1, 8)).astype(np.float32))
    loss = jax.jit(lambda f, x: adv.info_nce2(f, x, 1.0, 1e-2))(fea, fake)
    assert np.isfinite(float(loss))
