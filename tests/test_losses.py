"""Loss parity tests against direct (unfused) reference formulations."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uncltmo_tpu.losses import adversarial as adv
from uncltmo_tpu.losses.struct import struct_loss_pyramid, struct_loss_single

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


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


def test_lmcl_loss_matches_reference_torch(rng):
    """LMCL (`GanTrainer.py:441-451`): -log(exp(pos)/sum_j exp(neg_j)),
    positive NOT in the denominator.  Oracle is the reference formula
    computed in torch exactly as lmcl_loss does (exp/ratio/log form)."""
    torch = pytest.importorskip("torch")
    b, kneg = 5, 3
    pos = rng.standard_normal((b, 1)).astype(np.float32)
    negs = rng.standard_normal((b, kneg)).astype(np.float32)
    pt, nt = torch.tensor(pos), torch.tensor(negs)
    ref = float(-torch.log(pt.exp()
                           / nt.exp().sum(dim=1, keepdim=True)).mean())
    mine = float(adv.lmcl_loss(jnp.asarray(pos[:, 0]), jnp.asarray(negs)))
    assert mine == pytest.approx(ref, rel=1e-5)


def test_nce_lmcl_variant(rng):
    """nce(loss_type='LMCL') must equal mean(neg_sim - pos_sim) for the
    single-negative case (lmcl's denominator holds only the negative)."""
    a = rng.random((4, 1, 1, 2)).astype(np.float32)
    p = rng.random((4, 1, 1, 2)).astype(np.float32)
    n = rng.random((4, 1, 1, 2)).astype(np.float32)
    k, c = 1.0, 1e-2

    def sim(x, y):
        s = (x * y / (c + k * np.abs(x - y))).sum(-1)
        return s.mean((1, 2))

    ref = float(np.mean(sim(a, n) - sim(a, p)))
    mine = float(adv.nce(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                         k, c, loss_type="LMCL"))
    assert mine == pytest.approx(ref, rel=1e-4)
    with pytest.raises(ValueError):
        adv.nce(jnp.asarray(a), jnp.asarray(p), jnp.asarray(n), k, c,
                loss_type="typo")


def test_generator_loss_terms_lmcl_runs(rng):
    """The full stage-0 G loss mix is finite (and distinct from InfoNCE)
    under cl_loss_type='LMCL'."""
    from uncltmo_tpu.training.train_step import (LossConfig,
                                                 generator_loss_terms)
    b = 3
    fake = rng.random((b, 64, 64, 1)).astype(np.float32)
    fea = rng.random((b, 1, 1, 8)).astype(np.float32)
    d_logit = rng.standard_normal((b, 1)).astype(np.float32)
    d_fea = rng.random((b, 4, 4, 8)).astype(np.float32)
    ldr = rng.random((b, 64, 64, 1)).astype(np.float32)
    args = (jnp.asarray(fake), jnp.asarray(fea), jnp.asarray(d_logit),
            jnp.asarray(d_logit), jnp.asarray(d_fea), jnp.asarray(d_fea * 2),
            jnp.asarray(d_fea * 3), jnp.asarray(d_fea * 4), jnp.asarray(ldr))
    vals = {t: float(generator_loss_terms(
        0, LossConfig(cl_loss_type=t), *args)) for t in ("InfoNCE", "LMCL")}
    assert np.isfinite(vals["LMCL"])
    assert vals["LMCL"] != vals["InfoNCE"]


def test_tv_loss_matches_direct(rng):
    x = rng.random((2, 8, 9, 1)).astype(np.float32)
    h_tv = np.square(x[:, 1:] - x[:, :-1]).sum()
    w_tv = np.square(x[:, :, 1:] - x[:, :, :-1]).sum()
    ref = 2 * (h_tv / (7 * 9) + w_tv / (8 * 8)) / 2
    assert float(adv.tv_loss(jnp.asarray(x))) == pytest.approx(ref, rel=1e-5)


def _graded_images(rng, n, size):
    """Images with well-separated naturalness (distinct means/contrasts) so
    the TMQI-N ranking has no float32-vs-float64 tie ambiguity."""
    means = np.linspace(0.12, 0.78, n)
    spreads = np.linspace(0.08, 0.35, n)
    ims = [np.clip(m + s * (rng.random((size, size)) - 0.5), 0, 1)
           for m, s in zip(means, spreads)]
    return np.stack(ims).astype(np.float32)[..., None]   # (n, size, size, 1)


def _reference_n_scores(images_01):
    """Per-image statistical naturalness via the reference scipy TMQI
    (`TMQI.py:210-242`); the N term depends only on the LDR image."""
    import reference_shim
    ref_tmqi = reference_shim.import_reference_tmqi()
    t = ref_tmqi.TMQI()
    return [float(t._StatisticalNaturalness(im[..., 0].astype(np.float64)
                                            * 255.0))
            for im in images_01]


def test_pseudo_label_ranking_and_value_match_reference(rng):
    """On-device naturalness ranking must pick the SAME best patch as the
    reference's per-patch scipy loop (`GanTrainer.py:340-369`), and the
    loss value must match the torch computation."""
    torch = pytest.importorskip("torch")
    import reference_shim
    from uncltmo_tpu.metrics.tmqi import batched_naturalness

    assert reference_shim.install()
    from models.Discriminator import ContrastExtracter

    split, ps, b = 2, 128, 2
    patches_np = _graded_images(rng, b * split * split, ps)   # (8,128,128,1)
    # assemble the (B, 256, 256, 1) fakes whose (j, k) patch grid flattens
    # back to patches_np in the reference's i/j/k loop order
    fake_np = patches_np.reshape(b, split, split, ps, ps, 1) \
                        .transpose(0, 1, 3, 2, 4, 5).reshape(b, 256, 256, 1)

    ref_scores = _reference_n_scores(patches_np)
    mine_scores = np.asarray(batched_naturalness(
        jnp.asarray(patches_np[..., 0]) * 255.0))
    assert int(np.argmax(mine_scores)) == int(np.argmax(ref_scores))
    assert [int(i) for i in np.argsort(mine_scores)] == \
        [int(i) for i in np.argsort(ref_scores)]

    # reference loss value (torch, `GanTrainer.py:359-369`)
    pt = torch.tensor(patches_np.transpose(0, 3, 1, 2))      # (P,1,ps,ps)
    pseudo = pt[int(np.argmax(ref_scores))][None].repeat(len(pt), 1, 1, 1)
    l1 = torch.nn.L1Loss()
    ref_loss = l1(pt.mean(dim=[-1, -2]), pseudo.mean(dim=[-1, -2]))
    ce = ContrastExtracter()
    ref_loss = ref_loss + l1(ce(pt).mean(dim=[-1, -2]),
                             ce(pseudo).mean(dim=[-1, -2]))

    mine = float(jax.jit(adv.pseudo_label_loss)(jnp.asarray(fake_np)))
    assert mine == pytest.approx(float(ref_loss), rel=1e-3)


def test_info_nce2_ranking_and_value_match_reference(rng):
    """On-device best/worst image selection + NCE value must match the
    reference's scipy-ranked torch computation (`GanTrainer.py:385-440`)."""
    torch = pytest.importorskip("torch")
    import reference_shim
    assert reference_shim.install()
    import torch.nn.functional as F

    b, k, c = 4, 1.0, 1e-2
    fake_np = _graded_images(rng, b, 256)                     # (4,256,256,1)
    fea_np = rng.random((b, 4, 4, 8)).astype(np.float32)      # NHWC features

    ref_scores = _reference_n_scores(fake_np)
    i_best = int(np.argmax(ref_scores))
    i_worst = int(np.argmin(ref_scores))

    # reference nce (`GanTrainer.py:413-440`), NCHW torch
    fa = torch.tensor(fea_np.transpose(0, 3, 1, 2))
    fp = fa[i_best][None].repeat(b, 1, 1, 1)
    fn = fa[i_worst][None].repeat(b, 1, 1, 1)

    def sim(x, y):
        return torch.sum(x * y / (c + k * torch.abs(x - y)),
                         dim=1).mean(dim=[-1, -2]).unsqueeze(1)

    logits = torch.cat([sim(fa, fp), sim(fa, fn)], dim=1)
    ref_loss = float(F.cross_entropy(
        logits, torch.zeros(b, dtype=torch.long)))

    mine = float(jax.jit(
        lambda f, x: adv.info_nce2(f, x, k, c))(jnp.asarray(fea_np),
                                                jnp.asarray(fake_np)))
    assert mine == pytest.approx(ref_loss, rel=1e-3)
