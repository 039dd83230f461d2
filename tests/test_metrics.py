"""Warp error, FID math, BTMQI smoke/sanity tests."""
import os

import numpy as np
import pytest

# coffee-break tier: `pytest -m 'smoke and not slow'` (see pyproject.toml)
pytestmark = pytest.mark.smoke


def test_warp_error_identical_frames(rng):
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    frame = rng.random((128, 160, 3)).astype(np.float32)
    e1, e2 = compute_warp_error(frame, frame)
    assert e1 < 1e-4 and e2 < 1e-2


def test_warp_error_shifted_frames():
    """A small translation should be mostly compensated by the flow."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    rng = np.random.default_rng(7)  # local: independent of test order
    base = rng.random((160, 200))
    import cv2
    base = cv2.GaussianBlur(base.astype(np.float32), (0, 0), 1.5)
    base = (base - base.min()) / (base.max() - base.min())
    f0 = np.stack([base] * 3, -1)
    f1 = np.roll(f0, 8, axis=1)
    e1_flow, _ = compute_warp_error(f0, f1)
    e1_noflow = float(np.mean((f1[32:-32, 32:-32] - f0[32:-32, 32:-32]) ** 2))
    assert e1_flow < e1_noflow


def test_warp_error_rejects_unknown_or_unavailable_algo(rng):
    """Warp-error numbers are not comparable across flow backends, so a
    typo'd or unavailable estimator must raise, never silently substitute
    Farneback."""
    from uncltmo_tpu.metrics.warp_error import (_HAS_CV2,
                                                compute_warp_error)
    frame = rng.random((128, 160, 3)).astype(np.float32)
    with pytest.raises(ValueError, match="unknown flow algo"):
        compute_warp_error(frame, frame, algo="dis")
    if _HAS_CV2:
        import cv2
        if not hasattr(cv2, "optflow"):
            with pytest.raises(RuntimeError, match="DeepFlow"):
                compute_warp_error(frame, frame, algo="DeepFlow")


def test_frechet_distance_properties(rng):
    from uncltmo_tpu.metrics.fid import (activation_statistics,
                                         frechet_distance)
    a = rng.standard_normal((500, 16))
    mu, sig = activation_statistics(a)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-4)
    b = a + 3.0
    mu2, sig2 = activation_statistics(b)
    d = frechet_distance(mu, sig, mu2, sig2)
    assert d == pytest.approx(16 * 9.0, rel=0.05)  # ||mu diff||^2 dominates


def test_fid_patch_vector_protocol(rng):
    from uncltmo_tpu.metrics.fid import activations_to_patch_vectors
    acts = rng.standard_normal((3, 8, 8, 12)).astype(np.float32)
    v = activations_to_patch_vectors(acts)
    assert v.shape == (3 * 64, 12)
    np.testing.assert_array_equal(v[0], acts[0, 0, 0])
    np.testing.assert_array_equal(v[63], acts[0, 7, 7])


def test_fid_small_dset_variant(tmp_path, rng):
    """`fid_score_small_dset.py` protocol: the REAL side is min/max
    stretched (`:117-118`), the fake side untouched — the inverse of the
    main protocol's fake-side mean shift (`fid_score.py:135-141`)."""
    import cv2
    from uncltmo_tpu.metrics.fid import (calculate_fid_given_paths,
                                         load_fid_image)
    im = (rng.random((64, 64, 3)) * 200 + 20).astype(np.uint8)
    p = tmp_path / "im.png"
    cv2.imwrite(str(p), im)

    base = load_fid_image(str(p), False)
    main_fake = load_fid_image(str(p), fake_side=True)
    # main-protocol fake: stretched by its own max FIRST, then mean-shifted
    # toward 0.45 with alpha=0.8 (`fid_score.py:136-141`)
    x = base / base.max()
    np.testing.assert_allclose(
        main_fake, np.clip(x + 0.8 * (0.45 - x.mean()), 0, 1), atol=1e-6)
    sd_fake = load_fid_image(str(p), fake_side=True, small_dset=True)
    np.testing.assert_array_equal(sd_fake, load_fid_image(str(p), False))
    sd_real = load_fid_image(str(p), fake_side=False, small_dset=True)
    expect = np.clip((base - base.min()) / base.max() * 1.05 - 0.025, 0, 1)
    np.testing.assert_allclose(sd_real, expect, atol=1e-6)

    # end-to-end with a toy extractor: identical dirs under small_dset give
    # a small but NONZERO FID (the real side is stretched, the fake is not)
    real_d, fake_d = tmp_path / "real", tmp_path / "fake"
    real_d.mkdir(), fake_d.mkdir()
    for i in range(4):
        frame = (rng.random((64, 64, 3)) * 200 + 20).astype(np.uint8)
        cv2.imwrite(str(real_d / f"{i}.png"), frame)
        cv2.imwrite(str(fake_d / f"{i}.png"), frame)

    def extractor(batch):
        b = batch[:, :296, :296]                 # 299^2 -> 8x37 blocks
        pooled = b.reshape(b.shape[0], 8, 37, 8, 37, 3).mean(axis=(2, 4))
        return np.concatenate([pooled, pooled * pooled], axis=-1)

    d_small = calculate_fid_given_paths([str(real_d), str(fake_d)],
                                        extractor=extractor, small_dset=True)
    assert d_small > 1e-6
    d_main = calculate_fid_given_paths([str(real_d), str(fake_d)],
                                       extractor=extractor)
    assert d_main > 1e-6          # main shifts the fake side instead
    assert np.isfinite(d_small) and np.isfinite(d_main)


def test_btmqi_sanity(rng):
    from uncltmo_tpu.metrics.btmqi import btmqi
    good = np.clip(rng.normal(0.45, 0.2, (256, 256)), 0, 1)
    flat = np.full((256, 256), 0.02)
    s_good, f_good = btmqi(good)
    s_flat, f_flat = btmqi(flat)
    assert f_good.shape == (11,)
    assert s_good > s_flat  # detailed mid-tone image beats a flat dark one


_REF_MODEL_MAT = "/root/reference/metrics/BTMQI_metric/model.mat"


def test_svr_predict_exact_math(rng):
    """SVRModel.predict == hand-computed libsvm decision values."""
    from uncltmo_tpu.metrics.btmqi import SVRModel
    svs = rng.standard_normal((7, 11))
    coef = rng.standard_normal(7)
    gamma, rho = 1.0 / 11.0, -2.5
    model = SVRModel(svs, coef, rho, gamma)
    x = rng.standard_normal(11)
    expect = sum(c * np.exp(-gamma * np.sum((sv - x) ** 2))
                 for c, sv in zip(coef, svs)) - rho
    np.testing.assert_allclose(model.predict(x), expect, rtol=1e-12)
    batch = rng.standard_normal((3, 11))
    out = model.predict(batch)
    assert out.shape == (3,)
    np.testing.assert_allclose(out[0], model.predict(batch[0]), rtol=1e-12)


def test_btmqi_reference_svr_model(rng):
    """The reference's binary model.mat parses into the documented nu-SVR
    (81 SVs x 11 features, RBF gamma=1/11, rho=-6.2008) and produces
    finite scores on the published ~2..8 BTMQI scale for feature vectors
    inside the support-vector envelope."""
    if not os.path.exists(_REF_MODEL_MAT):
        pytest.skip("reference model.mat not present")
    from uncltmo_tpu.metrics.btmqi import btmqi, load_svr_model
    model = load_svr_model(_REF_MODEL_MAT)
    assert model.support_vectors.shape == (81, 11)
    assert abs(model.gamma - 1.0 / 11.0) < 1e-9
    assert abs(model.rho - (-6.2008)) < 1e-3
    # SV rows are points the trainer saw: predictions there must land in a
    # sane neighbourhood of the published score range (result.mat: 1.9-7.9)
    preds = model.predict(model.support_vectors)
    assert np.all(np.isfinite(preds))
    assert 0.0 < preds.mean() < 10.0, preds.mean()
    # end-to-end: reconstructed features through the real SVR
    im = np.clip(rng.normal(0.45, 0.2, (128, 128)), 0, 1)
    s, f = btmqi(im, model_mat=_REF_MODEL_MAT)
    assert np.isfinite(s)
    assert f.shape == (11,)


def test_btmqi_validation_corpus():
    """Measured behavior of the reconstructed-feature scorers on the
    deterministic distortion corpus (docs/BTMQI_VALIDATION.md): the
    surrogate RANKS distortion ladders correctly (with the measured
    slack); the reference SVR on reconstructed features collapses to
    ~-rho off the trained manifold and must NOT be trusted for ranking —
    this test pins both facts so a feature change that silently flips
    either behavior fails loudly."""
    from uncltmo_tpu.metrics.btmqi import load_svr_model
    from uncltmo_tpu.metrics.btmqi_validation import validate

    model = (load_svr_model(_REF_MODEL_MAT)
             if os.path.exists(_REF_MODEL_MAT) else None)
    r = validate(seeds=(0, 1), model=model, size=128)
    sweeps = r["sweeps"]
    # the surrogate orders exposure/gamma ladders (monotone >= measured
    # floor) and always puts the pristine render above severe distortion
    assert sweeps["under_exposure"]["surrogate"] >= 0.9
    assert sweeps["gamma_crush"]["surrogate"] >= 0.9
    assert sweeps["over_exposure"]["surrogate"] >= 0.6
    # at the test's 128px size the 4->8-pass blur tail saturates (adjacent
    # severities tie); the docs table uses 192px where this is 0.75
    assert sweeps["blur"]["surrogate"] >= 0.3
    assert sweeps["noise"]["surrogate"] >= 0.6
    assert r["spearman"]["surrogate/naturalness"] >= 0.7
    if model is not None:
        lo, hi = r["score_range"]["svr"]
        # the collapse: off-manifold predictions cluster near -rho=6.2
        # (docs/BTMQI_VALIDATION.md mechanism #2) — if this ever starts
        # failing the features moved ON manifold and the docs table and
        # CLI caveat must be re-measured, not loosened
        assert 4.0 < lo and hi < 9.5, (lo, hi)
        assert abs(r["spearman"]["surrogate/svr"]) < 1.0  # recorded
        assert sweeps["gamma_crush"]["svr"] <= 0.5, \
            "SVR became distortion-monotone: re-run the validation docs"


def _shifted_pair(shift=6, shape=(200, 240)):
    """Smooth textured frame + its horizontal translation."""
    import cv2
    rng = np.random.default_rng(11)
    base = cv2.GaussianBlur(
        rng.random(shape).astype(np.float32), (0, 0), 2.0)
    base = (base - base.min()) / (base.max() - base.min())
    f0 = np.stack([base] * 3, -1)
    f1 = np.roll(f0, shift, axis=1)
    return f0, f1


def test_warp_error_matches_reference_protocol():
    """compute_warp_error must equal a literal transcription of the
    reference's protocol (`Tester.py:378-390` + `:414-496`): flow =
    calc(frame0, frame1) on channel 0, remap frame1 by flow+grid, uint8/255,
    E1/E2 on a 32-px center crop."""
    import cv2
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    f0, f1 = _shifted_pair()

    u0 = (f0 * 255).clip(0, 255).astype(np.uint8)
    u1 = (f1 * 255).clip(0, 255).astype(np.uint8)
    est = cv2.DISOpticalFlow_create(cv2.DISOPTICAL_FLOW_PRESET_MEDIUM)
    flow = est.calc(u0[..., 0], u1[..., 0], None)
    fmap = flow.copy()
    fmap[:, :, 0] += np.arange(fmap.shape[1])
    fmap[:, :, 1] += np.arange(fmap.shape[0])[:, None]
    warped = cv2.remap(u1, fmap, None, cv2.INTER_LINEAR).astype(
        np.float32) / 255.0
    tgt = u0.astype(np.float32) / 255.0
    a, b = warped[32:-32, 32:-32], tgt[32:-32, 32:-32]
    e1_ref = float(np.mean((a - b) ** 2))
    e2_ref = float(np.mean(np.abs(a - b) / (1e-8 + a + b)))

    e1, e2 = compute_warp_error(f0, f1, algo="DIS")
    assert e1 == pytest.approx(e1_ref, rel=1e-6)
    assert e2 == pytest.approx(e2_ref, rel=1e-6)


def test_warp_error_flow_direction():
    """The flow must align frame1 ONTO frame0: on a pure translation the
    compensated error is a small fraction of the uncompensated one (a
    reversed flow direction roughly doubles the displacement instead)."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    f0, f1 = _shifted_pair()
    e1_flow, _ = compute_warp_error(f0, f1, algo="DIS")
    e1_noflow = float(np.mean((f1[32:-32, 32:-32] - f0[32:-32, 32:-32]) ** 2))
    assert e1_flow < 0.15 * e1_noflow, (e1_flow, e1_noflow)


def test_warp_error_estimator_substitution_bound():
    """DeepFlow (opencv-contrib) is unavailable in this image; DIS and
    Farneback are the substitutes.  Bound their E1 discrepancy on a fixed
    pair: both must compensate the motion and agree within 20% of the
    uncompensated error."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    f0, f1 = _shifted_pair()
    e1_noflow = float(np.mean((f1[32:-32, 32:-32] - f0[32:-32, 32:-32]) ** 2))
    e1_dis, e2_dis = compute_warp_error(f0, f1, algo="DIS")
    e1_fb, e2_fb = compute_warp_error(f0, f1, algo="Farneback")
    assert e1_dis < 0.3 * e1_noflow and e1_fb < 0.3 * e1_noflow
    assert abs(e1_dis - e1_fb) < 0.2 * e1_noflow, (e1_dis, e1_fb, e1_noflow)


def test_hs_jax_flow_recovers_translation():
    """The on-device pyramidal Horn-Schunck backend must recover a pure
    translation: flow ~ (-shift, 0) in the valid interior, and the
    compensated warp error must be a small fraction of the uncompensated
    one — within the same bound family as the cv2 estimators."""
    from uncltmo_tpu.metrics.flow_jax import horn_schunck_flow
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    import jax.numpy as jnp
    f0, f1 = _shifted_pair()

    flow = np.asarray(horn_schunck_flow(jnp.asarray(f0[..., 0]),
                                        jnp.asarray(f1[..., 0])))
    interior = flow[40:-40, 40:-40]
    # convention: img1(p + f(p)) ~= img0(p); f1 = roll(f0, +6) => f = +6
    assert abs(float(np.median(interior[..., 0])) - 6.0) < 1.0, \
        float(np.median(interior[..., 0]))
    assert abs(float(np.median(interior[..., 1]))) < 1.0

    e1_noflow = float(np.mean((f1[32:-32, 32:-32] - f0[32:-32, 32:-32]) ** 2))
    e1_hs, e2_hs = compute_warp_error(f0, f1, algo="hs_jax")
    e1_dis, _ = compute_warp_error(f0, f1, algo="DIS")
    assert e1_hs < 0.3 * e1_noflow, (e1_hs, e1_noflow)
    assert abs(e1_hs - e1_dis) < 0.2 * e1_noflow, (e1_hs, e1_dis, e1_noflow)


def test_warp_error_baseline_flow_source():
    """Flow estimated on clean baseline renders still aligns noisy model
    outputs (the reference's L1L0 protocol, `Tester.py:378-390`)."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    f0, f1 = _shifted_pair()
    rng = np.random.default_rng(3)
    noisy0 = np.clip(f0 + rng.normal(0, 0.02, f0.shape), 0, 1)
    noisy1 = np.clip(f1 + rng.normal(0, 0.02, f1.shape), 0, 1)
    e1_noflow = float(
        np.mean((noisy1[32:-32, 32:-32] - noisy0[32:-32, 32:-32]) ** 2))
    e1, e2 = compute_warp_error(noisy0, noisy1,
                                flow_source0=f0, flow_source1=f1,
                                algo="DIS")
    assert np.isfinite(e1) and np.isfinite(e2)
    assert e1 < 0.5 * e1_noflow


def test_warp_error_provenance():
    """Warp numbers are only comparable within one (flow_algo, flow_source)
    pair, so compute_warp_error must be able to report which one it ran
    (VERDICT r3 'weak #2': two silently-stacked deviations)."""
    from uncltmo_tpu.metrics.warp_error import (compute_warp_error,
                                                resolve_flow_algo)
    f0, f1 = _shifted_pair()
    e1, e2, info = compute_warp_error(f0, f1, algo="DIS",
                                      with_provenance=True)
    assert info == {"flow_algo": "DIS", "flow_source": "self"}
    _, _, info = compute_warp_error(f0, f1, flow_source0=f0,
                                    flow_source1=f1, algo="hs_jax",
                                    with_provenance=True)
    assert info == {"flow_algo": "hs_jax", "flow_source": "baseline"}
    # 'auto' must resolve to a CONCRETE backend name, never echo 'auto'
    assert resolve_flow_algo("auto") in ("DeepFlow", "DIS", "Farneback",
                                         "hs_jax")
    with pytest.raises(ValueError, match="unknown flow algo"):
        resolve_flow_algo("farneback")


# ---------------------------------------------------------------------------
# Native InceptionV3 trunk (FID feature extractor)
# ---------------------------------------------------------------------------
def _torch_fid_trunk():
    """Independent torch oracle of the FID-patched InceptionV3 trunk
    (stem -> Mixed_6e), mirroring torchvision's module/parameter naming so
    its state_dict feeds `convert_inception_state_dict` directly.
    Architecture per torchvision inception + the FID pooling patch
    (`/root/reference/fid/inception.py:195-214`)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    class IncA(nn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = self.branch_pool(F.avg_pool2d(
                x, 3, stride=1, padding=1, count_include_pad=False))
            return torch.cat([b1, b5, b3, bp], 1)

    class IncB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3,
                                              padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3,
                                              stride=2)

        def forward(self, x):
            import torch
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class IncC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                           padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                           padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                              padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                              padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            import torch
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(F.avg_pool2d(
                x, 3, stride=1, padding=1, count_include_pad=False))
            return torch.cat([b1, b7, bd, bp], 1)

    class Trunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3,
                                             padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)

        def forward(self, x):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = F.max_pool2d(x, 3, stride=2)
            for m in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                      self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                      self.Mixed_6d, self.Mixed_6e):
                x = m(x)
            return x

    return Trunk()


@pytest.mark.slow  # builds + runs the torch Inception oracle
def test_inception_trunk_matches_torch_oracle(tmp_path):
    """Flax trunk + folded-BN conversion vs the torch oracle on random
    weights/input: max |diff| small relative to activation scale, and the
    end-to-end extractor (2x-1 scaling + adaptive 17->8 pool) matches."""
    import torch
    from uncltmo_tpu.metrics.inception import make_inception_extractor

    torch.manual_seed(0)
    net = _torch_fid_trunk().eval()
    # randomize BN stats away from (0, 1) so folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.05)
                m.bias.normal_(0, 0.05)
    wpath = tmp_path / "inception.pth"
    torch.save(net.state_dict(), wpath)

    rng = np.random.default_rng(0)
    batch = rng.random((2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(batch.transpose(0, 3, 1, 2)) * 2.0 - 1.0)
        ref = torch.nn.functional.adaptive_avg_pool2d(ref, (8, 8))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    extractor = make_inception_extractor(str(wpath))
    out = extractor(batch)
    assert out.shape == (2, 8, 8, 768)
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() < 2e-3 * max(scale, 1.0), \
        (np.abs(out - ref).max(), scale)


def test_fid_requires_weights():
    from uncltmo_tpu.metrics.fid import calculate_fid_given_paths
    from uncltmo_tpu.metrics.inception import load_inception_params
    with pytest.raises(RuntimeError, match="weights"):
        calculate_fid_given_paths(["a", "b"])
    with pytest.raises(FileNotFoundError, match="Inception weights"):
        load_inception_params("/nonexistent/weights.pth")


def test_adaptive_avg_pool_rectangular_matches_torch(rng):
    """Per-axis averaging matrices: rectangular (H != W) feature maps must
    pool exactly like torch adaptive_avg_pool2d, not crash."""
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp
    from uncltmo_tpu.metrics.inception import adaptive_avg_pool
    for (h, w) in [(17, 18), (17, 17), (9, 23)]:
        x = rng.random((2, h, w, 5)).astype(np.float32)
        out = np.asarray(adaptive_avg_pool(jnp.asarray(x), 8))
        ref = torch.nn.functional.adaptive_avg_pool2d(
            torch.tensor(x.transpose(0, 3, 1, 2)), (8, 8))
        ref = ref.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_warp_error_crop_guards():
    """crop=0 must compute over the full frame (not an empty [0:-0]
    slice), and frames smaller than the crop must raise instead of
    silently averaging an empty array to NaN."""
    from uncltmo_tpu.metrics.warp_error import compute_warp_error
    rng = np.random.default_rng(5)
    f0 = rng.random((40, 50, 3)).astype(np.float32)
    e1, e2 = compute_warp_error(f0, f0, crop=0, algo="hs_jax")
    assert np.isfinite(e1) and np.isfinite(e2)
    assert e1 < 1e-6  # identical frames, zero flow
    with pytest.raises(ValueError, match="too small"):
        compute_warp_error(f0, f0, crop=32, algo="hs_jax")


def test_fid_empty_dir_raises(tmp_path):
    from uncltmo_tpu.metrics.fid import path_statistics
    d = tmp_path / "imgs"
    d.mkdir()
    (d / "notes.txt").write_text("not an image")
    with pytest.raises(ValueError, match="no png/jpg/jpeg"):
        path_statistics(str(d), extractor=lambda x: x, fake_side=False)


def test_percentile_clamp_stretch_constant_frame():
    """A constant generator output must stretch to zeros, not 0/0 NaN
    (the reference writes a NaN image here, `model_save_util.py:394`)."""
    import jax.numpy as jnp
    from uncltmo_tpu.ops.color import percentile_clamp_stretch
    out = np.asarray(percentile_clamp_stretch(jnp.full((64, 64), 0.5)))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0)
