"""Golden regression cases: fixed-seed outputs of the torch-parity-verified
code, frozen as small fixtures.

The torch-oracle parity tests (`test_parity.py`, `test_ref_tiler.py`,
`test_e2e_reference.py`) take most of the suite's half hour on this
1-CPU host, so they are marked `slow`; this pack keeps the fast tier
(`pytest -m "not slow"`) sensitive to numerical drift in every
parity-critical path by comparing against values frozen while those
oracle tests were green.  Regenerate with `python scripts/make_golden.py`
ONLY after re-running the full slow suite.

Each case returns a dict of np arrays; the test compares them against
`tests/golden/golden.npz` (keys are "<case>/<name>").
"""
import numpy as np

SIZE = 128          # generator input: bottleneck_grid(128) = 4
GOLDEN_KEY = 0


def _gen_and_vars(video: bool = False, size: int = SIZE):
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.models.unet import UNetTMO, bottleneck_grid

    gen = UNetTMO(gcn_grid=bottleneck_grid(size))
    variables = jax.jit(gen.init)(jax.random.PRNGKey(GOLDEN_KEY),
                                  jnp.zeros((1, size, size, 1)))
    return gen, variables


def case_unet_image():
    import jax
    import jax.numpy as jnp

    gen, variables = _gen_and_vars()
    x = jnp.asarray(np.random.default_rng(1).random(
        (1, SIZE, SIZE, 1), np.float32))
    out, fea = jax.jit(lambda v, x: gen.apply(v, x))(variables, x)
    return {"out": np.asarray(out), "fea": np.asarray(fea)}


def case_unet_video():
    import jax.numpy as jnp
    from uncltmo_tpu.models.unet import video_apply

    gen, variables = _gen_and_vars()
    x = jnp.asarray(np.random.default_rng(2).random(
        (1, 3, SIZE, SIZE, 1), np.float32))
    out, fea = video_apply(gen, variables, x)
    return {"out": np.asarray(out), "fea": np.asarray(fea)}


def case_discriminator():
    import jax
    import jax.numpy as jnp
    from uncltmo_tpu.models.discriminator import SimpleDiscriminator

    disc = SimpleDiscriminator(input_size=SIZE)
    v = jax.jit(disc.init)(jax.random.PRNGKey(GOLDEN_KEY),
                           jnp.zeros((1, SIZE, SIZE, 1)))
    x = jnp.asarray(np.random.default_rng(3).random(
        (2, SIZE, SIZE, 1), np.float32))
    logits, fea = jax.jit(disc.apply)(v, x)
    return {"logits": np.asarray(logits), "fea": np.asarray(fea)}


def case_tile_engine():
    """Tiled render incl. the partition-of-unity blend, frozen as uint8
    (what `test_ref_tiler.py` oracle-verifies against the torch tilers)."""
    import jax.numpy as jnp
    from uncltmo_tpu.inference.engine import TileEngine

    gen, variables = _gen_and_vars()
    eng = TileEngine(gen, variables, tile=SIZE, overlap=32, chunk=4)
    img = jnp.asarray(np.random.default_rng(4).random(
        (160, 224, 1), np.float32))
    out = np.asarray(eng.run_image(img))
    return {"render_u8": np.clip(out * 255.0, 0, 255).astype(np.uint8),
            "out_f32": out}


def case_axis_plan():
    from uncltmo_tpu.inference.tiling import axis_plan

    p = axis_plan(1080 + 16, 256, 64)
    return {"origins": p.origins, "weights": p.weights}


def case_tmqi():
    from uncltmo_tpu.metrics.tmqi import tmqi

    rng = np.random.default_rng(5)
    # min dim >= 11 * 2**4 so the 11-tap window fits at all 5 SSIM scales
    hdr = (rng.random((192, 240, 3), np.float32) ** 2) * 900.0
    ldr = np.clip(hdr / hdr.max() * 400.0, 0, 255).astype(np.float32)
    q, s, n, s_local, _ = tmqi(hdr, ldr)
    return {"qsn": np.asarray([q, s, n], np.float64),
            "s_local": np.asarray(s_local, np.float64)}


def case_ops():
    import jax.numpy as jnp
    from uncltmo_tpu.ops.windows import contrast_map
    from uncltmo_tpu.ops.lambda_est import fit_lambda

    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((1, 64, 64, 1), np.float32))
    cm = np.asarray(contrast_map(x))
    gray = rng.random((120, 160), np.float32) ** 3 * 50.0
    targets = np.float32(rng.random(20))
    lam = fit_lambda(gray, targets / targets.sum())
    return {"contrast_map": cm, "lambda": np.asarray([lam], np.float64)}


def case_btmqi():
    from uncltmo_tpu.metrics.btmqi import btmqi
    from uncltmo_tpu.metrics.btmqi_validation import make_base_render

    score, feats = btmqi(make_base_render(0, size=128))
    return {"score": np.asarray([score], np.float64),
            "feats": np.asarray(feats, np.float32)}


def case_losses():
    """The fused generator loss mix at each schedule stage x contrastive
    variant (guards the 3-stage weight schedule verified term-by-term vs
    `GanTrainer.py:301-332` and the InfoNCE/LMCL forms, `:441-451`) — via
    the pure loss function, no optimizer compile."""
    import jax.numpy as jnp
    from uncltmo_tpu.training.train_step import (LossConfig,
                                                 generator_loss_terms)

    rng = np.random.default_rng(7)
    fake = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
    fea_fake = jnp.asarray(rng.random((2, 64, 64, 32), np.float32))
    d_fake_bp = jnp.asarray(rng.random((2, 1), np.float32))
    d_real_pos_bp = jnp.asarray(rng.random((2, 1), np.float32))
    d_fea = [jnp.asarray(rng.random((2, 1, 1, 2), np.float32))
             for _ in range(4)]
    ldr_pos = jnp.asarray(rng.random((2, 64, 64, 1), np.float32))
    vals = []
    for clt in ("InfoNCE", "LMCL"):
        cfg = LossConfig(cl_loss_type=clt)
        vals.append([float(generator_loss_terms(
            stage, cfg, fake, fea_fake, d_fake_bp, d_real_pos_bp,
            *d_fea, ldr_pos)) for stage in (0, 1, 2)])
    return {"stage_err": np.asarray(vals, np.float64)}


CASES = {
    "unet_image": case_unet_image,
    "unet_video": case_unet_video,
    "discriminator": case_discriminator,
    "tile_engine": case_tile_engine,
    "axis_plan": case_axis_plan,
    "tmqi": case_tmqi,
    "ops": case_ops,
    "btmqi": case_btmqi,
    "losses": case_losses,
}


def compute_all():
    out = {}
    for case, fn in CASES.items():
        for name, arr in fn().items():
            out[f"{case}/{name}"] = arr
    return out
