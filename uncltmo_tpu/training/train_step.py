"""The jitted GAN training step.

One fused XLA program per (stage, shapes): D update (on the old G's fake)
followed by the G update against the *updated* D — the reference's exact
ordering (`GanTrainer.py:202-291`: optimizerD.step() precedes train_G).
The 3-stage epoch schedule of loss mixes (`GanTrainer.py:301-332`,
epoch_step1=6 / epoch_step2=9) is a static `stage` argument, so each stage
compiles once.

Everything the reference computed on host mid-step — per-patch TMQI
naturalness for the pseudo-label loss, per-image naturalness ranking for
infoNCE2 (`GanTrainer.py:340-409`, device->CPU sync of B and 4B scipy TMQI
calls per iteration) — runs on device inside this program.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from uncltmo_tpu.losses import adversarial as adv
from uncltmo_tpu.losses.struct import struct_loss_pyramid
from uncltmo_tpu.models.discriminator import SimpleDiscriminator
from uncltmo_tpu.models.unet import UNetTMO, video_apply
from uncltmo_tpu.training.state import TrainState, apply_updates


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_g_d_factor: float = 0.1
    struct_loss_factor: float = 1.0
    pyramid_weights: Tuple[float, ...] = (0.2, 0.4, 0.6)
    adv_weight: float = 1.0
    ssim_window_size: int = 5
    video: bool = False              # video G: 5-D input + feature head
    train_with_D: bool = True
    # contrastive-loss flavor for the nce/infoNCE2 terms.  Every reference
    # call site hardcodes 'InfoNCE' (`GanTrainer.py:304-318`); 'LMCL'
    # (`GanTrainer.py:441-451`) is its implemented-but-unreachable
    # alternative, selectable here.
    cl_loss_type: str = "InfoNCE"


def _flatten_frames(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B*T, H, W, C)."""
    return x.reshape((-1,) + x.shape[2:])


def generator_loss_terms(stage: int, cfg: LossConfig, fake, fea_fake,
                         d_fake_bp, d_real_pos_bp, d_fea_fake,
                         d_fea_real_pos, d_fea_real_neg, d_fea_input,
                         ldr_pos) -> jnp.ndarray:
    """The stage-dependent adversarial/contrastive G loss
    (`GanTrainer.py:301-332`)."""
    gd = cfg.loss_g_d_factor
    clt = cfg.cl_loss_type
    if stage == 0:
        err = gd * adv.contrastive_d_loss(d_fake_bp, d_real_pos_bp)
        err += gd * 0.5 * adv.nce(d_fea_fake, d_fea_real_pos, d_fea_input,
                                  k=1.0, c=1e-2, loss_type=clt)
        err += gd * 0.5 * (0.2 * adv.nce(d_fea_fake, d_fea_real_pos,
                                         d_fea_real_neg, k=1e3, c=2.0,
                                         loss_type=clt))
        err += gd * 1e-6 * adv.info_nce2(fea_fake, fake, k=1.0, c=1e-2,
                                         loss_type=clt)
        err += gd * 1e-6 * adv.mean_brightness_l1(fake, ldr_pos)
        err += gd * 1e-6 * adv.mean_contrast_l1(fake, ldr_pos)
        err += gd * 1e-6 * adv.pseudo_label_loss(fake)
    elif stage == 1:
        err = gd * 1e-6 * adv.contrastive_d_loss(d_fake_bp, d_real_pos_bp)
        err += gd * 0.5 * adv.nce(d_fea_fake, d_fea_real_pos, d_fea_input,
                                  k=1.0, c=1e-2, loss_type=clt)
        err += gd * 0.5 * (0.2 * adv.nce(d_fea_fake, d_fea_real_pos,
                                         d_fea_real_neg, k=1e3, c=2.0,
                                         loss_type=clt))
        err += gd * 0.1 * (5.0 * adv.info_nce2(fea_fake, fake, k=1.0, c=1e-2,
                                               loss_type=clt))
        err += gd * 0.5 * (1e2 * adv.mean_brightness_l1(fake, ldr_pos))
        err += gd * 0.5 * (2.0 * adv.mean_contrast_l1(fake, ldr_pos))
        err += gd * 1e-6 * adv.pseudo_label_loss(fake)
    else:
        err = gd * 1e-6 * adv.contrastive_d_loss(d_fake_bp, d_real_pos_bp)
        err += gd * 0.5 * (1e2 * adv.mean_brightness_l1(fake, ldr_pos))
        err += gd * 0.5 * (1e2 * adv.pseudo_label_loss(fake))
        err += gd * 0.2 * (1e5 * adv.tv_loss(fake))
    return err


def make_train_step(gen: UNetTMO, disc: SimpleDiscriminator,
                    cfg: LossConfig) -> Callable:
    """Build train_step(state, batch, rng, g_lr, d_lr, stage) -> (state, logs).

    batch (image & video pipelines both deliver 2 frames per sample,
    `ProcessedDatasetFolder.py:57`):
      hdr:     (B, 2, H, W, C)  lambda-log luminance (G input)
      ldr_pos: (B, 2, H, W, 1)  DIV2K luma / 255
      ldr_neg: (B, 2, H, W, 1)  SICE over/under-exposed luma / 255
    """

    def g_forward(params_G, stats_G, hdr, rng, deterministic=False):
        """Returns (fake, features, updated batch_stats).  stats_G is the
        generator's running batch-norm statistics ({} for the published
        norm-free configs); every training forward updates them, exactly
        like the reference's always-train()-mode netG calls."""
        variables = {"params": params_G}
        has_stats = bool(stats_G)
        if has_stats:
            variables["batch_stats"] = stats_G
        rngs = {"droppath": rng}
        if cfg.video:
            if has_stats:
                outs, feats, new_stats = video_apply(
                    gen, variables, hdr, deterministic=deterministic,
                    rngs=rngs, with_stats=True)
            else:
                outs, feats = video_apply(gen, variables, hdr,
                                          deterministic=deterministic,
                                          rngs=rngs)
                new_stats = stats_G
            fake = _flatten_frames(outs)
            fea = _flatten_frames(feats)[:, None, None, :]
        else:
            flat = _flatten_frames(hdr)
            if has_stats:
                (fake, up_x), upd = gen.apply(
                    variables, flat, deterministic=deterministic, rngs=rngs,
                    mutable=["batch_stats"])
                new_stats = upd["batch_stats"]
            else:
                fake, up_x = gen.apply(variables, flat,
                                       deterministic=deterministic,
                                       rngs=rngs)
                new_stats = stats_G
            fea = up_x
        return fake, fea, new_stats

    def d_apply(params_D, x):
        return disc.apply({"params": params_D}, x)

    @functools.partial(jax.jit, static_argnames=("stage", "pretrain"))
    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array, g_lr, d_lr, stage: int = 0,
                   pretrain: bool = False):
        rng_d, rng_g = jax.random.split(rng)
        hdr = batch["hdr"]
        ldr_pos = _flatten_frames(batch["ldr_pos"])
        ldr_neg = _flatten_frames(batch["ldr_neg"])
        hdr_flat = _flatten_frames(hdr)
        logs = {}

        # ---- D update (`GanTrainer.py:202-261`)
        stats_G = state.stats_G
        if cfg.train_with_D:
            if pretrain:
                fake_for_d = hdr_flat[..., :1]
            else:
                # this train-mode G forward also advances the BN running
                # stats (the reference's netG(hdr) in train_D does too)
                fake_for_d, _, stats_G = g_forward(
                    state.params_G, stats_G, hdr, rng_d)
                fake_for_d = jax.lax.stop_gradient(fake_for_d)
                stats_G = jax.lax.stop_gradient(stats_G)
            d_weight = (cfg.adv_weight if stage == 0
                        else cfg.adv_weight * 1e-6)

            def d_loss_fn(params_D):
                d_real_pos, _ = d_apply(params_D, ldr_pos)
                d_fake, _ = d_apply(params_D, fake_for_d)
                loss = d_weight * adv.contrastive_d_loss(d_real_pos, d_fake)
                return loss, (d_real_pos, d_fake)

            (err_d, (d_real_pre, d_fake_pre)), grads_d = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.params_D)
            params_D, opt_state_D = apply_updates(
                state.params_D, grads_d, state.opt_state_D, d_lr)
            logs["errD"] = err_d
            # accuracy counters (reference `Tester.update_test_loss`,
            # `printer.print_epoch_acc_summary`: logit > 0.5 = "real"),
            # from the pre-update D forwards already computed for the loss
            logs["accDreal"] = jnp.mean((d_real_pre > 0.5).astype(jnp.float32))
            logs["accDfake"] = jnp.mean((d_fake_pre <= 0.5).astype(jnp.float32))
            logs["accG"] = jnp.mean((d_fake_pre > 0.5).astype(jnp.float32))
        else:
            params_D, opt_state_D = state.params_D, state.opt_state_D

        if pretrain:
            return state.replace(params_D=params_D, opt_state_D=opt_state_D,
                                 step=state.step + 1), logs

        # ---- G update against the UPDATED D (`GanTrainer.py:263-291`)
        def g_loss_fn(params_G):
            fake, fea_fake, new_stats = g_forward(params_G, stats_G,
                                                  hdr, rng_g)
            new_stats = jax.lax.stop_gradient(new_stats)
            err = 0.0
            if cfg.train_with_D:
                d_fake_bp, d_fea_fake = d_apply(params_D, fake)
                d_real_pos_bp, d_fea_real_pos = d_apply(params_D, ldr_pos)
                _, d_fea_real_neg = d_apply(params_D, ldr_neg)
                _, d_fea_input = d_apply(params_D, hdr_flat[..., :1])
                err = generator_loss_terms(
                    stage, cfg, fake, fea_fake, d_fake_bp, d_real_pos_bp,
                    d_fea_fake, d_fea_real_pos, d_fea_real_neg, d_fea_input,
                    ldr_pos)
            err_struct = 0.0
            if cfg.struct_loss_factor:
                err_struct = cfg.struct_loss_factor * struct_loss_pyramid(
                    fake, hdr_flat[..., :1], cfg.pyramid_weights,
                    cfg.ssim_window_size)
            fake_stats = (jnp.min(fake), jnp.max(fake), jnp.mean(fake))
            return err + err_struct, (err, err_struct, fake_stats, new_stats)

        (_, (err_g, err_struct, fake_stats, stats_G)), grads_g = \
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.params_G)
        params_G, opt_state_G = apply_updates(
            state.params_G, grads_g, state.opt_state_G, g_lr)
        logs["errG_d"] = err_g
        logs["errG_struct"] = err_struct
        # G-progress tensor stats (the reference prints fake min/max/mean
        # each train_G iteration, `printer.py:146-157` via
        # `GanTrainer.py:271,275`); three fused scalar reductions
        logs["fake/min"], logs["fake/max"], logs["fake/mean"] = fake_stats
        # per-top-level-layer mean |grad| — the grad-flow diagnostic
        # (`plot_util.py:130-146`); a handful of scalars, fused into the step
        for top, sub in grads_g.items():
            leaves = jax.tree_util.tree_leaves(sub)
            logs[f"gradG/{top}"] = sum(
                jnp.sum(jnp.abs(l)) for l in leaves) / sum(
                l.size for l in leaves)

        new_state = state.replace(
            params_G=params_G, params_D=params_D,
            opt_state_G=opt_state_G, opt_state_D=opt_state_D,
            stats_G=stats_G, step=state.step + 1)
        return new_state, logs

    return train_step


def stage_for_epoch(epoch: int, step1: int = 6, step2: int = 9) -> int:
    """Loss-mix stage from the epoch index (`GanTrainer.py:113-114`,
    `:302-332`: stage boundaries at epoch_step1=6 and epoch_step2=9)."""
    if epoch <= step1:
        return 0
    if epoch <= step2:
        return 1
    return 2
