"""In-training evaluation ("Tester").

Re-design of `Tester.py` (video) / `TesterImg.py` (image): every 1/4 epoch
the current generator is run over held-out HDR content; TMQI (and, for
video, warp error) are computed and baked into the result directory name
(`Tester.py:282`) so metric trajectories are visible at a glance.

All forward passes go through the batched TileEngine; TMQI runs on device
(uncltmo_tpu.metrics.tmqi).  Optical flow stays on host cv2 (offline
metric).  Dataset directories are optional — anything missing is skipped,
so the trainer works on machines without the eval sets.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from uncltmo_tpu.config import Options
from uncltmo_tpu.inference.engine import TileEngine
from uncltmo_tpu.inference.runner import postprocess_device, preprocess_device
from uncltmo_tpu.metrics.tmqi import tmqi
from uncltmo_tpu.metrics.warp_error import compute_warp_error
from uncltmo_tpu.ops import preprocess
from uncltmo_tpu.utils.io import (HDR_EXTENSIONS, load_lambda_dict,
                                  read_hdr_image, save_uint8_png)


class Tester:
    def __init__(self, opt: Options, model, video: bool = False,
                 test_video_path: Optional[str] = None,
                 dtype=jnp.float32):
        from uncltmo_tpu.utils.bootstrap import enable_compile_cache
        enable_compile_cache()   # one tiled program per eval (H, W) shape
        self.opt = opt
        self.video = video
        self.test_video_path = test_video_path
        if hasattr(model, "fast_upsample") and not model.fast_upsample:
            # eval is forward-only: same params, faster upsample lowering
            model = model.clone(fast_upsample=True)
        self.engine = TileEngine(model, {"params": None}, dtype=dtype)
        self.lambda_table: Dict[str, float] = {}
        if opt.f_factor_path and os.path.exists(opt.f_factor_path):
            self.lambda_table = load_lambda_dict(opt.f_factor_path)
        self._maybe_calc_lambdas(opt.test_dataroot_original_hdr)
        self.original_hdr = self._preload(opt.test_dataroot_original_hdr)

    def _maybe_calc_lambdas(self, root: Optional[str]) -> None:
        """Compute lambdas missing for the eval set, like the reference's
        Tester init does (`Tester.py:40-42` -> `adaptive_lambda.calc_lambda`).
        Requires `mean_hist_path`; without it, a missing name raises later
        in `_lambda_for` (the reference would crash inside calc_lambda)."""
        if not root or not os.path.isdir(root):
            return
        missing = any(
            os.path.splitext(n)[0] not in self.lambda_table
            for n in os.listdir(root)
            if os.path.splitext(n)[1] in HDR_EXTENSIONS)
        hist = self.opt.mean_hist_path
        if not missing or not hist or not os.path.exists(hist):
            return
        import numpy as np
        from uncltmo_tpu.ops.lambda_est import calc_lambda
        os.makedirs(self.opt.lambdas_path, exist_ok=True)
        # seed calc_lambda's cache with the lambdas we already know, so it
        # only fits the genuinely missing names (it skips stems present in
        # its output dict) instead of re-fitting the whole directory
        out_path = os.path.join(self.opt.lambdas_path,
                                "input_images_lambdas.npy")
        cache = {}
        if os.path.isfile(out_path):
            cache = np.load(out_path, allow_pickle=True)[()]
        merged = {**cache, **self.lambda_table}
        if merged != cache:
            np.save(out_path, merged)
        out = calc_lambda(self.opt.f_factor_path, HDR_EXTENSIONS, root,
                          hist, self.opt.lambdas_path, self.opt.bins)
        if out and os.path.exists(out):
            self.lambda_table = {**load_lambda_dict(out), **self.lambda_table}

    # ------------------------------------------------------------------
    def _lambda_for(self, name: str) -> float:
        """Brightness factor for an eval image/scene.  Missing keys raise,
        matching the reference's `get_f` KeyError semantics
        (`utils/data_loader_util.py:212-222`) — a typo'd dataset must not
        silently evaluate with a wrong lambda."""
        if name not in self.lambda_table:
            raise KeyError(
                f"no lambda for {name!r} in {self.opt.f_factor_path!r}; "
                "run cli/prepare_lambdas.py for this dataset")
        return float(self.lambda_table[name]) * 255.0 * self.opt.factor_coeff

    def _preload(self, root: Optional[str]) -> List[Dict]:
        """Preload + preprocess the fixed eval images
        (`Tester.py:40-61`)."""
        items = []
        if not root or not os.path.isdir(root):
            return items
        for img_name in sorted(os.listdir(root)):
            stem, ext = os.path.splitext(img_name)
            if ext not in HDR_EXTENSIONS:
                continue
            rgb_np = read_hdr_image(os.path.join(root, img_name))
            rgb, gray = preprocess_device(
                jnp.asarray(rgb_np), self._lambda_for(stem),
                self.opt.data_trc)
            rgb_p, dy, dx = preprocess.pad_to_unet_grid(rgb)
            gray_p, dy, dx = preprocess.pad_to_unet_grid(gray)
            items.append({"im_name": stem, "rgb": rgb_p, "gray": gray_p,
                          "rgb_original": rgb_np, "diffY": dy, "diffX": dx})
        return items

    # ------------------------------------------------------------------
    def save_images_for_model(self, params_G, out_dir: str,
                              epoch: int, epoch_iter: int) -> Dict[str, float]:
        """1/4-epoch eval hook (`Tester.py:253-312`).  Evaluates the model
        bound at Tester construction with the given params (the engine is
        model-bound; passing a different generator is not supported).
        `params_G` may be a bare param tree or a full variables dict
        ({'params': ..., 'batch_stats': ...} for batch_norm models)."""
        variables = (params_G if isinstance(params_G, dict)
                     and "params" in params_G else {"params": params_G})
        self.engine.update_variables(variables)
        metrics: Dict[str, float] = {}
        renders: Optional[List[np.ndarray]] = None
        if self.video and self.test_video_path and \
                os.path.isdir(self.test_video_path):
            tm, w1, w2, flow_info = self.eval_on_video_root(
                self.test_video_path)
            metrics.update(tmqi=tm, warp_e1=w1, warp_e2=w2)
            if flow_info:
                # warp numbers are only comparable within one
                # (flow_algo, flow_source) pair — record it next to them
                metrics.update(flow_info)
            tag = f"m1st{tm}_m2nd{w1}_m3rd{w2}"
        elif self.original_hdr:
            # keep the rendered frames: the save loop below would otherwise
            # re-run the full tiled forward over the whole eval set (the
            # dominant device cost of the hook) a second time
            tm, renders = self._eval_images_with_renders()
            metrics.update(tmqi=tm)
            tag = f"tmqi{tm}"
        else:
            tag = "noeval"
        result_dir = os.path.join(
            out_dir, "model_results",
            f"epoch{epoch}_iter{epoch_iter}_{tag}", "color_stretch")
        for i, item in enumerate(self.original_hdr):
            out01 = (renders[i] if renders is not None
                     else np.asarray(self._render(item)))
            save_uint8_png(out01, result_dir,
                           item["im_name"] + "_color_stretch")
        return metrics

    def _render(self, item) -> jnp.ndarray:
        if self.video:
            # replicate the single frame 4x through the recurrent model and
            # keep the last frame (`Tester.py:291-300`)
            frames = jnp.stack([item["gray"]] * 4)
            fake = self.engine.run_video(frames)[-1]
        else:
            fake = self.engine.run_image(item["gray"])
        return postprocess_device(item["rgb"], fake,
                                  item["diffY"], item["diffX"])

    # ------------------------------------------------------------------
    def eval_on_images(self) -> float:
        """Mean TMQI over the preloaded eval set
        (`TesterImg.py:310-373`)."""
        return self._eval_images_with_renders()[0]

    def _eval_images_with_renders(self):
        """(mean TMQI, per-item rendered [0,1] arrays) — one forward per
        item, shared between the metric and the PNG dump."""
        scores, renders = [], []
        for item in self.original_hdr:
            out01 = np.asarray(self._render(item))
            renders.append(out01)
            h, w = item["rgb_original"].shape[:2]
            out_crop = out01[:h, :w]
            q, _, _, _, _ = tmqi(item["rgb_original"][:out_crop.shape[0],
                                                      :out_crop.shape[1]],
                                 out_crop * 255.0)
            scores.append(q)
        return (float(np.mean(scores)) if scores else 0.0), renders

    def _baseline_flow_pair(self, scene: str, names: List[str]):
        """L1L0-baseline renders of the scene's first two frames, used as
        the optical-flow source for the warp-error protocol
        (`Tester.py:378-385`: '<dir>/<scene>/<frame>_L1L0TM.png', read with
        cv2.imread i.e. BGR).  Returns (None, None) when the baseline dir is
        not configured or the files are absent — flow then falls back to
        the model's own renders (not protocol-comparable)."""
        base = getattr(self.opt, "baseline_flow_dir", "none")
        if not base or base == "none":
            return None, None
        import cv2
        pair = []
        for nm in names:
            p = os.path.join(base, scene,
                             os.path.splitext(nm)[0] + "_L1L0TM.png")
            img = cv2.imread(p) if os.path.exists(p) else None
            if img is None:
                return None, None
            pair.append(img)
        return pair[0], pair[1]

    def eval_on_video_root(self, root: str, frames_per_scene: int = 6):
        """Per-scene TMQI + warp error (`Tester.py:314-392`).

        Returns (mean TMQI, mean E1, mean E2, flow_provenance) —
        flow_provenance is {'flow_algo': ..., 'flow_source':
        'baseline'|'self'} for the warp numbers (the paper protocol is
        DeepFlow on the L1L0 baseline renders; anything else is a
        documented deviation the caller must surface), or {} when no
        scene had >= 2 frames."""
        tmqi_total, e1_total, e2_total, n = 0.0, 0.0, 0.0, 0
        flow_info: Dict[str, str] = {}
        for scene in sorted(os.listdir(root)):
            scene_dir = os.path.join(root, scene)
            if not os.path.isdir(scene_dir):
                continue
            names = sorted(
                nm for nm in os.listdir(scene_dir)
                if os.path.splitext(nm)[1] in HDR_EXTENSIONS
            )[:frames_per_scene]
            if not names:
                # a stray README/.DS_Store-only dir must not kill the
                # 1/4-epoch eval hook (and with it the training run)
                continue
            grays, rgbs, origs = [], [], []
            dy = dx = 0
            for nm in names:
                rgb_np = read_hdr_image(os.path.join(scene_dir, nm))
                rgb, gray = preprocess_device(
                    jnp.asarray(rgb_np), self._lambda_for(scene),
                    self.opt.data_trc)
                rgb_p, dy, dx = preprocess.pad_to_unet_grid(rgb)
                gray_p, dy, dx = preprocess.pad_to_unet_grid(gray)
                grays.append(gray_p)
                rgbs.append(rgb_p)
                origs.append(rgb_np)
            fakes = self.engine.run_video(jnp.stack(grays))
            scene_q, rendered = 0.0, []
            for i in range(len(names)):
                out01 = np.asarray(postprocess_device(
                    rgbs[i], fakes[i], dy, dx))
                rendered.append(out01)
                q, _, _, _, _ = tmqi(origs[i], out01 * 255.0)
                scene_q += q
            tmqi_total += scene_q / len(names)
            if len(rendered) >= 2:
                src0, src1 = self._baseline_flow_pair(scene, names[:2])
                e1, e2, info = compute_warp_error(rendered[0], rendered[1],
                                                  flow_source0=src0,
                                                  flow_source1=src1,
                                                  with_provenance=True)
                e1_total += e1
                e2_total += e2
                flow_info = info
            n += 1
        if n == 0:
            return 0.0, 0.0, 0.0, {}
        return tmqi_total / n, e1_total / n, e2_total / n, flow_info
