"""Scene-processing demo: images -> depth / points / poses / instance masks.

Behavioural parity: `demo.py` (`IGGTProcessor`):
- `_load_model` (`demo.py:102-121`): build IGGT, load a checkpoint (orbax
  natively, or a reference PyTorch ``.pth`` through the converter with
  strict=False alignment).
- `process_scene` (`demo.py:123-176`): load + preprocess images (resize mode
  at (504, 336) by default, `demo.py:59`), one jitted bf16 forward, post-
  process (pose decode, unprojection, PCA colormap, KNN smoothing, joint
  clustering), evaluate against GT when `depth/` + `cam/` exist, save
  predictions.npz / depth PNGs / GLB exports.

Usage:
    python -m iggt_official_tpu.app.demo --target_dir <scene> --save_dir out \
        [--model_path ckpt] [--preset large] [--image_size 504 336]
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from iggt_official_tpu.config import (
    CLUSTERING_LARGE,
    CLUSTERING_MEDIUM,
    CLUSTERING_SMALL,
    ClusteringConfig,
    ModelConfig,
    RuntimeConfig,
)
from iggt_official_tpu.eval.metrics import SceneEvaluator
from iggt_official_tpu.geometry import (
    closed_form_inverse_se3,
    depth_to_world_coords_points,
    pose_encoding_to_extri_intri,
    unproject_depth_map_to_point_map,
)
from iggt_official_tpu.models.vggt import IGGT
from iggt_official_tpu.ops.cluster import cluster_features_to_masks_mv
from iggt_official_tpu.ops.flash_attention import attention
from iggt_official_tpu.ops.knn import knn_smooth_features
from iggt_official_tpu.ops.pca import apply_pca_colormap
from iggt_official_tpu.utils.glb import predictions_to_glb
from iggt_official_tpu.utils.images import load_and_preprocess_images

logger = logging.getLogger(__name__)

# jitted post-process stages: unjitted, each jnp op dispatches eagerly and
# pays the per-dispatch host latency (~0.5 ms through a remote-TPU tunnel —
# these three stages measured ~1 s of almost pure dispatch overhead in the
# p50 breakdown); jitting collapses each stage to one dispatch
_pose_decode_jit = jax.jit(pose_encoding_to_extri_intri,
                           static_argnums=(1,))
_unproject_jit = jax.jit(unproject_depth_map_to_point_map)


@jax.jit
def _normalize_and_pca(feat: jax.Array) -> Tuple[jax.Array, jax.Array]:
    feat = feat / jnp.maximum(
        jnp.linalg.norm(feat, axis=-1, keepdims=True), 1e-12
    )
    return feat, apply_pca_colormap(feat)


CLUSTERING_PRESETS = {
    "small": CLUSTERING_SMALL,
    "medium": CLUSTERING_MEDIUM,
    "large": CLUSTERING_LARGE,
}


def threshold_depth_map(
    depth_map: np.ndarray,
    max_percentile: float = 99,
    min_percentile: float = 1,
    max_depth: float = -1,
) -> np.ndarray:
    """Percentile depth thresholding (`iggt/datasets/utils/misc.py:488-541`)."""
    if max_depth > 0:
        depth_map[depth_map > max_depth] = 0.0
    if max_percentile > 0:
        hi = np.nanpercentile(depth_map, max_percentile)
        if hi > 0:
            depth_map[depth_map > hi] = 0.0
    if min_percentile > 0:
        lo = np.nanpercentile(depth_map, min_percentile)
        if lo > 0:
            depth_map[depth_map < lo] = 0.0
    return depth_map


class IGGTProcessor:
    """End-to-end scene processor (`demo.py:85-213`)."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        model_cfg: Optional[ModelConfig] = None,
        runtime: Optional[RuntimeConfig] = None,
    ):
        self.cfg = model_cfg or ModelConfig()
        self.runtime = runtime or RuntimeConfig()
        self.model = IGGT(self.cfg)
        self.evaluator = SceneEvaluator()
        self.params = self._load_model(model_path)
        kwargs = {}
        if self.runtime.use_flash_attention:
            kwargs["attn_fn"] = attention
        if self.runtime.global_merge_r:
            kwargs["global_merge_r"] = self.runtime.global_merge_r
        if self.runtime.fused_ln:
            kwargs["fused_ln"] = True
        self._forward = jax.jit(
            lambda p, x: self.model.apply(p, x, **kwargs)
        )

    # ------------------------------------------------------------------
    def _load_model(self, model_path: Optional[str]):
        W, H = self.runtime.image_size
        rng = np.random.default_rng(0)
        init_images = jnp.asarray(
            rng.uniform(0, 1, (1, 1, 14 * 2, 14 * 2, 3)).astype(np.float32)
        )
        variables = jax.jit(self.model.init)(jax.random.PRNGKey(0), init_images)
        params = variables["params"]
        if model_path is None:
            logger.warning("No checkpoint given — running with random weights")
            return {"params": params}
        if model_path.endswith((".pth", ".pt", ".bin")):
            from iggt_official_tpu.utils.checkpoint import load_torch_checkpoint

            merged, _report = load_torch_checkpoint(model_path, params,
                                                    log=logger.info)
            return {"params": jax.tree.map(jnp.asarray, merged)}
        from iggt_official_tpu.utils.checkpoint import load_checkpoint

        return {"params": load_checkpoint(model_path, target=params)}

    # ------------------------------------------------------------------
    def process_scene(
        self,
        target_dir: str,
        save_dir: str,
        preds: Optional[Dict[str, np.ndarray]] = None,
        gt_data: Optional[Dict[str, Any]] = None,
    ) -> Dict[str, Any]:
        """Full scene pipeline.  ``preds``/``gt_data`` may be passed in
        pre-computed — app/batch_eval.py prefetches the next scene's GT
        load + device forward on a worker thread while the current scene
        post-processes and exports (the forward and the device clustering
        interleave on the accelerator queue; the host-side image loading /
        GLB export / JSON overlap fully)."""
        t0 = time.time()
        os.makedirs(save_dir, exist_ok=True)

        if gt_data is None:
            gt_data = self._load_gt_data(target_dir)
        if preds is None:
            preds = self._run_inference(target_dir)
        preds = self._post_process(preds)
        # one bulk device->host transfer for the export/eval stage; the
        # forward + post-process above never round-trip the big tensors
        # through the (slow) host link
        preds = {
            k: np.asarray(v) if not isinstance(v, np.ndarray) else v
            for k, v in preds.items()
        }

        results: Dict[str, Any] = {"predictions": preds}
        if gt_data is not None:
            report = self.evaluator.evaluate_scene(
                gt_data,
                {
                    "depth": preds["depth"][..., 0],
                    "extrinsic": preds["extrinsic"],
                },
            )
            self.evaluator.save_evaluation_report(
                report, os.path.join(save_dir, "evaluation_report.json")
            )
            self.evaluator.print_summary(report)
            results["evaluation"] = report

        self._save_predictions(preds, save_dir)
        self._export_glbs(preds, save_dir, target_dir=target_dir)
        logger.info("Total processing time: %.2f seconds", time.time() - t0)
        return results

    # ------------------------------------------------------------------
    def _run_inference(self, target_dir: str) -> Dict[str, np.ndarray]:
        image_paths = sorted(
            glob.glob(os.path.join(target_dir, "images", "*"))
        ) or sorted(glob.glob(os.path.join(target_dir, "*.jpg")))
        if not image_paths:
            raise FileNotFoundError(f"no images under {target_dir}")
        W, H = self.runtime.image_size
        images = load_and_preprocess_images(
            image_paths, mode="resize", resize_target_size=(W, H)
        )  # (S, H, W, 3)
        out = self._forward(self.params, jnp.asarray(images[None]))
        # keep predictions DEVICE-RESIDENT: the post-process stage (pose
        # decode, unprojection, PCA, kNN smoothing, clustering) consumes
        # them on-device, so downloading here would pay the host link
        # twice (~115 MB down + ~75 MB back up per 10-view scene through
        # a remote-TPU tunnel); process_scene materializes once after
        # post-processing for export/eval
        preds = {k: v for k, v in out.items() if k != "pose_enc_list"}
        preds["images"] = images
        return preds

    # ------------------------------------------------------------------
    def _post_process(self, preds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """`demo.py:333-401`: decode poses, unproject, cluster features."""
        S, H, W = preds["images"].shape[:3]
        extri, intri = _pose_decode_jit(
            jnp.asarray(preds["pose_enc"]), (H, W)
        )
        preds["extrinsic"] = extri[0]  # (S, 3, 4); stays on device
        preds["intrinsic"] = intri[0]

        for k in ("depth", "depth_conf", "world_points", "world_points_conf",
                  "part_feat"):
            if k in preds:
                preds[k] = preds[k][0]  # drop batch dim

        # depth-based world points (`demo.py:349-357`); device-resident —
        # the caller materializes once after post-processing
        preds["world_points_from_depth"] = _unproject_jit(
            jnp.asarray(preds["depth"]),
            jnp.asarray(preds["extrinsic"]),
            jnp.asarray(preds["intrinsic"]),
        )

        if "part_feat" in preds:
            feat, preds["part_feat_pca"] = _normalize_and_pca(
                jnp.asarray(preds["part_feat"])
            )
            smoothed = knn_smooth_features(
                jnp.asarray(preds["world_points"]), feat,
                k=self.runtime.clustering.knn_k,
            )
            cc = self.runtime.clustering
            masks, colored = cluster_features_to_masks_mv(
                smoothed,  # device array: the cluster pipeline stays on-chip
                apply_colormap=True,
                eps=cc.eps,
                min_samples=cc.min_samples,
                min_cluster_size=cc.min_cluster_size,
                exact=cc.exact,
            )
            preds["instance_masks"] = masks
            preds["instance_masks_colored"] = colored
        return preds

    # ------------------------------------------------------------------
    def _load_gt_data(self, target_dir: str) -> Optional[Dict[str, Any]]:
        """GT per-frame npz pose/intrinsics + 16-bit depth (`demo.py:215-309`)."""
        import cv2

        images_dir = os.path.join(target_dir, "images")
        depth_dir = os.path.join(target_dir, "depth")
        cam_dir = os.path.join(target_dir, "cam")
        if not os.path.exists(depth_dir):
            depth_dir = os.path.join(target_dir, "gt_depth")
        if not os.path.exists(cam_dir):
            cam_dir = os.path.join(target_dir, "gt_cam")
        if not (os.path.exists(depth_dir) and os.path.exists(cam_dir)):
            return None

        image_paths = sorted(glob.glob(os.path.join(images_dir, "*")))
        depth_paths = sorted(glob.glob(os.path.join(depth_dir, "*.png")))
        cam_paths = sorted(glob.glob(os.path.join(cam_dir, "*.npz")))
        if not (len(image_paths) == len(depth_paths) == len(cam_paths)):
            logger.warning("GT file count mismatch — skipping evaluation")
            return None

        exts, ints, depths, worlds = [], [], [], []
        for depth_path, cam_path in zip(depth_paths, cam_paths):
            cam = np.load(cam_path)
            pose = np.asarray(cam["pose"], np.float32)
            K = np.asarray(cam["intrinsics"], np.float32)
            assert pose.shape == (4, 4) and K.shape == (3, 3)
            depth = cv2.imread(depth_path, cv2.IMREAD_UNCHANGED)
            depth = depth.astype(np.float32) / 1000.0
            depth[~np.isfinite(depth)] = 0
            depth = threshold_depth_map(depth, max_percentile=99,
                                        min_percentile=-1)
            camera_pose = np.asarray(
                closed_form_inverse_se3(jnp.asarray(pose[None]))
            )[0]
            world, _, _ = depth_to_world_coords_points(
                jnp.asarray(depth), jnp.asarray(camera_pose[:3]),
                jnp.asarray(K),
            )
            exts.append(camera_pose[:3])
            ints.append(K)
            depths.append(depth)
            worlds.append(np.asarray(world))
        return {
            "gt_extrinsic": np.stack(exts),
            "gt_intrinsic": np.stack(ints),
            "gt_depth": np.stack(depths),
            "gt_world_points": np.stack(worlds),
            "image_paths": image_paths,
        }

    # ------------------------------------------------------------------
    def _save_predictions(self, preds: Dict[str, np.ndarray], save_dir: str):
        np.savez(
            os.path.join(save_dir, "predictions.npz"),
            **{k: v for k, v in preds.items() if isinstance(v, np.ndarray)},
        )
        self._save_depth_visualizations(preds["depth"][..., 0], save_dir)
        if "instance_masks_colored" in preds:
            from PIL import Image

            mask_dir = os.path.join(save_dir, "masks")
            os.makedirs(mask_dir, exist_ok=True)
            for i, frame in enumerate(preds["instance_masks_colored"]):
                Image.fromarray(frame).save(
                    os.path.join(mask_dir, f"mask_{i:04d}.png")
                )
        if "part_feat_pca" in preds:
            from PIL import Image

            pca_dir = os.path.join(save_dir, "pca")
            os.makedirs(pca_dir, exist_ok=True)
            for i, frame in enumerate(preds["part_feat_pca"]):
                Image.fromarray((frame * 255).astype(np.uint8)).save(
                    os.path.join(pca_dir, f"pca_{i:04d}.png")
                )

    def _save_depth_visualizations(self, depths: np.ndarray, save_dir: str):
        """Percentile-normalized colormap PNGs (`demo.py:435-609`): per-frame
        PNG + npy in several colormaps, depth statistics, a scale-bar
        variant of the primary colormap, a side-by-side colormap comparison
        grid, and an animated GIF."""
        from PIL import Image
        from matplotlib import colormaps

        depth_dir = os.path.join(save_dir, "depth_vis")
        os.makedirs(depth_dir, exist_ok=True)

        valid = depths[depths > 0]
        if valid.size == 0:
            logger.warning("No valid depth values found!")
            return
        lo, hi = np.percentile(valid, [1, 99])
        np.save(
            os.path.join(depth_dir, "depth_statistics.npy"),
            {
                "min": float(lo), "max": float(hi),
                "mean": float(valid.mean()), "std": float(valid.std()),
                "percentile_1": float(lo), "percentile_99": float(hi),
                "valid_pixel_ratio": float(valid.size / depths.size),
            },
        )

        vis_modes = ["jet", "viridis", "plasma", "turbo"]
        cmaps = {m: colormaps.get_cmap(m) for m in vis_modes}
        frames = []
        for i, d in enumerate(depths):
            normed = np.clip((d - lo) / max(hi - lo, 1e-12), 0, 1)
            per_mode = {}
            for mode in vis_modes:
                rgb = (cmaps[mode](normed)[..., :3] * 255).astype(np.uint8)
                per_mode[mode] = rgb
                Image.fromarray(rgb).save(
                    os.path.join(depth_dir, f"depth_{i:04d}_{mode}.png")
                )
            primary = per_mode[vis_modes[0]]
            Image.fromarray(primary).save(
                os.path.join(depth_dir, f"depth_{i:04d}.png")
            )
            frames.append(Image.fromarray(primary))
            self._add_depth_scale_bar(
                primary, lo, hi, cmaps[vis_modes[0]],
                os.path.join(depth_dir, f"depth_{i:04d}_with_scale.png"),
            )
            if i == 0:
                # side-by-side colormap comparison (`demo.py:526-530`)
                grid = np.concatenate(
                    [per_mode[m] for m in vis_modes], axis=1
                )
                Image.fromarray(grid).save(
                    os.path.join(depth_dir, "colormap_comparison.png")
                )
        np.save(os.path.join(depth_dir, "depth.npy"), depths)
        # animated GIF across views (`demo.py:435-609`)
        if len(frames) > 1:
            frames[0].save(
                os.path.join(depth_dir, "depth_animation.gif"),
                save_all=True, append_images=frames[1:], duration=200, loop=0,
            )

    @staticmethod
    def _add_depth_scale_bar(rgb, depth_min, depth_max, cmap, save_path):
        """Append a horizontal colorbar with min/max labels
        (`demo.py:532-575`)."""
        from PIL import Image, ImageDraw

        h, w = rgb.shape[:2]
        bar_h = 20
        ramp = np.linspace(0, 1, w, dtype=np.float32)
        bar = (cmap(np.tile(ramp, (bar_h, 1)))[..., :3] * 255).astype(np.uint8)
        canvas = np.concatenate([rgb, np.zeros((bar_h + 14, w, 3), np.uint8)])
        canvas[h : h + bar_h] = bar
        img = Image.fromarray(canvas)
        draw = ImageDraw.Draw(img)
        draw.text((2, h + bar_h + 1), f"{depth_min:.2f}m", fill=(255,) * 3)
        label = f"{depth_max:.2f}m"
        draw.text((w - 8 * len(label), h + bar_h + 1), label, fill=(255,) * 3)
        img.save(save_path)

    # ------------------------------------------------------------------
    def _export_glbs(
        self,
        preds: Dict[str, np.ndarray],
        save_dir: str,
        target_dir: Optional[str] = None,
    ):
        """rgb | mask | pca GLB exports (`demo.py:618-657`)."""
        pts = preds["world_points"]
        conf = preds.get("world_points_conf")
        if self.runtime.mask_sky and target_dir is not None and conf is not None:
            # sky pixels' confidence -> 0 so percentile filtering drops them
            # (`visual_util.py:112-159`)
            from iggt_official_tpu.utils.sky import load_or_compute_sky_masks

            keep = load_or_compute_sky_masks(target_dir, conf.shape[-2:])
            conf = conf * keep
        modes = {"rgb": preds["images"]}
        if "instance_masks_colored" in preds:
            modes["mask"] = preds["instance_masks_colored"].astype(np.float32) / 255
        if "part_feat_pca" in preds:
            modes["pca"] = preds["part_feat_pca"]
        for name, colors in modes.items():
            predictions_to_glb(
                pts,
                colors,
                conf=conf,
                extrinsics=preds.get("extrinsic"),
                conf_threshold=self.runtime.conf_threshold,
                path=os.path.join(save_dir, f"scene_{name}.glb"),
            )


def main() -> None:
    parser = argparse.ArgumentParser(description="IGGT TPU demo")
    parser.add_argument("--target_dir", required=True)
    parser.add_argument("--save_dir", required=True)
    parser.add_argument("--model_path", default=None)
    parser.add_argument("--preset", default="large",
                        choices=list(CLUSTERING_PRESETS))
    parser.add_argument("--image_size", type=int, nargs=2, default=(504, 336),
                        metavar=("W", "H"))
    parser.add_argument("--conf_threshold", type=float, default=0.3)
    parser.add_argument("--merge_tokens", type=int, default=0,
                        help="merge this many KV tokens out of global "
                             "attention (FastVGGT-style); 0 = exact")
    parser.add_argument("--mask_sky", action="store_true",
                        help="drop sky pixels from the GLB point clouds "
                             "(cached per-view masks under "
                             "<target_dir>/sky_masks)")
    parser.add_argument("--head_dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="decode-head compute dtype: float32 is the "
                             "reference parity island; bfloat16 is the "
                             "fast mode (~10%% end-to-end on v5e)")
    parser.add_argument("--exact_clustering", action="store_true",
                        help="run the weighted HDBSCAN at full pixel "
                             "density (reference algorithm verbatim; "
                             "minutes at demo scale) instead of the "
                             "subsampled fast path")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    import dataclasses as _dc0
    runtime = RuntimeConfig(
        image_size=tuple(args.image_size),
        conf_threshold=args.conf_threshold,
        clustering=_dc0.replace(CLUSTERING_PRESETS[args.preset],
                                exact=args.exact_clustering),
        global_merge_r=args.merge_tokens,
        mask_sky=args.mask_sky,
    )
    import dataclasses as _dc

    model_cfg = _dc.replace(ModelConfig(), head_dtype=args.head_dtype)
    processor = IGGTProcessor(args.model_path, runtime=runtime,
                              model_cfg=model_cfg)
    processor.process_scene(args.target_dir, args.save_dir)


if __name__ == "__main__":
    main()
