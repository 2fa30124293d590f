"""Render a spiral-path video from a nerf-pytorch ``.tar`` checkpoint.

Uses the occupancy-grid fast mode by default (multi-M rays/s on v5e; pass
--exact for the reference-semantics hierarchical path). Writes PNG frames
and an mp4 (pure-Python MJPEG .avi fallback when ffmpeg is absent).

Usage:
  python tools/render_video.py --ckpt lego_200000.tar --dataset blender \
      --dataset-path ./data/nerf_synthetic/lego --out ./video [--exact]
  python tools/render_video.py --synthetic --out ./video   # no datasets
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None, help="nerf-pytorch .tar")
    ap.add_argument("--dataset", default="blender")
    ap.add_argument("--dataset-path", default=None)
    ap.add_argument("--synthetic", action="store_true",
                    help="render a synthetic teacher scene (no data needed)")
    ap.add_argument("--out", default="./video_out")
    ap.add_argument("--exact", action="store_true",
                    help="reference-semantics hierarchical render")
    ap.add_argument("--frames", type=int, default=None,
                    help="cap the number of spiral poses")
    ap.add_argument("--size", type=int, default=None,
                    help="override H=W render resolution")
    args = ap.parse_args()

    import jax.numpy as jnp

    from nnc_tpu.models import nerf
    from nnc_tpu.render import occupancy, renderer
    from nnc_tpu.render.rays import get_rays_np
    from nnc_tpu.train.presets import load_scene, make_render_config
    from nnc_tpu.utils.ckpt import nerf_tar_to_wrapper_dict
    from nnc_tpu.utils.logging import to8b

    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    if args.synthetic:
        from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
        size = args.size or 128
        params_c = params_f = make_solid_mlp(mlp)
        ls_c = ls_f = None
        f = 0.8 * size
        scene = {
            "H": size, "W": size,
            "K": np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
                          np.float32),
            "render_poses": look_at_poses(30, seed=0),
            "near": 2.0, "far": 6.0, "white_bkgd": True, "ndc": False,
            "n_importance": 128,
        }
    else:
        assert args.ckpt, "--ckpt required without --synthetic"
        scene = load_scene(args.dataset, args.dataset_path)
        wrapper, _step = nerf_tar_to_wrapper_dict(args.ckpt)
        params_c, ls_c = nerf.params_from_state_dict(wrapper, "model.", mlp)
        params_f, ls_f = nerf.params_from_state_dict(wrapper, "model_fine.",
                                                     mlp)
    rc = make_render_config(scene, mlp, use_fused_mlp=True)
    if args.size:
        scene["H"] = scene["W"] = args.size
        f = 0.8 * args.size
        scene["K"] = np.array([[f, 0, args.size / 2],
                               [0, f, args.size / 2], [0, 0, 1]], np.float32)

    poses = np.asarray(scene["render_poses"])
    if args.frames:
        poses = poses[:args.frames]
    H, W = scene["H"], scene["W"]
    near, far = scene["near"], scene["far"]
    use_fast = not args.exact and not scene.get("ndc", False)

    grid = None
    if use_fast:
        t0 = time.time()
        aabb = scene.get("aabb", ((-2.0,) * 3, (2.0,) * 3))
        grid = occupancy.build_occupancy_grid(
            params_f if params_f is not None else params_c, ls_f, rc.mlp,
            lo=tuple(aabb[0]), hi=tuple(aabb[1]))
        print(f"occupancy grid built in {time.time() - t0:.1f}s "
              f"(occ {float(np.mean(np.asarray(grid.occ))):.3f})")

    os.makedirs(args.out, exist_ok=True)
    frames = []
    t0 = time.time()
    for i, pose in enumerate(poses):
        ro, rd = get_rays_np(H, W, scene["K"], pose[:3, :4])
        if use_fast:
            out = occupancy.render_image_fast(
                params_f if params_f is not None else params_c, ls_f,
                ro, rd, near, far, rc, grid, outputs=("rgb_map",),
                rgb_uint8=True)   # 4x fewer device->host bytes
            rgb = out["rgb_map"].astype(np.float32) / 255.0
            if rc.white_bkgd:
                pass  # render_rays_fast already composites the background
        else:
            vd = None
            if scene.get("ndc", False):
                import jax.numpy as jnp2
                from nnc_tpu.render.rays import ndc_rays
                vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
                ro_j, rd_j = ndc_rays(H, W, float(scene["K"][0][0]), 1.0,
                                      jnp2.asarray(ro), jnp2.asarray(rd))
                ro, rd = np.asarray(ro_j), np.asarray(rd_j)
            out = renderer.render_image(params_c, params_f, ls_c, ls_f,
                                        ro, rd, near, far, rc, viewdirs=vd)
            rgb = out["rgb_map"]
        frames.append(rgb)
        if i == 0:
            t0 = time.time()   # exclude the compile-heavy first frame
        import imageio.v2 as imageio
        imageio.imwrite(os.path.join(args.out, f"frame_{i:03d}.png"),
                        to8b(rgb))
        rate = (f"({i * H * W / (time.time() - t0) / 1e6:.2f} M rays/s)"
                if i else "(compiling)")
        print(f"\rframe {i + 1}/{len(poses)} {rate}",
              end="", flush=True)
    print()

    from nnc_tpu.utils.video import write_video
    frames8 = to8b(np.stack(frames))
    path = write_video(os.path.join(args.out, "spiral"), frames8,
                       fps=30, quality=8)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
