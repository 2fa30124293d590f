"""Multi-scene data-parallel LSA driver (BASELINE.md config 5).

Tunes several scenes' models simultaneously over a ('scene', 'data') device
mesh — each device group owns one scene — then renders each scene's test
views. Falls back to synthetic scenes when no checkpoints/datasets are given.

Usage:
  python tools/multi_scene.py --synthetic --n-scenes 2 --iters 200
  python tools/multi_scene.py --ckpts lego.tar fern.tar \
      --datasets blender llff --iters 500
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpts", nargs="*", default=None)
    ap.add_argument("--datasets", nargs="*", default=None)
    ap.add_argument("--dataset-paths", nargs="*", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--n-scenes", type=int, default=2)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n-rand", type=int, default=1024)
    args = ap.parse_args()

    import jax
    from nnc_tpu.data.rays import RayBatcher
    from nnc_tpu.models import nerf
    from nnc_tpu.parallel import multi_scene
    from nnc_tpu.render import renderer

    if args.synthetic:
        from nnc_tpu.data import synthetic
        mlp = nerf.NeRFConfig(W=64)
        rc = renderer.RenderConfig(mlp=mlp, n_samples=32, n_importance=16,
                                   chunk=2048)
        scenes, params_list = [], []
        for i in range(args.n_scenes):
            scene, (tc, tf_) = synthetic.make_scene(n_images=4, H=32, W=32,
                                                    mlp=mlp, rc=rc, seed=i)
            scene["n_importance"] = 16
            scenes.append(scene)
            params_list.append((tc, tf_))
    else:
        from nnc_tpu.train.presets import load_scene
        from nnc_tpu.utils import ckpt as cku
        mlp = nerf.NeRFConfig()
        scenes, params_list = [], []
        paths = args.dataset_paths or [None] * len(args.ckpts)
        for ck, ds, dp in zip(args.ckpts, args.datasets, paths):
            wrapper, _ = cku.nerf_tar_to_wrapper_dict(ck)
            pc, _ = nerf.params_from_state_dict(wrapper, "model.", mlp)
            pf, _ = nerf.params_from_state_dict(wrapper, "model_fine.", mlp)
            scenes.append(load_scene(ds, dp))
            params_list.append((pc, pf))
        rc = renderer.RenderConfig(
            mlp=mlp, n_samples=64,
            n_importance=int(max(s.get("n_importance", 128)
                                 for s in scenes)))

    n_dev = jax.device_count()
    mesh = None
    if n_dev % len(scenes) == 0 and n_dev >= len(scenes):
        mesh = multi_scene.make_scene_mesh(len(scenes))
        print(f"mesh: {dict(mesh.shape)} over {n_dev} devices")

    scales_list = [(nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
                   for _ in scenes]
    batchers = [RayBatcher(s["images"], s["poses"], s["K"], s["i_train"],
                           args.n_rand, mode=s.get("batching_mode", "image"),
                           seed=i)
                for i, s in enumerate(scenes)]

    tuned, psnrs = multi_scene.tune_multi_scene(
        scenes, params_list, scales_list, rc, batchers=batchers,
        learning_rate=args.lr, n_iters=args.iters, mesh=mesh)
    for i, p in enumerate(psnrs):
        print(json.dumps({"scene": i, "train_psnr": p}))


if __name__ == "__main__":
    main()
