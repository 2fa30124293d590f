"""Dev tool: sweep occupancy fast-mode operating points on the real TPU.

Measures rays/s at the bench frame-chunk configuration (160x256) for each
(n_candidates, budget, subsample) point, plus quality vs the exact fused ET
render: max |rgb dev| and deviation-PSNR (-10 log10(mean dev^2)).
"""
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
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--hw", type=int, nargs=2, default=(160, 256))
    ap.add_argument("--floor", action="store_true")
    ap.add_argument("--no-exact", action="store_true",
                    help="skip the exact reference render (frames too big "
                         "for the exact path's HBM footprint): timing only")
    ap.add_argument("--points", type=str, default=None,
                    help="comma list of C:B:sub[:s_blk] tuples, "
                         "e.g. 96:48:4,96:24:4:8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
    from nnc_tpu.models import nerf
    from nnc_tpu.render import occupancy, renderer
    from nnc_tpu.render.rays import get_rays_np

    print("backend:", jax.default_backend())
    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    params_c = make_solid_mlp(mlp)
    params_f = make_solid_mlp(mlp)

    H, W = args.hw
    chunk = H * W
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    rays_o = jnp.asarray(ro.reshape(-1, 3))
    rays_d = jnp.asarray(rd.reshape(-1, 3))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)

    rc = renderer.RenderConfig(
        mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
        chunk=chunk, use_fused_mlp=True, use_fused_compositing=True,
        early_term_eps=1e-4, empty_ray_eps=1e-3)

    # exact reference frame (+ exact-path timing for context)
    if args.no_exact:
        ref = None
    else:
        run_exact = lambda: renderer.render_chunk(
            params_c, params_f, None, None, rays_o, rays_d, 2.0, 6.0, key,
            rc, True)
        out = run_exact()
        ref = np.asarray(out["rgb_map"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run_exact()
        np.asarray(jnp.sum(out["rgb_map"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"exact: {dt * 1e3:7.2f} ms  ({chunk / dt:,.0f} rays/s)")

    grid = occupancy.build_occupancy_grid(params_c, None, mlp, res=128)
    occ_frac = float(np.asarray(jnp.mean(grid.occ.astype(jnp.float32))))
    print(f"grid occupied fraction: {occ_frac:.4f}")

    if args.points:
        points = [tuple(int(x) for x in (p.split(":") + ["8", "128"])[:5])
                  for p in args.points.split(",")]
    else:
        points = [(64, 16, 4, 8, 128), (96, 48, 4, 8, 128),
                  (64, 16, 4, 16, 128), (64, 16, 8, 8, 128),
                  (96, 16, 4, 8, 128), (64, 16, 4, 8, 64)]

    import dataclasses
    empty_grid = occupancy.OccupancyGrid(
        occ=jnp.zeros_like(grid.occ), lo=grid.lo, hi=grid.hi)

    for cand, budget, sub, s_blk, r_t in points:
        rc_p = dataclasses.replace(rc, occ_sample_block=s_blk,
                                   occ_ray_tile=r_t)

        @jax.jit
        def run_fast(ro_, rd_, vd_, g, c=cand, b=budget, s=sub, r=rc_p):
            return occupancy.render_rays_fast(
                params_f, None, ro_, rd_, vd_, 2.0, 6.0, g, r,
                n_candidates=c, budget=b, layout=(H, W), subsample=s)
        if args.floor:
            out_f = run_fast(rays_o, rays_d, vd, empty_grid)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out_f = run_fast(rays_o, rays_d, vd, empty_grid)
            np.asarray(jnp.sum(out_f["rgb_map"]))
            dt = (time.perf_counter() - t0) / args.iters
            print(f"C={cand:3d} B={budget:2d} sub={sub} sblk={s_blk:2d} "
                  f"rt={r_t:2d} FLOOR(empty grid): {dt * 1e3:7.2f} ms",
                  flush=True)
        out_f = run_fast(rays_o, rays_d, vd, grid)
        if ref is not None:
            rgb = np.asarray(out_f["rgb_map"])
            dev = np.abs(rgb - ref)
            dev_psnr = -10 * np.log10(np.mean(dev ** 2) + 1e-12)
            qual = (f"  maxdev {dev.max():.4f}  devPSNR {dev_psnr:.1f} dB")
        else:
            qual = ""
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out_f = run_fast(rays_o, rays_d, vd, grid)
        np.asarray(jnp.sum(out_f["rgb_map"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"C={cand:3d} B={budget:2d} sub={sub} sblk={s_blk:2d} "
              f"rt={r_t:2d}: "
              f"{dt * 1e3:7.2f} ms  ({chunk / dt:,.0f} rays/s)" + qual,
              flush=True)


if __name__ == "__main__":
    main()
