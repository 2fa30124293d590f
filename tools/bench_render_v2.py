"""Dev benchmark: fused render with ET/culling vs round-1 paths on the TPU.

Renders an activated synthetic teacher scene (real surfaces + empty rays) at
the flagship operating point. Timings materialize a small probe (np.asarray
of a reduced scalar) because block_until_ready does not block on axon.
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
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nnc_tpu.data.synthetic import make_solid_mlp
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer
    from nnc_tpu.render.rays import get_rays_np

    print("backend:", jax.default_backend(), jax.devices())
    chunk = args.chunk
    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    params_c = make_solid_mlp(mlp)
    params_f = make_solid_mlp(mlp)

    # camera rays of a real view: coherent mix of surface hits + empty rays
    H, W = 64, 128  # full frame (object centered), chunk = H*W
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    from nnc_tpu.data.synthetic import look_at_poses
    pose = look_at_poses(1, seed=0)[0]
    ro_all, rd_all = get_rays_np(H, W, K, pose[:3, :4])
    ro_all = ro_all.reshape(-1, 3)[:chunk]
    rd_all = rd_all.reshape(-1, 3)[:chunk]
    rays_o = jnp.asarray(ro_all)
    rays_d = jnp.asarray(rd_all)

    def make_rc(**kw):
        return renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=128,
                                     white_bkgd=True, chunk=chunk, **kw)

    variants = {
        "xla": make_rc(),
        "fused_mlp": make_rc(use_fused_mlp=True),
        "fused_noet": make_rc(use_fused_mlp=True, use_fused_compositing=True,
                              early_term_eps=0.0, empty_ray_eps=0.0),
    }
    for r_t, s_blk in ((64, 32),):
        variants[f"fused_et_{r_t}x{s_blk}"] = make_rc(
            use_fused_mlp=True, use_fused_compositing=True,
            early_term_eps=1e-4, empty_ray_eps=1e-3,
            fusion_ray_tile=r_t, fusion_sample_block=s_blk)

    results = {}
    for name, rc in variants.items():
        if name == "xla" and not args.check:
            continue
        run = lambda rc=rc: renderer.render_chunk(
            params_c, params_f, None, None, rays_o, rays_d, 2.0, 6.0, key,
            rc, True)
        t0 = time.perf_counter()
        out = run()
        rgb = np.asarray(out["rgb_map"])
        print(f"{name}: compile+1st {time.perf_counter() - t0:.1f}s")
        results[name] = rgb
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run()
        np.asarray(jnp.sum(out["rgb_map"]))
        dt = time.perf_counter() - t0
        rps = chunk * args.iters / dt
        print(f"{name}: {rps:,.0f} rays/s  ({dt / args.iters * 1e3:.2f} ms/chunk)")

    if args.check:
        base = results["xla"]
        frac = None
        for name, rgb in results.items():
            if name == "xla":
                continue
            d = np.abs(rgb - base)
            print(f"{name} vs xla: max {d.max():.5f} mean {d.mean():.6f}")
        # how much of the scene is empty (culling potential)
        rc = variants["xla"]
        out = renderer.render_chunk(params_c, params_f, None, None, rays_o,
                                    rays_d, 2.0, 6.0, key, rc, True)
        acc = np.asarray(out["acc_map"])
        print(f"active-ray fraction (acc>1e-3): {(acc > 1e-3).mean():.3f}")


if __name__ == "__main__":
    main()
