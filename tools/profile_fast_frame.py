"""Stage-level timing of the occupancy fast-mode frame render (real TPU).

Times the 400x400 bench frame's pipeline stages with cumulative jitted
probes (selection sweep -> sort/permute/gathers -> fused kernel) so
optimization effort targets the dominant stage. Each probe materializes a
tiny sum (block_until_ready does not block on axon).

Usage: python tools/profile_fast_frame.py [--iters 20]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--subsample", type=int, default=4)
    ap.add_argument("--candidates", type=int, default=48)
    ap.add_argument("--budget", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
    from nnc_tpu.models import nerf
    from nnc_tpu.render import occupancy, renderer
    from nnc_tpu.render.rays import get_rays_np

    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    rc = renderer.RenderConfig(
        mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
        chunk=40960, use_fused_mlp=True, use_fused_compositing=True,
        early_term_eps=1e-4, empty_ray_eps=1e-3)
    params_f = make_solid_mlp(mlp)
    grid = occupancy.build_occupancy_grid(make_solid_mlp(mlp), None, mlp,
                                          res=128)

    FH = FW = 400
    Kf = np.array([[0.8 * FW, 0, FW / 2], [0, 0.8 * FW, FH / 2], [0, 0, 1]],
                  np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(FH, FW, Kf, pose[:3, :4])
    ro = jnp.asarray(ro.reshape(-1, 3))
    rd = jnp.asarray(rd.reshape(-1, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    C, B, fac = args.candidates, args.budget, args.subsample
    layout = (FH, FW)
    near, far = 2.0, 6.0

    def timed(fn, *a):
        out = fn(*a)
        jax.tree.map(lambda x: None, out)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / args.iters * 1e3

    # --- stage probes (cumulative) -------------------------------------
    @jax.jit
    def p_select(ro, rd):
        z_s, dists_s, any_s = occupancy._select_sub(
            grid, ro, rd, near, far, C, B, layout, fac)
        return z_s + dists_s

    @jax.jit
    def p_presort(ro, rd, vd):
        """selection + block sort + arithmetic expansion + big gather #1."""
        H, W = layout
        Hs, Ws = H // fac, W // fac
        nb = fac * fac
        z_s, dists_s, any_s = occupancy._select_sub(
            grid, ro, rd, near, far, C, B, layout, fac)
        counts = jnp.sum((dists_s > 0).astype(jnp.int32), axis=-1)
        order_s = jnp.argsort(-counts, stable=True)
        pos_s = jnp.argsort(order_s)
        by, bx = order_s // Ws, order_s % Ws
        offs = (jnp.arange(fac)[:, None] * W + jnp.arange(fac)[None, :]) \
            .reshape(-1)
        ray_idx = ((by * fac * W + bx * fac)[:, None] + offs[None, :]) \
            .reshape(-1)
        rays9 = jnp.concatenate([ro, rd, vd], axis=1)
        rays9_s = jnp.take(rays9, ray_idx, axis=0)
        z_sorted = jnp.repeat(z_s[order_s], nb, axis=0)
        return rays9_s[:, 0] + z_sorted[:, 0] + pos_s.astype(jnp.float32)[0]

    @jax.jit
    def p_full(ro, rd, vd):
        return occupancy.render_rays_fast(
            params_f, None, ro, rd, vd, near, far, grid, rc,
            n_candidates=C, budget=B, layout=layout, subsample=fac)

    # isolated probe: the final (R, 128) maps gather (big gather #2)
    maps_fake = jnp.zeros((FH * FW + 128, 128), jnp.float32)
    k_fake = jnp.asarray(
        np.random.default_rng(0).permutation(FH * FW).astype(np.int32))

    @jax.jit
    def p_maps_gather(maps, k):
        return jnp.sum(jnp.take(maps, k, axis=0))

    t_sel = timed(p_select, ro, rd)
    t_pre = timed(p_presort, ro, rd, vd)
    t_full = timed(p_full, ro, rd, vd)
    t_g2 = timed(p_maps_gather, maps_fake, k_fake)

    R = FH * FW
    print(f"frame {FH}x{FW}  C={C} B={B} sub={fac}  iters={args.iters}")
    print(f"  select_sub (sweep+compact):    {t_sel:7.2f} ms")
    print(f"  + sort/expand/gather#1:        {t_pre:7.2f} ms "
          f"(delta {t_pre - t_sel:+.2f})")
    print(f"  full frame:                    {t_full:7.2f} ms "
          f"(delta {t_full - t_pre:+.2f} = producer+kernel+gather#2)")
    print(f"  isolated maps gather#2 probe:  {t_g2:7.2f} ms")
    print(f"  => rays/s: {R / (t_full / 1e3) / 1e6:.2f}M")


if __name__ == "__main__":
    main()
