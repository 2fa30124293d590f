"""Dev tool: per-pass timing of the fused ET kernel across block sizes."""
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
    from nnc_tpu.models import nerf
    from nnc_tpu.ops.render_pallas import fused_render_pass
    from nnc_tpu.ops.sampling import sample_pdf, stratified_samples
    from nnc_tpu.render.rays import get_rays_np

    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    params = make_solid_mlp(mlp)

    H, W = 64, 128  # full frame, object centered
    chunk = H * W
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    ro = jnp.asarray(ro.reshape(-1, 3))
    rd = jnp.asarray(rd.reshape(-1, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    key = jax.random.PRNGKey(0)
    z_c = stratified_samples(key, 2.0, 6.0, 64, chunk, False)

    def timed(fn, label):
        fn = jax.jit(fn)  # whole pass in one program (prep fuses; the
        # tunnel makes eager op-by-op dispatch dominate otherwise)
        out = fn()
        probe = np.asarray(jnp.sum(out["rgb_map"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        np.asarray(jnp.sum(out["rgb_map"]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {dt * 1e3:7.2f} ms  ({chunk / dt:,.0f} rays/s)")
        return out, dt

    # coarse pass scan
    print("== coarse (S=64) ==")
    best_c = None
    for r_t, s_blk in ((32, 32), (64, 16), (64, 32), (64, 64), (128, 32)):
        out, dt = timed(lambda r=r_t, s=s_blk: fused_render_pass(
            params, None, ro, rd, vd, z_c, mlp, early_term_eps=1e-4,
            r_t=r, s_blk=s), f"coarse {r_t}x{s_blk}")
        if best_c is None or dt < best_c[2]:
            best_c = (r_t, s_blk, dt, out)

    r_t, s_blk, dt_c, out_c = best_c
    print(f"best coarse: {r_t}x{s_blk}")

    # fine pass scan (with flags from the coarse pass, sorted)
    acc = out_c["acc_map"]
    active = acc > 1e-3
    print(f"active fraction: {float(jnp.mean(active)):.3f}")
    z_mids = 0.5 * (z_c[..., 1:] + z_c[..., :-1])
    z_s = sample_pdf(key, z_mids, out_c["weights"][..., 1:-1], 128, det=True)
    z_all = jnp.sort(jnp.concatenate([z_c, z_s], -1), axis=-1)
    order = jnp.argsort(jnp.logical_not(active), stable=True)
    z_o, ro_o, rd_o, vd_o, act_o = (z_all[order], ro[order], rd[order],
                                    vd[order], active[order])

    print("== fine (S=192, flags+sort) ==")
    for r_t, s_blk in ((32, 32), (64, 32), (64, 64), (128, 32), (64, 48)):
        timed(lambda r=r_t, s=s_blk: fused_render_pass(
            params, None, ro_o, rd_o, vd_o, z_o, mlp, early_term_eps=1e-4,
            ray_flags=act_o, r_t=r, s_blk=s), f"fine {r_t}x{s_blk}")

    print("== fine without flags (ET only) ==")
    for r_t, s_blk in ((64, 32),):
        timed(lambda r=r_t, s=s_blk: fused_render_pass(
            params, None, ro, rd, vd, z_all, mlp, early_term_eps=1e-4,
            r_t=r, s_blk=s), f"fine-noflags {r_t}x{s_blk}")
    print("== fine dense (no ET, no flags) ==")
    timed(lambda: fused_render_pass(
        params, None, ro, rd, vd, z_all, mlp, early_term_eps=0.0,
        r_t=64, s_blk=32), "fine-dense 64x32")


if __name__ == "__main__":
    main()
