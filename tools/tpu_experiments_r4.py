"""Consolidated TPU experiments: selection decomposition, compact v2 A/B,
exact-path tile A/B. Run each part guarded so one failure doesn't kill all."""
import time, sys, traceback
import numpy as np
sys.path.insert(0, "/root/repo")
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()
import jax, jax.numpy as jnp
from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
from nnc_tpu.models import nerf
from nnc_tpu.render import occupancy, renderer
from nnc_tpu.render.rays import get_rays_np
from nnc_tpu.render.occupancy import _ray_span, _lookup_coords, _compact_stride

mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
params_f = make_solid_mlp(mlp)
grid = occupancy.build_occupancy_grid(make_solid_mlp(mlp), None, mlp, res=128)
FH = FW = 400
Kf = np.array([[0.8*FW,0,FW/2],[0,0.8*FW,FH/2],[0,0,1]], np.float32)
pose = look_at_poses(1, seed=0)[0]
ro_hw, rd_hw = get_rays_np(FH, FW, Kf, pose[:3,:4])
C, B, fac = 48, 16, 4
near, far = 2.0, 6.0
H, W = FH, FW
Hs, Ws = H//fac, W//fac
sub = lambda a: jnp.asarray(np.ascontiguousarray(a[fac//2::fac, fac//2::fac].reshape(Hs*Ws, 3)))
ro_s, rd_s = sub(ro_hw), sub(rd_hw)

def timed(fn, *a, iters=200):
    out = fn(*a); np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*a)
    np.asarray(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter()-t0)/iters*1e3

def part(name):
    print(f"--- {name}", flush=True)

# ---------------- Part 1: selection decomposition ----------------
try:
    part("selection decomposition (10000 blocks, C=48)")
    margin = 2.0 * max(h - l for l, h in zip(grid.lo, grid.hi)) / grid.res

    @jax.jit
    def spanonly(ro_s, rd_s):
        return _ray_span(grid, ro_s, rd_s, near, far)

    @jax.jit
    def sweep(ro_s, rd_s):
        t0, t1 = _ray_span(grid, ro_s, rd_s, near, far)
        t0 = jnp.maximum(t0[:, None] - margin, near)
        t1 = jnp.minimum(t1[:, None] + margin, far)
        span = jnp.maximum(t1 - t0, 0.0)
        t = (jnp.arange(C, dtype=jnp.float32) + 0.5) / C
        z_s = t0 + span * t
        coords = [ro_s[:, d:d+1] + rd_s[:, d:d+1] * z_s for d in range(3)]
        occ = _lookup_coords(grid, *coords) & (span > 0)
        occ = occ | jnp.roll(occ, 1, 1) | jnp.roll(occ, -1, 1)
        return occ

    @jax.jit
    def compact_v1(occ):
        return _compact_stride(occ, C, B)

    def _compact_stride_v2(occ, n_candidates, budget):
        m = jnp.sum(occ, axis=-1, keepdims=True)
        stride = jnp.maximum((m + budget - 1) // budget, 1)
        rank = jnp.cumsum(occ, axis=-1) - 1
        kept = occ & (rank % stride == 0)
        krank = jnp.cumsum(kept, axis=-1) - 1
        ci = jax.lax.broadcasted_iota(jnp.int32, occ.shape, 1)
        cols, masks = [], []
        for b in range(budget):
            sel = kept & (krank == b)
            cols.append(jnp.sum(jnp.where(sel, ci, 0), axis=-1))
            masks.append(jnp.any(sel, axis=-1))
        return jnp.stack(cols, -1), jnp.stack(masks, -1), stride.astype(jnp.float32)

    @jax.jit
    def compact_v2(occ):
        return _compact_stride_v2(occ, C, B)

    occ = sweep(ro_s, rd_s)
    k1, m1, _ = compact_v1(occ); k2, m2, _ = compact_v2(occ)
    same_mask = bool(jnp.all(m1 == m2))
    same_keep = bool(jnp.all(jnp.where(m1, k1, -1) == jnp.where(m2, k2, -1)))
    print(f"span only      : {timed(spanonly, ro_s, rd_s):6.2f} ms")
    print(f"span+sweep     : {timed(sweep, ro_s, rd_s):6.2f} ms")
    print(f"compact v1 topk: {timed(compact_v1, occ):6.2f} ms")
    print(f"compact v2 red : {timed(compact_v2, occ):6.2f} ms  equal={same_mask and same_keep}")
except Exception:
    traceback.print_exc()

# ---------------- Part 2: exact-path tile A/B ----------------
try:
    part("exact path fusion_ray_tile 64 vs 128, +forced sub-128 in-kernel pts (40960-ray chunk)")
    CH = 40960
    roc = jnp.asarray(ro_hw.reshape(-1,3)[:CH]); rdc = jnp.asarray(rd_hw.reshape(-1,3)[:CH])
    key = jax.random.PRNGKey(0)
    # RESOLVED (r5, 2026-08-19 TPU run): r_t=64 631K > r_t=128 569K rays/s;
    # forced sub-128 in-kernel pts byte-identical + neutral (64.86 vs
    # 64.89 ms) -> FORCE_INKERNEL_PTS gate and legacy 8-row producer
    # deleted; in-kernel pts is unconditional now. This part re-measures
    # the tile choice only.
    for rt in (64, 128):
        rc = renderer.RenderConfig(
            mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
            chunk=CH, use_fused_mlp=True, use_fused_compositing=True,
            early_term_eps=1e-4, empty_ray_eps=1e-3, fusion_ray_tile=rt)
        def run():
            return renderer.render_chunk(params_f, params_f, None, None, roc, rdc, 2.0, 6.0, key, rc)
        out = run(); np.asarray(jnp.sum(out["rgb_map"]))
        t0=time.perf_counter(); N=60
        for _ in range(N): out = run()
        s = float(np.asarray(jnp.sum(out["rgb_map"])))
        dt=(time.perf_counter()-t0)/N
        print(f"r_t={rt:4d}: {dt*1e3:7.2f} ms/chunk  ({CH/dt/1e3:.0f}K rays/s)  rgbsum={s:.2f}", flush=True)
except Exception:
    traceback.print_exc()

# ---------------- Part 3: current fast frame (sanity) ----------------
try:
    part("fast frame current default")
    rc = renderer.RenderConfig(
        mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
        chunk=40960, use_fused_mlp=True, use_fused_compositing=True,
        early_term_eps=1e-4, empty_ray_eps=1e-3)
    ro4 = jnp.asarray(ro_hw.reshape(-1,3)); rd4 = jnp.asarray(rd_hw.reshape(-1,3))
    vd4 = rd4 / jnp.linalg.norm(rd4, axis=-1, keepdims=True)
    @jax.jit
    def run_frame(a,b,c):
        return occupancy.render_rays_fast(params_f, None, a, b, c, near, far, grid, rc,
            n_candidates=C, budget=B, layout=(FH,FW), subsample=fac)
    out = run_frame(ro4, rd4, vd4); np.asarray(jnp.sum(out["rgb_map"]))
    t0=time.perf_counter(); N=100
    for _ in range(N): out = run_frame(ro4, rd4, vd4)
    np.asarray(jnp.sum(out["rgb_map"]))
    dt=(time.perf_counter()-t0)/N
    print(f"frame: {dt*1e3:6.2f} ms  ({FH*FW/dt/1e6:.2f}M rays/s)")
except Exception:
    traceback.print_exc()

# ---------------- Part 4: occ tile re-sweep under in-kernel pts ----------------
try:
    part("occ kernel tile sweep (fast frame)")
    ro4 = jnp.asarray(ro_hw.reshape(-1,3)); rd4 = jnp.asarray(rd_hw.reshape(-1,3))
    vd4 = rd4 / jnp.linalg.norm(rd4, axis=-1, keepdims=True)
    for rt, sb in ((128, 8), (128, 16), (256, 8), (256, 16), (384, 8)):
        rc = renderer.RenderConfig(
            mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
            chunk=40960, use_fused_mlp=True, use_fused_compositing=True,
            early_term_eps=1e-4, empty_ray_eps=1e-3,
            occ_ray_tile=rt, occ_sample_block=sb)
        @jax.jit
        def run_frame(a,b,c,rc=rc):
            return occupancy.render_rays_fast(params_f, None, a, b, c, near, far, grid, rc,
                n_candidates=C, budget=B, layout=(FH,FW), subsample=fac)
        out = run_frame(ro4, rd4, vd4); np.asarray(jnp.sum(out["rgb_map"]))
        t0=time.perf_counter(); N=100
        for _ in range(N): out = run_frame(ro4, rd4, vd4)
        s = float(np.asarray(jnp.sum(out["rgb_map"])))
        dt=(time.perf_counter()-t0)/N
        print(f"tile {rt:3d}x{sb:<2d}: {dt*1e3:6.2f} ms ({FH*FW/dt/1e6:.2f}M rays/s) rgbsum={s:.1f}", flush=True)
except Exception:
    traceback.print_exc()

# ---------------- Part 5: candidate count C=40 vs 48 (quality+perf) ----------------
try:
    part("candidate count sweep C in {40, 48, 56} (fast frame, B=16)")
    ro4 = jnp.asarray(ro_hw.reshape(-1,3)); rd4 = jnp.asarray(rd_hw.reshape(-1,3))
    vd4 = rd4 / jnp.linalg.norm(rd4, axis=-1, keepdims=True)
    rc = renderer.RenderConfig(
        mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
        chunk=40960, use_fused_mlp=True, use_fused_compositing=True,
        early_term_eps=1e-4, empty_ray_eps=1e-3)
    # exact reference frame for devPSNR
    rc_exact = renderer.RenderConfig(
        mlp=mlp, n_samples=64, n_importance=128, white_bkgd=True,
        chunk=40960, use_fused_mlp=True, use_fused_compositing=True,
        early_term_eps=1e-4, empty_ray_eps=1e-3)
    key = jax.random.PRNGKey(0)
    ref = renderer.render_image(params_f, params_f, None, None,
                                ro_hw.reshape(-1,3), rd_hw.reshape(-1,3),
                                near, far, rc_exact)["rgb_map"]
    ref = np.asarray(ref)
    for Cc in (40, 48, 56):
        @jax.jit
        def run_frame(a,b,c,Cc=Cc):
            return occupancy.render_rays_fast(params_f, None, a, b, c, near, far, grid, rc,
                n_candidates=Cc, budget=B, layout=(FH,FW), subsample=fac)
        out = run_frame(ro4, rd4, vd4); np.asarray(jnp.sum(out["rgb_map"]))
        t0=time.perf_counter(); N=100
        for _ in range(N): out = run_frame(ro4, rd4, vd4)
        np.asarray(jnp.sum(out["rgb_map"]))
        dt=(time.perf_counter()-t0)/N
        img = np.asarray(out["rgb_map"])
        mse = float(np.mean((img - ref)**2)); maxdev = float(np.abs(img - ref).max())
        psnr = -10*np.log10(mse) if mse > 0 else 99.0
        print(f"C={Cc}: {dt*1e3:6.2f} ms ({FH*FW/dt/1e6:.2f}M rays/s) devPSNR={psnr:.1f} maxdev={maxdev:.3f}", flush=True)
except Exception:
    traceback.print_exc()
