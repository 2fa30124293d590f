"""Occupancy-grid accelerated rendering: grid build, lookup, fast-mode
parity against the exact renderer on in-grid geometry."""
import numpy as np
import jax
import jax.numpy as jnp

from nnc_tpu.data.synthetic import look_at_poses, make_solid_mlp
from nnc_tpu.models import nerf
from nnc_tpu.render import occupancy, renderer
from nnc_tpu.render.rays import get_rays_np


def _setup():
    mlp = nerf.NeRFConfig()
    params = make_solid_mlp(mlp, radius=1.0, density=80.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    ro = jnp.asarray(ro.reshape(-1, 3))
    rd = jnp.asarray(rd.reshape(-1, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return mlp, params, ro, rd, vd


def test_grid_build_and_lookup():
    mlp, params, *_ = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    # octahedron |x|_1 < 1: center occupied, corners of the AABB empty
    assert bool(occupancy.lookup(grid, jnp.zeros((1, 3)))[0])
    assert not bool(occupancy.lookup(grid, jnp.full((1, 3), 1.9))[0])
    assert not bool(occupancy.lookup(grid, jnp.full((1, 3), 5.0))[0])
    frac = float(jnp.mean(grid.occ))
    assert 0.0 < frac < 0.5  # the object occupies a minority of the AABB


def test_fast_render_matches_exact_on_solid_scene():
    mlp, params, ro, rd, vd = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    key = jax.random.PRNGKey(0)
    exact = renderer.render_rays(params, None, None, None, ro, rd, vd,
                                 2.0, 6.0, key, rc, deterministic=True)
    fast = occupancy.render_rays_fast(params, None, ro, rd, vd, 2.0, 6.0,
                                      grid, rc, n_candidates=64, budget=32)
    d = np.abs(np.asarray(fast["rgb_map"]) - np.asarray(exact["rgb_map"]))
    assert d.max() < 0.05, d.max()
    da = np.abs(np.asarray(fast["acc_map"]) - np.asarray(exact["acc_map"]))
    assert da.max() < 0.05, da.max()


def test_compact_stride_preserves_occupied_mass():
    """Over-budget rays stride-subsample occupied candidates; the kept
    samples' dist scaling preserves the occupied span's optical mass to
    within one stride (truncation would drop m - budget cells outright)."""
    rng = np.random.default_rng(0)
    occ = jnp.asarray(rng.random((8, 64)) < 0.6)  # m ~ 38 >> budget
    keep, mask, stride = occupancy._compact_stride(occ, 64, 16)
    m = np.asarray(jnp.sum(occ, axis=-1))
    covered = np.asarray(jnp.sum(mask, axis=-1)) * np.asarray(stride[:, 0])
    assert (np.asarray(jnp.sum(mask, axis=-1)) <= 16).all()
    assert (covered >= m).all() and (covered < m + np.asarray(
        stride[:, 0])).all()
    # kept indices are occupied candidates, in ray order
    keep_np, mask_np = np.asarray(keep), np.asarray(mask)
    occ_np = np.asarray(occ)
    for r in range(8):
        kept = keep_np[r][mask_np[r]]
        assert occ_np[r][kept].all()
        assert (np.diff(kept) > 0).all()


def test_fast_render_over_budget_stride_parity():
    """A budget far below the occupied span stays sound (no truncated far
    mass), only coarser quadrature: parity within a loosened tolerance."""
    mlp, params, ro, rd, vd = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    key = jax.random.PRNGKey(0)
    exact = renderer.render_rays(params, None, None, None, ro, rd, vd,
                                 2.0, 6.0, key, rc, deterministic=True)
    fast = occupancy.render_rays_fast(params, None, ro, rd, vd, 2.0, 6.0,
                                      grid, rc, n_candidates=64, budget=8)
    d = np.abs(np.asarray(fast["rgb_map"]) - np.asarray(exact["rgb_map"]))
    da = np.abs(np.asarray(fast["acc_map"]) - np.asarray(exact["acc_map"]))
    # the solid object's occupied span is ~25-30 of 64 candidates: budget 8
    # forces stride 3-4 on the central rays
    assert d.max() < 0.15, d.max()
    assert da.max() < 0.15, da.max()


def test_fast_render_empty_rays_zero():
    mlp, params, ro, rd, vd = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False)
    # rays pointing away from the object: zero acc
    fast = occupancy.render_rays_fast(params, None, ro, -rd, vd, 2.0, 6.0,
                                      grid, rc, n_candidates=64, budget=32)
    assert float(np.abs(np.asarray(fast["acc_map"])).max()) < 1e-6


def test_fast_render_tiled_matches_exact():
    """Tiled (camera-frame) selection: shared per-block candidates still
    integrate each ray's own density; parity within fast-mode tolerance."""
    mlp, params, ro, rd, vd = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    key = jax.random.PRNGKey(0)
    exact = renderer.render_rays(params, None, None, None, ro, rd, vd,
                                 2.0, 6.0, key, rc, deterministic=True)
    # subsample=2 on the tiny 16x16 fixture: the selection raster must stay
    # finer than the object's screen footprint (~4 px here; real frames use
    # 4 with hundreds of pixels of footprint)
    fast = occupancy.render_rays_fast(params, None, ro, rd, vd, 2.0, 6.0,
                                      grid, rc, n_candidates=64, budget=40,
                                      layout=(16, 16), subsample=2)
    d = np.abs(np.asarray(fast["rgb_map"]) - np.asarray(exact["rgb_map"]))
    assert d.max() < 0.06, d.max()


def test_render_image_fast_full_frame():
    mlp, params, *_ = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    from nnc_tpu.data.synthetic import look_at_poses
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    out = occupancy.render_image_fast(params, None, ro, rd, 2.0, 6.0, rc,
                                      grid, n_candidates=64, budget=40,
                                      subsample=2, row_chunk=8)
    assert out["rgb_map"].shape == (H, W, 3)
    exact = renderer.render_image(params, None, None, None, ro, rd, 2.0,
                                  6.0, rc)
    d = np.abs(out["rgb_map"] - exact["rgb_map"])
    assert d.max() < 0.06, d.max()


def test_render_image_fast_sharded_matches_single():
    """The shard_map multi-chip frame path (rows data-sharded, selection +
    kernels shard-local, zero collectives) must reproduce the single-device
    fast render exactly."""
    from nnc_tpu import parallel

    mlp, params, *_ = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    from nnc_tpu.data.synthetic import look_at_poses
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    single = occupancy.render_image_fast(
        params, None, ro, rd, 2.0, 6.0, rc, grid, n_candidates=64,
        budget=40, subsample=2, row_chunk=8)
    mesh = parallel.make_mesh(4, ("data",))
    sharded = occupancy.render_image_fast(
        params, None, ro, rd, 2.0, 6.0, rc, grid, n_candidates=64,
        budget=40, subsample=2, row_chunk=16, mesh=mesh)
    # each shard is 4 rows = 2 subsampled rows; selection dilation wraps
    # shard-locally, so results differ only where the 3x3 neighborhood
    # crosses a shard boundary — compare with that tolerance
    d = np.abs(single["rgb_map"] - sharded["rgb_map"])
    assert d.max() < 0.06, d.max()
    assert sharded["rgb_map"].shape == (H, W, 3)


def test_open_boundary_fog_scene_stays_accurate():
    """Scenes whose density leaks past the grid AABB (fog-like teachers,
    wrong bounds) violate the 'outside is empty' premise. The build-time
    boundary-shell check flips open_boundary, out-of-box candidates count
    as occupied, and the sweep covers [near, far] — the render degrades to
    budget-limited stride integration instead of silently dropping real
    density (regression: a fog teacher rendered at 18 dB devPSNR with
    out-of-box treated empty; ~50 dB conservative)."""
    mlp = nerf.NeRFConfig()
    # a sphere larger than the AABB: density continues through and beyond
    # every grid boundary face
    params = make_solid_mlp(mlp, radius=4.0, density=8.0)
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    assert grid.open_boundary

    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    exact = renderer.render_image(params, None, None, None, ro, rd,
                                  2.0, 6.0, rc)
    fast = occupancy.render_image_fast(
        params, None, ro, rd, 2.0, 6.0, rc, grid,
        n_candidates=64, budget=48, subsample=2, row_chunk=8)
    d = np.abs(fast["rgb_map"] - exact["rgb_map"])
    assert d.max() < 0.08, d.max()


def test_open_boundary_survives_mesh_frame_render():
    """The shard_map frame path rebuilds the replicated OccupancyGrid; it
    must carry open_boundary through (regression: round 2 dropped it,
    silently re-enabling 'outside is empty' on multi-chip fog renders —
    the exact ~18 dB density-drop failure the boundary detection fixes)."""
    from nnc_tpu import parallel

    mlp = nerf.NeRFConfig()
    params = make_solid_mlp(mlp, radius=4.0, density=8.0)
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          use_fused=False, chunk=32768)
    assert grid.open_boundary

    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = look_at_poses(1, seed=0)[0]
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    single = occupancy.render_image_fast(
        params, None, ro, rd, 2.0, 6.0, rc, grid,
        n_candidates=64, budget=48, subsample=2, row_chunk=8)
    mesh = parallel.make_mesh(4, ("data",))
    sharded = occupancy.render_image_fast(
        params, None, ro, rd, 2.0, 6.0, rc, grid,
        n_candidates=64, budget=48, subsample=2, row_chunk=16, mesh=mesh)
    d = np.abs(single["rgb_map"] - sharded["rgb_map"])
    assert d.max() < 0.06, d.max()


def test_render_image_fast_ndc_matches_exact():
    """NDC (LLFF-family) frame renders through the fast mode: warped rays
    integrate t in [0, 1] inside the NDC cube with pre-warp viewdirs
    (run_nerf.py:119-133); the grid samples the NDC cube. Must match the
    exact NDC render."""
    from nnc_tpu.render.rays import ndc_rays

    mlp, params, *_ = _setup()
    grid = occupancy.build_occupancy_grid(params, None, mlp, res=32,
                                          lo=(-1.0,) * 3, hi=(1.0,) * 3,
                                          use_fused=False, chunk=32768)
    assert bool(grid.occ.any())
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=0,
                               perturb=False, early_term_eps=0.0)
    H, W = 16, 16
    focal = 0.8 * W
    K = np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]],
                 np.float32)
    pose = np.eye(4, dtype=np.float32)  # forward-facing camera at origin
    ro, rd = get_rays_np(H, W, K, pose[:3, :4])
    vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
    import jax.numpy as jnp
    ro_n, rd_n = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro.reshape(-1, 3)),
                          jnp.asarray(rd.reshape(-1, 3)))
    ro_n = np.asarray(ro_n).reshape(H, W, 3)
    rd_n = np.asarray(rd_n).reshape(H, W, 3)

    exact = renderer.render_image(params, None, None, None, ro_n, rd_n,
                                  0.0, 1.0, rc, viewdirs=vd)
    fast = occupancy.render_image_fast(
        params, None, ro_n, rd_n, 0.0, 1.0, rc, grid, n_candidates=64,
        budget=48, subsample=2, row_chunk=8, viewdirs=vd)
    d = np.abs(fast["rgb_map"] - exact["rgb_map"])
    assert d.max() < 0.06, d.max()


def test_executer_occupancy_renders(tmp_path):
    """NeRFModelExecuter test renders route through the fast mode when
    use_occupancy_renders is set (flagship config only)."""
    from nnc_tpu.data.synthetic import make_scene
    from nnc_tpu.framework.executer import NeRFModelExecuter
    from nnc_tpu.models import nerf as nerf_mod

    mlp = nerf_mod.NeRFConfig()  # flagship: fast path engages
    rc = renderer.RenderConfig(mlp=mlp, n_samples=16, n_importance=8,
                               chunk=256, use_occupancy_renders=True)
    scene, (tc, tf_) = make_scene(n_images=2, H=8, W=8, mlp=mlp, rc=rc,
                                  seed=3)
    ex = NeRFModelExecuter(scene, rc, verbose=False)
    sd = {}
    sd.update(nerf_mod.params_to_state_dict(tc, "model."))
    sd.update(nerf_mod.params_to_state_dict(tf_, "model_fine."))
    psnr = ex.test_model(sd)
    assert np.isfinite(psnr)
