"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nnc_tpu import parallel
from nnc_tpu.models import nerf
from nnc_tpu.render import renderer
from nnc_tpu.train import lsa


def test_virtual_devices_present():
    assert jax.device_count() == 8


def test_make_mesh_shapes():
    mesh = parallel.make_mesh(8, ("data",))
    assert mesh.shape == {"data": 8}
    mesh2 = parallel.make_mesh(8, ("data", "model"))
    assert mesh2.shape["data"] * mesh2.shape["model"] == 8
    assert mesh2.shape["model"] > 1


def test_shard_train_inputs_layout():
    mesh = parallel.make_mesh(8, ("data",))
    (a,) = parallel.shard_train_inputs(mesh, np.zeros((16, 3), np.float32))
    assert a.sharding.spec == jax.sharding.PartitionSpec("data")


def test_data_parallel_train_step_matches_single_device():
    """The sharded LSA step must produce the same loss/updates as 1 device."""
    import optax
    mlp = nerf.NeRFConfig(W=16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=8, n_importance=4, chunk=16)
    key = jax.random.PRNGKey(0)
    params = (nerf.init_params(key, mlp),
              nerf.init_params(jax.random.fold_in(key, 1), mlp))
    scales = (nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(scales)
    step = lsa.make_train_step(rc, optimizer)

    rng = np.random.default_rng(0)
    ro = rng.normal(0, 1, (16, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (16, 3)).astype(np.float32) - [0, 0, 2]
    tgt = rng.uniform(0, 1, (16, 3)).astype(np.float32)
    k = jax.random.PRNGKey(7)

    s1, _, loss1, _ = step(scales, opt_state, params, jnp.asarray(ro),
                           jnp.asarray(rd), None, jnp.asarray(tgt), 2.0, 6.0,
                           k)

    mesh = parallel.make_mesh(8, ("data",))
    params_r = (parallel.replicate_params(mesh, params[0]),
                parallel.replicate_params(mesh, params[1]))
    scales_r = parallel.replicate_params(mesh, scales)
    opt_r = optimizer.init(scales_r)
    ro_s, rd_s, tgt_s = parallel.shard_train_inputs(mesh, ro, rd, tgt)
    s2, _, loss2, _ = step(scales_r, opt_r, params_r, ro_s, rd_s, None,
                           tgt_s, 2.0, 6.0, k)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    for name in s1[0]:
        np.testing.assert_allclose(np.asarray(s1[0][name]),
                                   np.asarray(s2[0][name]), rtol=1e-4,
                                   atol=1e-6)


def test_data_parallel_occ_lsa_step_matches_single_device():
    """The occupancy-accelerated LSA loss under a data mesh (sharded ray
    batch, replicated grid) must match the single-device step — selection
    is per-ray arithmetic + gathers on replicated tables, so sharding
    introduces no cross-device dependence."""
    import optax
    from nnc_tpu.render import occupancy

    mlp = nerf.NeRFConfig(W=16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=8, n_importance=4,
                               chunk=16)
    key = jax.random.PRNGKey(0)
    params = (nerf.init_params(key, mlp),
              nerf.init_params(jax.random.fold_in(key, 1), mlp))
    scales = (nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
    grid = occupancy.OccupancyGrid(
        occ=jnp.ones((8, 8, 8), bool), lo=(-2.0,) * 3, hi=(2.0,) * 3)
    optimizer = optax.adam(1e-3)
    step = lsa.make_train_step(rc, optimizer, grid=grid, occ_candidates=8,
                               occ_budget=4)

    rng = np.random.default_rng(0)
    ro = rng.normal(0, 1, (16, 3)).astype(np.float32)
    rd = rng.normal(0, 1, (16, 3)).astype(np.float32) - [0, 0, 2]
    tgt = rng.uniform(0, 1, (16, 3)).astype(np.float32)
    k = jax.random.PRNGKey(7)

    s1, _, loss1, _ = step(scales, optimizer.init(scales), params,
                           jnp.asarray(ro), jnp.asarray(rd), None,
                           jnp.asarray(tgt), 2.0, 6.0, k)

    mesh = parallel.make_mesh(8, ("data",))
    params_r = (parallel.replicate_params(mesh, params[0]),
                parallel.replicate_params(mesh, params[1]))
    scales_r = parallel.replicate_params(mesh, scales)
    ro_s, rd_s, tgt_s = parallel.shard_train_inputs(mesh, ro, rd, tgt)
    s2, _, loss2, _ = step(scales_r, optimizer.init(scales_r), params_r,
                           ro_s, rd_s, None, tgt_s, 2.0, 6.0, k)

    assert float(loss1) == pytest.approx(float(loss2), rel=1e-5)
    for name in s1[0]:
        np.testing.assert_allclose(np.asarray(s1[0][name]),
                                   np.asarray(s2[0][name]), rtol=1e-4,
                                   atol=1e-6)


def test_graft_entry_compiles():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_multichip_render_matches_single():
    from nnc_tpu.render import renderer as rdr
    mlp = nerf.NeRFConfig(W=16)
    rc = rdr.RenderConfig(mlp=mlp, n_samples=8, n_importance=4, chunk=16)
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    rng = np.random.default_rng(1)
    ro = rng.normal(0, 1, (40, 3)).astype(np.float32)
    rd = (rng.normal(0, 0.3, (40, 3)) - [0, 0, 1]).astype(np.float32)
    single = rdr.render_image(params, None, None, None, ro, rd, 2.0, 6.0, rc)
    mesh = parallel.make_mesh(8, ("data",))
    multi = rdr.render_image(params, None, None, None, ro, rd, 2.0, 6.0, rc,
                             mesh=mesh)
    np.testing.assert_allclose(single["rgb_map"], multi["rgb_map"],
                               rtol=1e-5, atol=1e-6)


def test_training_with_fused_flag_on_flagship_config():
    """Regression: use_fused_mlp=True must not route training through the
    (non-differentiable) Pallas kernel on the flagship architecture."""
    import optax
    from nnc_tpu.render import renderer as rdr
    from nnc_tpu.train import lsa
    mlp = nerf.NeRFConfig()  # flagship: fused kernel supports() is True
    rc = rdr.RenderConfig(mlp=mlp, n_samples=4, n_importance=2, chunk=8,
                          use_fused_mlp=True)
    key = jax.random.PRNGKey(0)
    params = (nerf.init_params(key, mlp),
              nerf.init_params(jax.random.fold_in(key, 1), mlp))
    scales = (nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
    opt = optax.adam(1e-3)
    step = lsa.make_train_step(rc, opt)
    rng = np.random.default_rng(0)
    ro = jnp.asarray(rng.normal(0, 0.1, (8, 3)).astype(np.float32))
    rd = jnp.asarray((rng.normal(0, 0.2, (8, 3)) - [0, 0, 1]).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(0, 1, (8, 3)).astype(np.float32))
    out = step(scales, opt.init(scales), params, ro, rd, None, tgt,
               2.0, 6.0, key)
    assert np.isfinite(float(out[2]))


def test_render_image_mesh_fused_kernels_match_single():
    """Fused Pallas kernels under a mesh go through shard_map (pallas_call
    has no SPMD partitioning rule); results are bit-identical to single
    device."""
    import numpy as np
    from nnc_tpu import parallel
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer

    mesh = parallel.make_mesh(8)
    mlp = nerf.NeRFConfig()  # flagship config engages the fused paths
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=8, n_importance=8,
                               chunk=256, use_fused_mlp=True,
                               use_fused_compositing=True)
    rng = np.random.default_rng(0)
    ro = rng.normal(0, 0.1, (300, 3)).astype(np.float32)
    rd = (rng.normal(0, 0.2, (300, 3)) + [0, 0, -1]).astype(np.float32)
    out_m = renderer.render_image(params, params, None, None, ro, rd,
                                  2.0, 6.0, rc, mesh=mesh)
    out_s = renderer.render_image(params, params, None, None, ro, rd,
                                  2.0, 6.0, rc)
    np.testing.assert_array_equal(out_m["rgb_map"], out_s["rgb_map"])


def test_scan_train_step_under_mesh_matches_single_device():
    """The K-step lax.scan LSA update with the ray axis sharded over 'data'
    must match the single-device scan (VERDICT r2 #5: multi-chip training
    keeps the scan-batch dispatch amortization)."""
    import optax
    mlp = nerf.NeRFConfig(W=16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=8, n_importance=4, chunk=16)
    key = jax.random.PRNGKey(0)
    params = (nerf.init_params(key, mlp),
              nerf.init_params(jax.random.fold_in(key, 1), mlp))
    scales = (nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
    optimizer = optax.adam(1e-3)
    scan_step = lsa.make_scan_train_step(rc, optimizer)

    K, N = 3, 16
    rng = np.random.default_rng(0)
    packed = np.concatenate(
        [rng.normal(0, 1, (K, N, 3)).astype(np.float32),
         rng.normal(0, 1, (K, N, 3)).astype(np.float32) - [0, 0, 2],
         rng.normal(0, 1, (K, N, 3)).astype(np.float32),
         rng.uniform(0, 1, (K, N, 3)).astype(np.float32)], axis=-1)
    packed[..., 6:9] /= np.linalg.norm(packed[..., 6:9], axis=-1,
                                       keepdims=True)
    keys = jax.random.split(jax.random.PRNGKey(7), K)

    s1, _, losses1, _ = scan_step(scales, optimizer.init(scales), params,
                                  jnp.asarray(packed), 2.0, 6.0, keys)

    mesh = parallel.make_mesh(8, ("data",))
    params_r = (parallel.replicate_params(mesh, params[0]),
                parallel.replicate_params(mesh, params[1]))
    scales_r = parallel.replicate_params(mesh, scales)
    packed_s, keys_s = parallel.shard_scan_inputs(mesh, packed,
                                                  np.asarray(keys))
    assert packed_s.sharding.spec == jax.sharding.PartitionSpec(
        None, "data", None)
    s2, _, losses2, _ = scan_step(scales_r, optimizer.init(scales_r),
                                  params_r, packed_s, 2.0, 6.0, keys_s)

    np.testing.assert_allclose(np.asarray(losses1), np.asarray(losses2),
                               rtol=1e-5)
    for name in s1[0]:
        np.testing.assert_allclose(np.asarray(s1[0][name]),
                                   np.asarray(s2[0][name]), rtol=1e-4,
                                   atol=1e-6)


def test_tune_lsa_scales_uses_scan_under_mesh():
    """tune_lsa_scales end-to-end on a mesh takes the scan path (use_scan no
    longer requires mesh is None) and produces finite results."""
    mlp = nerf.NeRFConfig(W=16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=8, n_importance=4, chunk=16)
    key = jax.random.PRNGKey(0)
    params_c = nerf.init_params(key, mlp)
    params_f = nerf.init_params(jax.random.fold_in(key, 1), mlp)
    ls_c = nerf.init_lsa_scales(mlp)
    ls_f = nerf.init_lsa_scales(mlp)
    mesh = parallel.make_mesh(8, ("data",))
    params_c = parallel.replicate_params(mesh, params_c)
    params_f = parallel.replicate_params(mesh, params_f)

    class Batcher:
        def __init__(self):
            self.rng = np.random.default_rng(3)

        def next_batch(self):
            ro = self.rng.normal(0, 1, (16, 3)).astype(np.float32)
            rd = self.rng.normal(0, 1, (16, 3)).astype(np.float32) - [0, 0, 2]
            tgt = self.rng.uniform(0, 1, (16, 3)).astype(np.float32)
            return ro, rd, tgt

    out = lsa.tune_lsa_scales(
        params_c, params_f, ls_c, ls_f, Batcher(), rc, 2.0, 6.0,
        epochs=1, n_iters=4, steps_per_call=4, mesh=mesh, verbose=False)
    ls_c2, ls_f2, mean_psnr, mean_loss, gstep, _ = out
    assert gstep == 4
    assert np.isfinite(mean_loss)
    for name in ls_c2:
        assert np.isfinite(np.asarray(ls_c2[name])).all()


def test_tp_fused_mlp_matches_dense():
    """Width-split tensor-parallel fused MLP (Megatron col/row pairs +
    psum over 'model') matches the dense XLA MLP on the virtual mesh
    (VERDICT r2 #7: TP x fused exists; BASELINE.md records why the
    production path stays data-parallel)."""
    from nnc_tpu.ops import mlp_tp_pallas, mlp_pallas

    mlp = nerf.NeRFConfig()  # flagship f32
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    ls = nerf.init_lsa_scales(mlp, std=0.1, key=jax.random.PRNGKey(5))
    N = mlp_pallas.TILE
    pts = jax.random.normal(jax.random.PRNGKey(1), (N, 63))
    views = jax.random.normal(jax.random.PRNGKey(2), (N, 27))
    ref = np.asarray(nerf.apply_mlp(params, pts, views, mlp, ls=ls))

    for axes, shape in ((("model",), (4,)), (("data", "model"), (2, 4))):
        mesh = parallel.make_mesh(np.prod(shape), axes, shape=shape)
        got = np.asarray(mlp_tp_pallas.fused_nerf_mlp_tp(
            params, ls, pts, views, mlp, mesh))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
