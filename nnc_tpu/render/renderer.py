"""Hierarchical NeRF renderer: one jitted function per ray chunk.

The whole per-ray pipeline (stratified sampling -> posenc -> coarse MLP ->
compositing -> inverse-CDF resampling -> fine MLP -> compositing) traces into
a single XLA program with static shapes; chunking over rays replaces the
reference's python-loop batchify (reference: run_nerf.py:31-78, 348-457).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import nerf
from ..ops.posenc import positional_encoding
from ..ops.sampling import sample_pdf, stratified_samples
from .volume import raw2outputs


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    mlp: nerf.NeRFConfig = dataclasses.field(default_factory=nerf.NeRFConfig)
    n_samples: int = 64
    n_importance: int = 128
    multires: int = 10
    multires_views: int = 4
    perturb: bool = True
    white_bkgd: bool = False
    raw_noise_std: float = 0.0
    lindisp: bool = False
    chunk: int = 1024 * 32
    use_fused_mlp: bool = False  # Pallas fused inference kernel (TPU)
    # int8-MXU MLP for deterministic (test) renders: per-channel int8
    # weights + dynamic int8 activations; ~2x MXU rate, bounded error
    use_int8_mlp: bool = False
    # fuse alpha compositing into the kernel (grid over sample blocks with
    # running-transmittance scratch; see ops/render_pallas.py). Enables the
    # compute-skipping thresholds below. Deterministic renders only.
    use_fused_compositing: bool = False
    # stop evaluating a ray tile once every ray's transmittance < this
    # (bounds the rgb error by the same amount); 0 disables.
    early_term_eps: float = 1e-4
    # skip the fine pass for rays whose coarse acc_map is below this (the
    # coarse result is substituted); 0 disables.
    empty_ray_eps: float = 1e-3
    # fused-compositing tile sizes (rays x samples per grid step); 64x32
    # benched best on v5e across {32,64,128}x{16,32,48,64}
    fusion_ray_tile: int = 64
    fusion_sample_block: int = 32
    # training renders use the custom_vjp fused MLP (ops/mlp_train_pallas);
    # set train_with_dw for fine-tuning (weight/bias grads, not just LSA)
    use_fused_train: bool = False
    train_with_dw: bool = False
    # full-frame test renders (executer i_save/test paths) go through the
    # occupancy-grid fast mode (render/occupancy.py) — opt-in, lossy mode
    use_occupancy_renders: bool = False
    # LSA tuning integrates grid-selected samples instead of the 64+192
    # hierarchical sweep (~3x faster steps; see train/lsa.py
    # double_mse_loss_occ) — opt-in, deviates from the exact objective by
    # the fast mode's own rendering deviation
    use_occupancy_tuning: bool = False
    # fast-mode kernel tiles differ from the exact path's: the per-ray
    # sample budget is small (16 vs 192), so small sample blocks (fine
    # skip granularity for trailing all-masked blocks) and wide ray tiles
    # (fewer grid steps) win; r5 sweep on v5e: 128x16 9.51M rays/s vs
    # 128x8 9.33M, 256x16 8.85M, 384x8 8.82M (identical rgbsum)
    occ_ray_tile: int = 128
    occ_sample_block: int = 16


def _query_mlp(params, ls, pts, viewdirs, rc: RenderConfig,
               allow_fused: bool = True):
    """posenc + MLP over (R, S, 3) points. Returns raw (R, S, 4).

    allow_fused=False routes training: the differentiable fused kernel pair
    (use_fused_train) or the XLA MLP (the inference kernel has no VJP)."""
    if not allow_fused and rc.use_fused_train and rc.multires == 10 and \
            rc.multires_views == 4:
        from ..ops.mlp_train_pallas import fused_nerf_mlp_train
        return fused_nerf_mlp_train(params, ls, pts, viewdirs[..., None, :],
                                    rc.mlp, with_dw=rc.train_with_dw)
    if allow_fused and rc.use_fused_mlp and rc.multires == 10 and \
            rc.multires_views == 4:
        # fully fused path: posenc happens inside the Pallas kernel
        if rc.use_int8_mlp:
            from ..ops.mlp_pallas import fused_nerf_mlp_int8_from_points
            return fused_nerf_mlp_int8_from_points(
                params, ls, pts, viewdirs[..., None, :], rc.mlp)
        from ..ops.mlp_pallas import fused_nerf_mlp_from_points
        return fused_nerf_mlp_from_points(params, ls, pts,
                                          viewdirs[..., None, :], rc.mlp)
    pts_emb = positional_encoding(pts, rc.multires)
    views_emb = None
    if rc.mlp.use_viewdirs:
        # encode per ray once, broadcast across samples (saves S-1/S of the
        # view transcendentals vs encoding the broadcast points)
        ve = positional_encoding(viewdirs, rc.multires_views)
        views_emb = jnp.broadcast_to(ve[..., None, :],
                                     pts.shape[:-1] + (ve.shape[-1],))
    if allow_fused and rc.use_fused_mlp:
        from ..ops.mlp_pallas import fused_nerf_mlp
        return fused_nerf_mlp(params, ls, pts_emb, views_emb, rc.mlp)
    return nerf.apply_mlp(params, pts_emb, views_emb, rc.mlp, ls=ls)


def render_rays(params, params_fine, ls, ls_fine, rays_o, rays_d, viewdirs,
                near, far, key, rc: RenderConfig,
                deterministic: bool = False):
    """Render a batch of rays. rays_o/d: (R, 3); near/far scalar or (R, 1).

    Returns dict with rgb_map/disp_map/acc_map (+ rgb0/disp0/acc0/z_std when
    n_importance > 0).
    """
    n_rays = rays_o.shape[0]
    k_strat, k_pdf, k_noise0, k_noise1 = jax.random.split(key, 4)
    perturb = rc.perturb and not deterministic

    # fully fused inference path: posenc+MLP+compositing in one Pallas kernel
    use_full_fusion = False
    if rc.use_fused_compositing and rc.use_fused_mlp and deterministic and \
            rc.raw_noise_std == 0 and rc.multires == 10 and \
            rc.multires_views == 4:
        from ..ops import mlp_pallas
        use_full_fusion = mlp_pallas.supports(rc.mlp)

    def one_pass(p, l, z, noise_key, ro=rays_o, rd=rays_d, vd=None,
                 ray_flags=None, need_weights=True):
        vd = viewdirs if vd is None else vd
        if use_full_fusion:
            from ..ops.render_pallas import fused_render_pass
            # only the coarse pass consumes weights (sample_pdf); skipping
            # them on the fine pass drops the per-block weights writes and
            # the S=192 inverse block-major transform
            o = fused_render_pass(p, l, ro, rd, vd, z, rc.mlp,
                                  early_term_eps=rc.early_term_eps,
                                  ray_flags=ray_flags,
                                  r_t=rc.fusion_ray_tile,
                                  s_blk=rc.fusion_sample_block,
                                  return_weights=need_weights)
            if rc.white_bkgd:
                o["rgb_map"] = o["rgb_map"] + (1.0 - o["acc_map"][..., None])
            return o
        pts = ro[..., None, :] + rd[..., None, :] * z[..., :, None]
        # the fused kernel is inference-only (no VJP): training renders
        # (deterministic=False) take the differentiable XLA path
        raw = _query_mlp(p, l, pts, vd, rc, allow_fused=deterministic)
        return raw2outputs(raw, z, rd, rc.raw_noise_std, rc.white_bkgd,
                           noise_key=None if deterministic else noise_key)

    z_vals = stratified_samples(k_strat, near, far, rc.n_samples, n_rays,
                                perturb, rc.lindisp)
    out = one_pass(params, ls, z_vals, k_noise0)

    ret = {}
    if rc.n_importance > 0:
        ret["rgb0"] = out["rgb_map"]
        ret["disp0"] = out["disp_map"]
        ret["acc0"] = out["acc_map"]

        z_mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(k_pdf, z_mids, out["weights"][..., 1:-1],
                               rc.n_importance, det=not perturb)
        z_samples = jax.lax.stop_gradient(z_samples)
        z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], -1), axis=-1)
        fine_p = params_fine if params_fine is not None else params
        fine_ls = ls_fine if params_fine is not None else ls
        if use_full_fusion and rc.empty_ray_eps > 0:
            r_t = rc.fusion_ray_tile
            # empty-ray culling: sort rays so inactive ones (coarse acc
            # below threshold) cluster into whole skippable ray tiles; the
            # coarse maps substitute for rays in skipped tiles.
            active = out["acc_map"] > rc.empty_ray_eps
            order = jnp.argsort(jnp.logical_not(active), stable=True)
            inv = jnp.argsort(order)
            out_f = one_pass(fine_p, fine_ls, z_all[order], k_noise1,
                             ro=rays_o[order], rd=rays_d[order],
                             vd=viewdirs[order], ray_flags=active[order],
                             need_weights=False)
            n_pad = ((n_rays + r_t - 1) // r_t) * r_t
            tiles = jnp.any(
                jnp.pad(active[order], (0, n_pad - n_rays))
                .reshape(-1, r_t), axis=1)
            computed = jnp.repeat(tiles, r_t)[:n_rays][inv]
            out = {
                k: jnp.where(
                    computed.reshape((-1,) + (1,) * (out_f[k].ndim - 1)),
                    out_f[k][inv], out[k])
                for k in ("rgb_map", "disp_map", "acc_map")}
        else:
            out = one_pass(fine_p, fine_ls, z_all, k_noise1,
                           need_weights=False)
        ret["z_std"] = jnp.std(z_samples, axis=-1)

    ret["rgb_map"] = out["rgb_map"]
    ret["disp_map"] = out["disp_map"]
    ret["acc_map"] = out["acc_map"]
    return ret


@functools.partial(jax.jit, static_argnames=("rc", "deterministic"))
def render_chunk(params, params_fine, ls, ls_fine, rays_o, rays_d, near, far,
                 key, rc: RenderConfig, deterministic: bool = True,
                 viewdirs=None):
    """Jitted fixed-size chunk render; viewdirs derived from rays_d unless
    given explicitly (NDC rays pass pre-warp directions, run_nerf.py:119-133).
    """
    if viewdirs is None:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    return render_rays(params, params_fine, ls, ls_fine, rays_o, rays_d,
                       viewdirs, near, far, key, rc, deterministic)


@functools.lru_cache(maxsize=8)
def _mesh_chunk_fn(mesh):
    """Per-mesh cached shard_map chunk renderer: pallas_call has no SPMD
    partitioning rule, so under plain pjit the fused kernels would be
    replicated with full-chunk inputs on every chip; shard_map hands each
    device its ray shard and the kernels run shard-locally. (Built once per
    mesh — a per-call closure would recompile every render_image call.)"""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    @functools.partial(jax.jit, static_argnames=("rc_", "det"))
    def chunk_fn(p, pf, l, lf, ro_c, rd_c, near_, far_, key_, rc_, det,
                 vd_c=None):
        d = P("data")
        fn = shard_map(
            lambda *a: render_chunk(*a[:8], key_, rc_, det, a[8]),
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), d, d, P(), P(),
                      P() if vd_c is None else d),
            out_specs=d, check_rep=False)
        return fn(p, pf, l, lf, ro_c, rd_c,
                  jnp.asarray(near_, jnp.float32),
                  jnp.asarray(far_, jnp.float32), vd_c)

    return chunk_fn


def render_image(params, params_fine, ls, ls_fine, rays_o, rays_d, near, far,
                 rc: RenderConfig, key=None, viewdirs=None, mesh=None):
    """Render an arbitrary set of rays by chunking (host loop, padded tail).

    rays_o/d: (N, 3) or (H, W, 3). Returns dict of host numpy arrays with
    leading shape matching the input. With ``mesh`` the ray axis of each
    chunk shards over the mesh's 'data' axis (multi-chip rendering).
    """
    lead_shape = rays_o.shape[:-1]
    ro = np.asarray(rays_o, np.float32).reshape(-1, 3)
    rd = np.asarray(rays_d, np.float32).reshape(-1, 3)
    vd = None if viewdirs is None else \
        np.asarray(viewdirs, np.float32).reshape(-1, 3)
    n = ro.shape[0]
    chunk = rc.chunk
    if mesh is not None:
        from ..parallel import data_sharding, replicate_params
        ndata = int(np.prod([mesh.shape[a] for a in mesh.axis_names
                             if a == "data"])) or 1
        chunk = ((chunk + ndata - 1) // ndata) * ndata
        sh = data_sharding(mesh)
        put = lambda a: jax.device_put(jnp.asarray(a), sh)
        params = replicate_params(mesh, params)
        if params_fine is not None:
            params_fine = replicate_params(mesh, params_fine)
        if ls is not None:
            ls = replicate_params(mesh, ls)
        if ls_fine is not None:
            ls_fine = replicate_params(mesh, ls_fine)
    else:
        put = jnp.asarray
    if key is None:
        key = jax.random.PRNGKey(0)

    chunk_fn = render_chunk if mesh is None else _mesh_chunk_fn(mesh)

    outs = []
    for start in range(0, n, chunk):
        end = min(n, start + chunk)
        ro_c, rd_c = ro[start:end], rd[start:end]
        vd_c = None if vd is None else vd[start:end]
        pad = chunk - (end - start)
        if pad:
            ro_c = np.concatenate([ro_c, np.zeros((pad, 3), np.float32)])
            rd_c = np.concatenate([rd_c, np.ones((pad, 3), np.float32)])
            if vd_c is not None:
                vd_c = np.concatenate([vd_c, np.ones((pad, 3), np.float32)])
        res = chunk_fn(params, params_fine, ls, ls_fine,
                       put(ro_c), put(rd_c), near, far,
                       key, rc, True,
                       None if vd_c is None else put(vd_c))
        # keep results on device: materializing per chunk would serialize
        # dispatch with device->host transfers
        outs.append(({k: v[:end - start] for k, v in res.items()
                      if k in ("rgb_map", "disp_map", "acc_map")}))

    merged = {k: np.concatenate([np.asarray(o[k]) for o in outs], axis=0)
              for k in outs[0]}
    return {k: v.reshape(lead_shape + v.shape[1:]) for k, v in merged.items()}
