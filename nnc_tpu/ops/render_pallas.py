"""Fused NeRF render pass with early ray termination (TPU fast path).

One Pallas kernel runs posenc + the 12-layer MLP + alpha compositing over a
grid of (ray tiles x sample blocks). Compositing state (cumulative
sigma*dist, running rgb/acc/depth) lives in VMEM scratch across the sample
blocks of a ray tile, which bounds VMEM by the *block*, not the array (the
round-1 full-fusion kernel OOMed because it scoped the whole chunk).

Compute skipping (the lever past the dense-evaluation ceiling):
  * early termination: once every ray in a tile has accumulated optical
    depth > -log(eps_T), the remaining sample blocks of that tile skip the
    MLP entirely (`@pl.when` predication; the transmittance left behind
    bounds the rgb error by eps_T).
  * empty-ray culling: a per-ray-tile flag (from the coarse pass's acc_map)
    skips whole tiles in the fine pass; the renderer sorts rays so inactive
    rays cluster into skippable tiles and substitutes the coarse result.

Semantics match render/volume.py raw2outputs with its 1e-10 cumprod epsilon
replaced by the exact identity T = exp(-cumsum(sigma*dist)) (same divergence
the round-1 kernel documented). Reference semantics: run_nerf.py:285-345
(raw2outputs) and :348-457 (render_rays); the early-termination /
culling thresholds are this implementation's extension (exact when 0).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models import nerf
from .mlp_pallas import _mlp_body_pts, _pack_weights

# ray-tile and sample-block sizes. Half-tiles of the interleaved MLP chains
# must stay multiples of 16 sublanes (4-row ref slices miscompile on Mosaic),
# so R_TILE is a multiple of 32.
R_TILE = 32
S_BLK = 32

_W_ORDER = ["w0", "w1", "w2", "w3", "w4", "w5a", "w5b", "w6", "w7",
            "wf", "wa", "wva", "wvb", "wr"]
_B_ORDER = ["b0", "b1", "b2", "b3", "b4", "b5", "b6", "b7", "bf", "ba",
            "bv", "br"]


def _scan_lanes_inclusive(x, s):
    """Exact f32 inclusive cumsum along the lane axis (Hillis-Steele
    shift-add; jnp.cumsum is not lowered by Mosaic and a triangular matmul
    would round through bf16)."""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < s:
        shifted = pltpu.roll(x, k, axis=1)
        x = x + jnp.where(col >= k, shifted, 0.0)
        k *= 2
    return x


def _composite_block(raw, dists_blk, z_blk, csd_in, h, s):
    """Composite one (h rays x s samples) block given the accumulated
    optical depth ``csd_in`` (h, 1) from earlier blocks. Returns
    (maps_add (h, 128), weights (h, s), csd_add (h, 1))."""
    sigma = jax.nn.relu(raw[:, 3]).reshape(h, s)
    sd = sigma * dists_blk
    # exclusive cumsum computed directly (inclusive(x) - x catastrophically
    # cancels at the 1e10 far-sentinel sample, wiping the accumulated depth)
    col = jax.lax.broadcasted_iota(jnp.int32, sd.shape, 1)
    sd_prev = jnp.where(col >= 1, pltpu.roll(sd, 1, axis=1), 0.0)
    excl = _scan_lanes_inclusive(sd_prev, s)
    trans = jnp.exp(-(csd_in + excl))
    alpha = 1.0 - jnp.exp(-sd)
    w = alpha * trans

    cols = []
    for c in range(3):
        rgb_c = jax.nn.sigmoid(raw[:, c]).reshape(h, s)
        cols.append(jnp.sum(w * rgb_c, axis=1, keepdims=True))
    acc = jnp.sum(w, axis=1, keepdims=True)
    depth = jnp.sum(w * z_blk, axis=1, keepdims=True)
    maps_add = jnp.concatenate(
        cols + [acc, depth, jnp.zeros((h, 128 - 5), jnp.float32)], axis=-1)
    return maps_add, w, excl[:, s - 1:s] + sd[:, s - 1:s]


def _make_kernel(r_t, s_blk, n_j, term_csd, want_weights=True):
    def kernel(work_ref, ptsdir_ref, rays_ref, *refs):
        n_out = 4 if want_weights else 3
        mlp_refs = refs[:-n_out]
        maps_ref = refs[-n_out]
        w_ref = refs[-3] if want_weights else None
        csd_ref, acc_ref = refs[-2], refs[-1]
        dtype = mlp_refs[0].dtype
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            csd_ref[:] = jnp.zeros_like(csd_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # work_ref (scalar-prefetched, one entry per (i, j) block) folds the
        # per-tile ray flag with the all-masked-block skip: a block whose
        # dists are all 0 contributes exactly nothing (alpha = 1 - exp(0)
        # = 0, csd unchanged). Occupancy-mode selection compacts occupied
        # samples to the front and the renderer sorts rays by occupied
        # count, so trailing blocks of light tiles and whole empty tiles are
        # precomputed dead — their input blocks are index-remapped to block
        # 0 (see _fused_render_et_call), which elides the DMA entirely for
        # consecutive skipped steps. Exact-mode dists are strictly positive
        # (diff + 1e10 sentinel): no behavior change there. Early
        # termination (alive) stays a runtime predicate.
        work_on = work_ref[pl.program_id(0) * n_j + j] != 0
        alive = jnp.min(csd_ref[:]) < term_csd
        active = jnp.logical_and(work_on, alive)

        @pl.when(active)
        def _():
            half = r_t // 2
            # input arrives transposed (2, r_t*s_blk) [z, dists] — lane-
            # dense in HBM (a (T, k) block pads k -> 128 lanes and costs
            # 16x the DMA bytes) — plus a per-tile (16, lane) ray block.
            # One in-kernel transpose restores the samples-major layout;
            # the pts = o + d*z FMA and the per-ray -> per-sample broadcast
            # (an interleaved sublane jnp.repeat — works on Mosaic) run
            # in-kernel: the XLA producer's 6 expanded pts/dir rows were
            # 1.8 ms/frame of HBM writes at the bench operating point.
            x2 = ptsdir_ref[:].T                      # (q, 2)
            z_blk = x2[:, 0].reshape(r_t, s_blk)
            dists_blk = x2[:, 1].reshape(r_t, s_blk)
            # ray block lanes are padded up to a 128 multiple; only the
            # first r_t rays are real
            rep = jnp.repeat(rays_ref[:].T[:r_t], s_blk, axis=0)
            pts = rep[:, 0:3] + rep[:, 3:6] * x2[:, 0:1]  # (q, 16)
            x8 = jnp.concatenate([pts, rep[:, 6:9]], axis=1)
            # two independent half-tile chains interleave MXU/VPU work
            raw0 = _mlp_body_pts(x8[:half * s_blk], mlp_refs, dtype)
            raw1 = _mlp_body_pts(x8[half * s_blk:], mlp_refs, dtype)
            m0, w0, c0 = _composite_block(
                raw0, dists_blk[:half], z_blk[:half], csd_ref[:half],
                half, s_blk)
            m1, w1, c1 = _composite_block(
                raw1, dists_blk[half:], z_blk[half:], csd_ref[half:],
                r_t - half, s_blk)
            acc_ref[:half] = acc_ref[:half] + m0
            acc_ref[half:] = acc_ref[half:] + m1
            if want_weights:
                w_ref[:half] = w0
                w_ref[half:] = w1
            csd_ref[:half] = csd_ref[:half] + c0
            csd_ref[half:] = csd_ref[half:] + c1

        if want_weights:
            @pl.when(jnp.logical_not(active))
            def _():
                w_ref[:] = jnp.zeros_like(w_ref)

        @pl.when(j == n_j - 1)
        def _():
            maps_ref[:] = acc_ref[:]

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("n_i", "s", "r_t", "s_blk", "term_csd",
                                    "interpret", "want_weights"))
def _fused_render_et_call(packed, biases, work, ptsdir, n_i, s,
                          r_t, s_blk, term_csd, interpret=False,
                          want_weights=True, *, rays16):
    # ptsdir arrives transposed (2, M) [z, dists] with block-major samples
    # on lanes; rays16 is the per-tile padded (16, n_i*lane) ray block the
    # kernel expands pts/dirs from. ``work``: per-(i, j) flags (see
    # fused_render_pass). Dead blocks get their input indices remapped to
    # block 0 below, so runs of skipped grid steps (empty tiles cluster at
    # the end after the count sort; all-masked trailing blocks cluster per
    # tile) elide the input DMAs entirely — without remapping,
    # compute-skipped steps are still DMA-latency-bound (measured: an
    # all-empty chunk rendered *slower* than a 34%-active one).
    n_rays = n_i * r_t
    n_j = s // s_blk

    full = lambda a: pl.BlockSpec(a.shape, lambda i, j, w: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    def remap_T(i, j, w, _nj=n_j):
        base = i * _nj + j
        return (0, jnp.where(w[base] != 0, base, 0))

    in_specs = [
        # lane blocks of r_t*s_blk are 128-divisible (Mosaic requires
        # lane blocks to be 128-divisible or whole-array)
        pl.BlockSpec((2, r_t * s_blk), remap_T, memory_space=pltpu.VMEM),
        # per-tile ray block (constant across j; dead steps remap to tile 0
        # like the sample blocks, so skipped runs elide the DMA). Lane
        # blocks must be 128-divisible, so non-128-multiple tiles arrive
        # padded to the next multiple (the caller builds rays16 so).
        pl.BlockSpec((16, ((r_t + 127) // 128) * 128),
                     lambda i, j, w, _nj=n_j:
                         (0, jnp.where(w[i * _nj + j] != 0, i, 0)),
                     memory_space=pltpu.VMEM),
    ]
    in_specs += [full(packed[k]) for k in _W_ORDER]
    in_specs += [full(biases[k]) for k in _B_ORDER]

    def remap_out(i, j, w, _nj=n_j):
        # dead blocks write to a dedicated spill block past the real rows
        # (their real rows are never written; the caller zero-masks them)
        base = i * _nj + j
        return (jnp.where(w[base] != 0, base, n_i * _nj), 0)

    maps_spec = pl.BlockSpec((r_t, 128), lambda i, j, w: (i, 0),
                             memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((r_t, s_blk), remap_out, memory_space=pltpu.VMEM)
    maps_shape = jax.ShapeDtypeStruct((n_rays, 128), jnp.float32)
    w_shape = jax.ShapeDtypeStruct(((n_rays + r_t) * n_j, s_blk),
                                   jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_i, n_j),
        in_specs=in_specs,
        out_specs=(maps_spec, w_spec) if want_weights else (maps_spec,),
        scratch_shapes=[
            pltpu.VMEM((r_t, 1), jnp.float32),       # cumulative sigma*dist
            pltpu.VMEM((r_t, 128), jnp.float32),     # running maps
        ],
    )
    outs = pl.pallas_call(
        _make_kernel(r_t, s_blk, n_j, term_csd, want_weights),
        grid_spec=grid_spec,
        out_shape=(maps_shape, w_shape) if want_weights else (maps_shape,),
        interpret=interpret,
        # predicated (@pl.when) bodies inhibit Mosaic's temp-buffer reuse;
        # the default 16M scoped-vmem cap is artificial — v5e has 128M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rays * s * 600_000,
            bytes_accessed=n_rays * s * 44,
            transcendentals=n_rays * s * 90),
    )(work, ptsdir, rays16,
      *[packed[k] for k in _W_ORDER], *[biases[k] for k in _B_ORDER])
    if not want_weights:
        return outs[0], None
    maps, weights = outs
    # rows of dead blocks were redirected to the spill block: zero them
    weights = weights[:n_rays * n_j]
    weights = jnp.where(jnp.repeat(work, r_t)[:, None] != 0, weights, 0.0)
    return maps, weights


def unpack_maps(maps):
    """Split packed per-ray maps (R, 128) into the render output dict."""
    rgb_map = maps[:, 0:3]
    acc = maps[:, 3]
    depth = maps[:, 4]
    disp = 1.0 / jnp.maximum(1e-10, depth / jnp.maximum(acc, 1e-10))
    return {"rgb_map": rgb_map, "acc_map": acc, "depth_map": depth,
            "disp_map": disp}


def fused_render_pass(params, ls, rays_o, rays_d, viewdirs, z_vals,
                      config: nerf.NeRFConfig, *, early_term_eps=0.0,
                      ray_flags=None, r_t=R_TILE, s_blk=S_BLK, dists=None,
                      return_weights=True, raw_maps=False):
    """Fully fused deterministic render pass with early termination.

    rays_*: (R, 3); z_vals: (R, S) with S % s_blk == 0. ``ray_flags``: bool
    (R,) — rays whose whole tile is False are skipped (their outputs are 0;
    the caller substitutes). ``dists`` overrides the per-sample integration
    span (occupancy-grid sampling passes masked candidate spacings; entries
    of 0 contribute exactly nothing). Returns dict(rgb_map, acc_map,
    depth_map, disp_map, weights); with ``raw_maps`` the packed per-ray
    maps (R, 128) [rgb, acc, depth, 0...] are returned instead of the
    sliced maps — callers that reorder rays permute the single packed
    array (one gather) rather than four."""
    n_rays, s = z_vals.shape
    # half-tiles below 16 sublanes miscompile on Mosaic (CLAUDE.md), so the
    # two interleaved chains need r_t to be a multiple of 32
    assert r_t % 32 == 0, f"fusion_ray_tile must be a multiple of 32: {r_t}"
    if s % s_blk != 0:
        # largest divisor of s up to the preferred block keeps shapes static
        s_blk = next(k for k in range(min(s, s_blk), 0, -1) if s % k == 0)
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    if dists is None:
        dists = jnp.diff(z_vals, axis=-1)
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[:, :1], 1e10)], axis=-1) * dnorm
    else:
        dists = dists * dnorm

    dtype = jnp.bfloat16 if config.compute_dtype == jnp.bfloat16 \
        else jnp.float32
    interpret = jax.default_backend() not in ("tpu", "axon")
    packed, biases = _pack_weights(params, ls, dtype)

    n_pad = ((n_rays + r_t - 1) // r_t) * r_t
    if n_pad != n_rays:
        pad = n_pad - n_rays
        zr3 = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad, 3), jnp.float32)])
        rays_o, rays_d, viewdirs = zr3(rays_o), zr3(rays_d), zr3(viewdirs)
        dists = jnp.concatenate([dists, jnp.ones((pad, s), jnp.float32)])
        z_vals = jnp.concatenate([z_vals, jnp.ones((pad, s), jnp.float32)])
        if ray_flags is not None:
            ray_flags = jnp.concatenate(
                [ray_flags, jnp.zeros((pad,), bool)])

    n_i, n_j = n_pad // r_t, s // s_blk
    n_sample = n_pad * s
    # The MLP input goes to HBM transposed — (8 feature rows, block-major
    # samples on lanes) — because an (M, 8) layout pads 8 -> 128 lanes in
    # HBM (16x the bytes on both the producer write and every block DMA;
    # a 5-D transpose building it also materialized 16x-padded, OOMing HBM
    # at 163840-ray chunks). All producer arithmetic runs directly in the
    # transposed space with the minor (ray, sample) pair merged as
    # r_t*s_blk so every intermediate stays lane-dense.
    q = r_t * s_blk
    z_q = z_vals.reshape(n_i, r_t, n_j, s_blk).swapaxes(1, 2) \
        .reshape(n_i, n_j, q)
    dists_q = dists.reshape(n_i, r_t, n_j, s_blk).swapaxes(1, 2) \
        .reshape(n_i, n_j, q)

    # pts/dirs are built INSIDE the kernel from a tiny per-tile (16, lane)
    # ray block — the HBM input shrinks from (8, M) to (2, M) [z, dists]
    # and the producer's 6 expanded pts/dir rows (~1.8 ms/frame of XLA
    # writes at the bench operating point) disappear. Lane blocks must be
    # 128-divisible, so tiles that aren't 128-multiples pad each tile's
    # rays up to the next multiple. Resolved unconditional in round 5: the
    # TPU A/B (tools/tpu_experiments_r4.py Part 2) measured the padded
    # sub-128 arm byte-identical in output and neutral in time at the
    # exact path's r_t=64 (64.86 vs 64.89 ms/40960-chunk), so the legacy
    # XLA 8-row producer is gone.
    ptsdir = jnp.stack([z_q, dists_q]).reshape(2, n_sample)
    r9t = jnp.concatenate([rays_o, rays_d, viewdirs], axis=1)
    lane = ((r_t + 127) // 128) * 128
    if lane != r_t:
        r9t = jnp.pad(r9t.reshape(n_i, r_t, 9),
                      ((0, 0), (0, lane - r_t), (0, 0))) \
            .reshape(n_i * lane, 9)
    rays16 = jnp.concatenate(
        [r9t.T, jnp.zeros((7, r9t.shape[0]), jnp.float32)], axis=0)

    if ray_flags is None:
        flags = jnp.ones((n_i,), jnp.int32)
    else:
        flags = jnp.any(ray_flags.reshape(n_i, r_t),
                        axis=1).astype(jnp.int32)

    # per-(i, j) work flags: tile ray-flag AND any nonzero dist in the
    # block (a block whose dists are all 0 contributes exactly nothing:
    # alpha = 1 - exp(0) = 0, csd unchanged). Exact-mode dists are strictly
    # positive (diff + 1e10 sentinel): no behavior change there.
    blk_any = jnp.any(
        dists.reshape(n_i, r_t, n_j, s_blk) > 0.0, axis=(1, 3))
    work = (blk_any & (flags != 0)[:, None]).astype(jnp.int32).reshape(-1)

    # optical-depth threshold: T < eps_T  <=>  csd > -log(eps_T)
    term_csd = float(-np.log(early_term_eps)) if early_term_eps > 0 \
        else float("inf")

    maps, weights_bm = _fused_render_et_call(
        packed, biases, work, ptsdir, n_i, s, r_t, s_blk,
        term_csd, interpret=interpret, want_weights=return_weights,
        rays16=rays16)
    maps = maps[:n_rays]
    if raw_maps:
        out = {"maps": maps}
    else:
        out = unpack_maps(maps)
    if return_weights:
        # inverse block-major transform (the copy pads minor dim s_blk);
        # callers that never consume weights (occupancy fast mode) skip it
        out["weights"] = weights_bm.reshape(n_i, n_j, r_t, s_blk) \
            .swapaxes(1, 2).reshape(n_pad, s)[:n_rays]
    return out
