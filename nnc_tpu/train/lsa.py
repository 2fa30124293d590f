"""LSA fine-tuning: train per-output-channel weight scales by rendering rays
and backpropagating photometric MSE through the volume renderer.

The whole optimization step (coarse+fine hierarchical render, double MSE
loss, Adam update on the scales only) is ONE jitted XLA program; the weights
are donated as constants and only the scale pytrees + optimizer state are
updated. Optionally shards the ray batch across a device mesh
(``nnc_tpu.parallel``). (reference hot loop: run_nerf.py:685-799; loss at
:741-752; scale-only grads: pytorch_model/__init__.py:1129-1145.)
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..render import renderer
from ..utils.logging import ResultLogger, mse2psnr


def double_mse_loss(scales, params, rays_o, rays_d, viewdirs, target, near,
                    far, key, rc: renderer.RenderConfig):
    """loss = mse(fine, target) + mse(coarse, target); returns (loss, aux).

    ``scales`` is either ``(ls_c, ls_f)`` (LSA only) or a dict
    ``{"ls": (ls_c, ls_f), "b": (bias_c, bias_f)}`` when fine-tuning also
    trains the bias companions (the reference's ft tunes O_TYPES params —
    biases/BN — against the quantized weights, pytorch_model:1129-1145)."""
    if isinstance(scales, dict):
        ls_c, ls_f = scales["ls"]
        b_c, b_f = scales["b"]
        params_c = {n: {"w": p["w"], "b": b_c[n]}
                    for n, p in params[0].items()}
        params_f = {n: {"w": p["w"], "b": b_f[n]}
                    for n, p in params[1].items()}
    else:
        ls_c, ls_f = scales
        params_c, params_f = params
    if viewdirs is None:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    out = renderer.render_rays(
        params_c, params_f, ls_c, ls_f, rays_o, rays_d, viewdirs,
        near, far, key, rc, deterministic=False)
    img_loss = jnp.mean((out["rgb_map"] - target) ** 2)
    loss = img_loss
    if "rgb0" in out:
        loss = loss + jnp.mean((out["rgb0"] - target) ** 2)
    return loss, img_loss


def double_mse_loss_occ(scales, params, rays_o, rays_d, viewdirs, target,
                        near, far, key, rc: renderer.RenderConfig, grid,
                        n_candidates: int = 64, budget: int = 32):
    """Occupancy-accelerated LSA loss (opt-in fast path).

    Both networks render only grid-selected samples (a fixed per-ray budget
    drawn from occupied voxels; render/occupancy.py) instead of the 64+192
    hierarchical sweep — ~4x fewer MLP evaluations per step. Selection runs
    under stop_gradient on the frozen quantized geometry; both the coarse
    and fine networks integrate the SAME selected z (so both scale sets
    receive gradients, preserving the reference's double-MSE structure,
    run_nerf.py:741-752). The objective deviates from the exact
    hierarchical render by the fast mode's own deviation (~49 dB on solid
    scenes) — far below the ~30 dB operating point LSA tunes at."""
    if isinstance(scales, dict):
        ls_c, ls_f = scales["ls"]
        b_c, b_f = scales["b"]
        params_c = {n: {"w": p["w"], "b": b_c[n]}
                    for n, p in params[0].items()}
        params_f = {n: {"w": p["w"], "b": b_f[n]}
                    for n, p in params[1].items()}
    else:
        ls_c, ls_f = scales
        params_c, params_f = params
    if viewdirs is None:
        viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    from ..render import occupancy, volume
    z, dists, _ = occupancy.select_occupied_samples(
        grid, rays_o, rays_d, near, far, n_candidates, budget)
    z = jax.lax.stop_gradient(z)
    dists = jax.lax.stop_gradient(dists)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    k_c, k_f = jax.random.split(key)

    def one(p, l, nk):
        raw = renderer._query_mlp(p, l, pts, viewdirs, rc,
                                  allow_fused=False)
        return volume.raw2outputs(
            raw, z, rays_d, raw_noise_std=rc.raw_noise_std,
            white_bkgd=rc.white_bkgd, noise_key=nk, dists=dists)["rgb_map"]

    img_loss = jnp.mean((one(params_f, ls_f, k_f) - target) ** 2)
    loss = img_loss + jnp.mean((one(params_c, ls_c, k_c) - target) ** 2)
    return loss, img_loss


def _make_loss(rc, grid, occ_candidates, occ_budget):
    if grid is None:
        return lambda *a: double_mse_loss(*a)
    return lambda sc, params, ro, rd, vd, tgt, near, far, k, rc_: \
        double_mse_loss_occ(sc, params, ro, rd, vd, tgt, near, far, k, rc_,
                            grid, occ_candidates, occ_budget)


def make_train_step(rc: renderer.RenderConfig, optimizer, grid=None,
                    occ_candidates: int = 64, occ_budget: int = 32):
    """Build the jitted LSA train step. ``grid`` switches the loss to the
    occupancy-accelerated path (see double_mse_loss_occ)."""
    loss_fn = _make_loss(rc, grid, occ_candidates, occ_budget)

    @functools.partial(jax.jit, static_argnames=())
    def train_step(scales, opt_state, params, rays_o, rays_d, viewdirs,
                   target, near, far, key):
        (loss, img_loss), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(
                scales, params, rays_o, rays_d, viewdirs, target, near, far,
                key, rc)
        updates, opt_state = optimizer.update(grads, opt_state, scales)
        scales = optax.apply_updates(scales, updates)
        return scales, opt_state, loss, img_loss

    return train_step


def make_scan_train_step(rc: renderer.RenderConfig, optimizer, grid=None,
                         occ_candidates: int = 64, occ_budget: int = 32):
    """Jitted multi-step LSA update: lax.scan over a stack of K pre-sampled
    ray batches, amortizing per-call dispatch latency (~15% faster per step
    on a tunneled TPU). Inputs rays_o/rays_d/target: (K, N, 3); keys: (K, 2).
    ``grid`` switches to the occupancy-accelerated loss. Returns per-step
    (losses, img_losses)."""
    loss_fn = _make_loss(rc, grid, occ_candidates, occ_budget)

    @jax.jit
    def scan_step(scales, opt_state, params, packed, near, far, keys):
        # ``packed``: (K, N, 12) = [rays_o | rays_d | viewdirs | target]
        # concatenated on the host — ONE device upload per call instead of
        # four (each host->device transfer pays full latency on tunneled
        # links; measured ~9.5 ms/step at K=8 with separate arrays)
        def body(carry, batch):
            sc, st = carry
            b, k = batch
            (loss, img_loss), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    sc, params, b[..., 0:3], b[..., 3:6], b[..., 6:9],
                    b[..., 9:12], near, far, k, rc)
            updates, st = optimizer.update(grads, st, sc)
            sc = optax.apply_updates(sc, updates)
            return (sc, st), (loss, img_loss)

        (scales, opt_state), (losses, img_losses) = jax.lax.scan(
            body, (scales, opt_state), (packed, keys))
        return scales, opt_state, losses, img_losses

    return scan_step


def make_lr_schedule(lr: float, decay: float, steps_per_epoch: int,
                     offset: int = 0):
    """Per-epoch staircase decay (torch StepLR semantics; decay=0 disables).
    ``offset`` shifts the step count — used when resuming without a saved
    optimizer state, so the schedule continues from the interrupted step
    instead of restarting at the base lr.
    (reference: pytorch_model/__init__.py:1161-1167)"""
    if not decay:
        return lr

    def schedule(count):
        epoch = (count + offset) // steps_per_epoch
        return lr * (decay ** epoch)

    return schedule


def tune_lsa_scales(params_c, params_f, ls_c, ls_f, batcher, rc,
                    near, far, *, learning_rate=1e-4, learning_rate_decay=0.1,
                    epochs=2, n_iters=1000, i_save=0, basedir_save=None,
                    global_step0=0, seed=451, verbose=True,
                    save_hook=None, mesh=None, steps_per_call=8,
                    tune_biases=False, tune_scales=True, grid=None,
                    occ_candidates=64, occ_budget=32, opt_state0=None):
    """Run the full LSA optimization. Returns (ls_c, ls_f, mean_psnr,
    mean_loss (of last epoch), global_step, biases) where ``biases`` is
    ``(bias_c, bias_f)`` when ``tune_biases`` (fine-tuning) else None.

    save_hook(global_step, ls_c, ls_f, opt_state): called at save points
    (checkpoint + test renders are the caller's responsibility, mirroring
    run_nerf.py's i_save block; the opt_state lets the caller persist the
    Adam moments next to the mid-tune checkpoint — the reference carries
    ``tuning_optimizer_state_dict`` the same way, utils.py:103-106).

    ``opt_state0``: resume with saved optimizer state (Adam moments +
    step count, so the lr schedule continues). Without it, a resume at
    ``global_step0`` still offsets the schedule so the lr picks up at the
    interrupted decay epoch rather than the base lr.
    """
    schedule = make_lr_schedule(
        learning_rate, learning_rate_decay, n_iters,
        offset=global_step0 if opt_state0 is None else 0)
    optimizer = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    if tune_biases:
        scales = {"ls": (ls_c, ls_f),
                  "b": ({n: p["b"] for n, p in params_c.items()},
                        {n: p["b"] for n, p in params_f.items()})}
        if not tune_scales:
            # ft without lsa: bias companions train, scales stay frozen
            # (reference requires_grad logic, pytorch_model:1129-1145)
            optimizer = optax.multi_transform(
                {"train": optimizer, "freeze": optax.set_to_zero()},
                param_labels=lambda tree: {
                    "ls": jax.tree.map(lambda _: "freeze", tree["ls"]),
                    "b": jax.tree.map(lambda _: "train", tree["b"])})
    else:
        scales = (ls_c, ls_f)
    opt_state = optimizer.init(scales)
    if opt_state0 is not None:
        try:
            leaves0 = jax.tree_util.tree_leaves(opt_state0)
            treedef = jax.tree_util.tree_structure(opt_state)
            ref_leaves = jax.tree_util.tree_leaves(opt_state)
            assert len(leaves0) == len(ref_leaves)
            assert all(np.shape(a) == np.shape(b)
                       for a, b in zip(leaves0, ref_leaves))
            opt_state = jax.tree_util.tree_unflatten(
                treedef, [jnp.asarray(l) for l in leaves0])
        except Exception as e:  # structure mismatch: fresh moments
            print(f"INFO: saved optimizer state incompatible ({e}); "
                  f"restarting moments with schedule offset")
            schedule = make_lr_schedule(learning_rate, learning_rate_decay,
                                        n_iters, offset=global_step0)
            optimizer = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
            opt_state = optimizer.init(scales)
    params = (params_c, params_f)

    if mesh is not None:
        from ..parallel import shard_train_inputs
        put = lambda *arrs: shard_train_inputs(mesh, *arrs)
    else:
        put = lambda *arrs: tuple(jnp.asarray(a) for a in arrs)

    use_scan = steps_per_call > 1
    train_step = make_train_step(rc, optimizer, grid=grid,
                                 occ_candidates=occ_candidates,
                                 occ_budget=occ_budget)
    scan_step = make_scan_train_step(
        rc, optimizer, grid=grid, occ_candidates=occ_candidates,
        occ_budget=occ_budget) if use_scan else None
    key = jax.random.PRNGKey(seed)
    logger = ResultLogger(basedir_save) if basedir_save else None

    def get_batch():
        batch = batcher.next_batch()
        if len(batch) == 4:
            return batch
        ro, rd, tgt = batch
        vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
        return ro, rd, vd.astype(np.float32), tgt

    def record(img_loss_v, loss_v):
        psnr_v = float(mse2psnr(img_loss_v))
        psnrs.append(psnr_v)
        losses.append(loss_v)
        if logger is not None:
            logger.append(psnr_v, loss_v)

    global_step = global_step0
    mean_psnr = mean_loss = 0.0
    for _epoch in range(epochs):
        psnrs, losses = [], []
        it = 0
        while it < n_iters:
            # run up to steps_per_call steps per device call, never crossing
            # an i_save boundary (the hook must see the exact step)
            k = min(steps_per_call, n_iters - it)
            if i_save:
                to_boundary = i_save - (global_step % i_save)
                if global_step + 1 == 1:
                    to_boundary = 1
                k = max(1, min(k, to_boundary))
            # an odd scan length (i_save boundary remainder) would trace a
            # NEW scan_step program — 30-60 s of XLA compile per distinct k
            # on this environment, which dominated soak runs. Boundary
            # remainders run as repeated single steps instead (the single-
            # step program compiles once).
            if use_scan and k == steps_per_call:
                bs = [get_batch() for _ in range(k)]
                packed = np.stack(
                    [np.concatenate(b, axis=-1) for b in bs])
                key, *subs = jax.random.split(key, k + 1)
                if mesh is not None:
                    # shard rays (axis 1 of the (K, N, 12) stack) over
                    # 'data'; the scan axis and keys stay replicated, so the
                    # whole K-step scan keeps its one-dispatch amortization
                    # under the mesh (VERDICT r2 next-step #5)
                    from ..parallel import shard_scan_inputs
                    packed_dev, keys_dev = shard_scan_inputs(
                        mesh, packed, np.stack([np.asarray(s)
                                                for s in subs]))
                else:
                    packed_dev = jnp.asarray(packed)
                    keys_dev = jnp.stack(subs)
                scales, opt_state, loss_arr, il_arr = scan_step(
                    scales, opt_state, params, packed_dev,
                    near, far, keys_dev)
                for lv, iv in zip(np.asarray(loss_arr), np.asarray(il_arr)):
                    record(float(iv), float(lv))
            else:
                ro, rd, vd, tgt = get_batch()
                ro, rd, vd, tgt = put(ro, rd, vd, tgt)
                key, sub = jax.random.split(key)
                scales, opt_state, loss, img_loss = train_step(
                    scales, opt_state, params, ro, rd, vd, tgt, near, far,
                    sub)
                record(float(img_loss), float(loss))
                k = 1
            it += k
            global_step += k
            if i_save and (global_step == 1 or global_step % i_save == 0) \
                    and save_hook is not None:
                cur_ls = scales["ls"] if isinstance(scales, dict) else scales
                save_hook(global_step, cur_ls[0], cur_ls[1], opt_state)
        mean_psnr = float(np.mean(psnrs))
        mean_loss = float(np.mean(losses))
        if verbose:
            print(f"Epoch done. mean PSNR {mean_psnr:.3f}, "
                  f"mean loss {mean_loss:.6f}")
    if logger is not None:
        logger.flush()
    if isinstance(scales, dict):
        (fl_c, fl_f), biases = scales["ls"], scales["b"]
        return fl_c, fl_f, mean_psnr, mean_loss, global_step, biases
    return scales[0], scales[1], mean_psnr, mean_loss, global_step, None
