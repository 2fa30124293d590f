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
    """loss = mse(fine, target) + mse(coarse, target); returns (loss, aux)."""
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


def make_train_step(rc: renderer.RenderConfig, optimizer):
    """Build the jitted LSA train step."""

    @functools.partial(jax.jit, static_argnames=())
    def train_step(scales, opt_state, params, rays_o, rays_d, viewdirs,
                   target, near, far, key):
        (loss, img_loss), grads = jax.value_and_grad(
            double_mse_loss, has_aux=True)(
                scales, params, rays_o, rays_d, viewdirs, target, near, far,
                key, rc)
        updates, opt_state = optimizer.update(grads, opt_state, scales)
        scales = optax.apply_updates(scales, updates)
        return scales, opt_state, loss, img_loss

    return train_step


def make_lr_schedule(lr: float, decay: float, steps_per_epoch: int):
    """Per-epoch staircase decay (torch StepLR semantics; decay=0 disables).
    (reference: pytorch_model/__init__.py:1161-1167)"""
    if not decay:
        return lr

    def schedule(count):
        epoch = count // steps_per_epoch
        return lr * (decay ** epoch)

    return schedule


def tune_lsa_scales(params_c, params_f, ls_c, ls_f, batcher, rc,
                    near, far, *, learning_rate=1e-4, learning_rate_decay=0.1,
                    epochs=2, n_iters=1000, i_save=0, basedir_save=None,
                    global_step0=0, seed=451, verbose=True,
                    save_hook=None, mesh=None):
    """Run the full LSA optimization. Returns (ls_c, ls_f, mean_psnr,
    mean_loss (of last epoch), logger).

    save_hook(global_step, ls_c, ls_f): called at save points (checkpoint +
    test renders are the caller's responsibility, mirroring run_nerf.py's
    i_save block).
    """
    schedule = make_lr_schedule(learning_rate, learning_rate_decay, n_iters)
    optimizer = optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)
    scales = (ls_c, ls_f)
    opt_state = optimizer.init(scales)
    params = (params_c, params_f)

    if mesh is not None:
        from ..parallel import shard_train_inputs
        put = lambda *arrs: shard_train_inputs(mesh, *arrs)
    else:
        put = lambda *arrs: tuple(jnp.asarray(a) for a in arrs)

    train_step = make_train_step(rc, optimizer)
    key = jax.random.PRNGKey(seed)
    logger = ResultLogger(basedir_save) if basedir_save else None

    global_step = global_step0
    mean_psnr = mean_loss = 0.0
    for _epoch in range(epochs):
        psnrs, losses = [], []
        for _i in range(n_iters):
            global_step += 1
            batch = batcher.next_batch()
            if len(batch) == 4:
                rays_o, rays_d, viewdirs, target = batch
                rays_o, rays_d, viewdirs, target = put(rays_o, rays_d,
                                                       viewdirs, target)
            else:
                rays_o, rays_d, target = batch
                rays_o, rays_d, target = put(rays_o, rays_d, target)
                viewdirs = None
            key, sub = jax.random.split(key)
            scales, opt_state, loss, img_loss = train_step(
                scales, opt_state, params, rays_o, rays_d, viewdirs, target,
                near, far, sub)
            loss_v = float(loss)
            psnr_v = float(mse2psnr(float(img_loss)))
            psnrs.append(psnr_v)
            losses.append(loss_v)
            if logger is not None:
                logger.append(psnr_v, loss_v)
            if i_save and (global_step == 1 or global_step % i_save == 0) \
                    and save_hook is not None:
                save_hook(global_step, scales[0], scales[1])
        mean_psnr = float(np.mean(psnrs))
        mean_loss = float(np.mean(losses))
        if verbose:
            print(f"Epoch done. mean PSNR {mean_psnr:.3f}, "
                  f"mean loss {mean_loss:.6f}")
    if logger is not None:
        logger.flush()
    return scales[0], scales[1], mean_psnr, mean_loss, global_step
