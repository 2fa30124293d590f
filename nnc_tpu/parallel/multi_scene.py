"""Multi-scene batched LSA: tune several scenes' models simultaneously.

Models/scales are stacked on a leading ``scene`` axis and the loss is vmapped
over it; summing per-scene losses makes the stacked Adam update exactly
equivalent to independent per-scene optimizers (Adam is elementwise). On a
mesh with axes ('scene', 'data') each device group owns one scene's model
and a shard of its rays — multi-program batching across chips, the TPU-native
replacement for running the reference pipeline once per scene
(BASELINE.md config 5).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..render import renderer
from ..train.lsa import double_mse_loss


def stack_trees(trees):
    """Stack a list of identical-structure pytrees on a new leading axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *trees)


def unstack_tree(tree, n):
    return [jax.tree_util.tree_map(lambda x: x[i], tree) for i in range(n)]


def make_multi_scene_train_step(rc: renderer.RenderConfig, optimizer):
    """Jitted step over stacked scenes.

    scales/params: pytrees with leading scene axis S; rays_o/rays_d/target:
    (S, N, 3); near/far: (S,) or scalars.
    """

    def scene_loss(scales, params, rays_o, rays_d, target, near, far, key):
        loss, img_loss = double_mse_loss(scales, params, rays_o, rays_d,
                                         None, target, near, far, key, rc)
        return loss, img_loss

    def total_loss(scales, params, rays_o, rays_d, target, near, far, keys):
        losses, img_losses = jax.vmap(
            scene_loss, in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
                scales, params, rays_o, rays_d, target, near, far, keys)
        # sum (not mean): stacked Adam == independent per-scene Adam
        return jnp.sum(losses), img_losses

    @jax.jit
    def step(scales, opt_state, params, rays_o, rays_d, target, near, far,
             keys):
        (loss, img_losses), grads = jax.value_and_grad(
            total_loss, has_aux=True)(scales, params, rays_o, rays_d,
                                      target, near, far, keys)
        updates, opt_state = optimizer.update(grads, opt_state, scales)
        scales = optax.apply_updates(scales, updates)
        return scales, opt_state, loss, img_losses

    return step


def make_scene_mesh(n_scenes: int, n_devices=None) -> Mesh:
    devices = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devices)
    assert n % n_scenes == 0, (n, n_scenes)
    arr = np.asarray(devices).reshape(n_scenes, n // n_scenes)
    return Mesh(arr, ("scene", "data"))


def shard_multi_scene(mesh: Mesh, stacked_params, stacked_scales, rays):
    """Place stacked trees: scene axis over 'scene', rays also over 'data'."""
    p_scene = NamedSharding(mesh, P("scene"))
    p_rays = NamedSharding(mesh, P("scene", "data"))
    put_scene = lambda t: jax.tree_util.tree_map(
        lambda a: jax.device_put(a, p_scene), t)
    return (put_scene(stacked_params), put_scene(stacked_scales),
            tuple(jax.device_put(jnp.asarray(r), p_rays) for r in rays))


def key_schedule(seed, n_iters, n_scenes):
    """The per-iteration per-scene PRNG keys tune_multi_scene consumes.

    Exposed so an independent per-scene run can replay the exact schedule of
    a joint run (the joint-vs-sequential equivalence bar)."""
    key = jax.random.PRNGKey(seed)
    sched = []
    for _ in range(n_iters):
        key, *subs = jax.random.split(key, n_scenes + 1)
        sched.append(subs)
    return sched


def tune_multi_scene(scenes, params_list, scales_list, rc, *, batchers,
                     learning_rate=1e-4, n_iters=100, mesh=None, seed=0,
                     verbose=True, key_schedule=None):
    """Joint LSA over S scenes. params_list/scales_list: per-scene
    (params_c, params_f) / (ls_c, ls_f). Returns tuned per-scene scales and
    final per-scene PSNR proxies."""
    from ..utils.logging import mse2psnr

    S = len(scenes)
    params = stack_trees([{"c": pc, "f": pf} for pc, pf in params_list])
    scales = stack_trees([{"c": lc, "f": lf} for lc, lf in scales_list])
    near = jnp.asarray([s["near"] for s in scenes], jnp.float32)
    far = jnp.asarray([s["far"] for s in scenes], jnp.float32)

    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(scales)

    def loss_adapter(sc, pr, ro, rd, tgt, nr, fr, key):
        return double_mse_loss((sc["c"], sc["f"]), (pr["c"], pr["f"]),
                               ro, rd, None, tgt, nr, fr, key, rc)

    def total(sc, pr, ro, rd, tgt, keys):
        losses, il = jax.vmap(loss_adapter,
                              in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
            sc, pr, ro, rd, tgt, near, far, keys)
        return jnp.sum(losses), il

    @jax.jit
    def step(scales, opt_state, params, ro, rd, tgt, keys):
        (loss, il), grads = jax.value_and_grad(total, has_aux=True)(
            scales, params, ro, rd, tgt, keys)
        updates, opt_state = optimizer.update(grads, opt_state, scales)
        return optax.apply_updates(scales, updates), opt_state, loss, il

    if mesh is not None:
        p_scene = NamedSharding(mesh, P("scene"))
        params = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, p_scene), params)
        scales = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, p_scene), scales)
        opt_state = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, p_scene)
            if hasattr(a, "ndim") and a.ndim > 0 and a.shape[0] == S else a,
            opt_state)

    key = jax.random.PRNGKey(seed)
    last_il = None
    for it in range(n_iters):
        batches = [b.next_batch() for b in batchers]
        ro = np.stack([b[0] for b in batches])
        rd = np.stack([b[1] for b in batches])
        tgt = np.stack([b[2] for b in batches])
        if mesh is not None:
            p_rays = NamedSharding(mesh, P("scene", "data"))
            ro, rd, tgt = (jax.device_put(jnp.asarray(a), p_rays)
                           for a in (ro, rd, tgt))
        if key_schedule is not None:
            subs = key_schedule[it]
        else:
            key, *subs = jax.random.split(key, S + 1)
        scales, opt_state, loss, last_il = step(
            scales, opt_state, params, ro, rd, tgt, jnp.stack(subs))
    psnrs = [mse2psnr(float(m)) for m in np.asarray(last_il)]
    out = unstack_tree(scales, S)
    return [(s["c"], s["f"]) for s in out], psnrs
