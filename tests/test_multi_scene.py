"""Multi-scene batched LSA on the virtual 8-device mesh."""
import numpy as np
import jax
import pytest

from nnc_tpu.data import synthetic
from nnc_tpu.data.rays import RayBatcher
from nnc_tpu.models import nerf
from nnc_tpu.parallel import multi_scene
from nnc_tpu.render import renderer

MLP = nerf.NeRFConfig(W=16)
RC = renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4, chunk=64)


def make_case(seed):
    scene, (tc, tf_) = synthetic.make_scene(n_images=2, H=8, W=8, mlp=MLP,
                                            rc=RC, seed=seed)
    batcher = RayBatcher(scene["images"], scene["poses"], scene["K"],
                        scene["i_train"], 32, seed=seed)
    return scene, (tc, tf_), batcher


def test_stack_unstack_roundtrip():
    p1 = nerf.init_params(jax.random.PRNGKey(0), MLP)
    p2 = nerf.init_params(jax.random.PRNGKey(1), MLP)
    stacked = multi_scene.stack_trees([p1, p2])
    back = multi_scene.unstack_tree(stacked, 2)
    np.testing.assert_allclose(np.asarray(back[1]["pts_linears.0"]["w"]),
                               np.asarray(p2["pts_linears.0"]["w"]))


def perturb(params, seed):
    """Simulate quantization error so the scales have something to learn."""
    k = jax.random.PRNGKey(seed)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    out = []
    for i, leaf in enumerate(leaves):
        kk = jax.random.fold_in(k, i)
        out.append(leaf * (1 + 0.05 * jax.random.normal(kk, leaf.shape)))
    return jax.tree_util.tree_unflatten(treedef, out)


def test_joint_matches_sequential():
    """Quality bar: joint {scene}-stacked tuning must reproduce independent
    per-scene tuning on the same budget (BASELINE eval config 5's implicit
    bar). Because the joint loss is a sum and Adam is elementwise, the match
    should be exact up to float reassociation — assert scales and final
    per-scene PSNR agree tightly."""
    import optax
    from nnc_tpu.train.lsa import double_mse_loss
    from nnc_tpu.utils.logging import mse2psnr

    n_iters, lr, seed = 4, 1e-2, 7
    cases = [make_case(0), make_case(1)]
    scenes = [c[0] for c in cases]
    params_list = [(perturb(c[1][0], 10 + i), perturb(c[1][1], 20 + i))
                   for i, c in enumerate(cases)]
    scales_list = [(nerf.init_lsa_scales(MLP), nerf.init_lsa_scales(MLP))
                   for _ in cases]

    tuned_joint, psnr_joint = multi_scene.tune_multi_scene(
        scenes, params_list, scales_list, RC,
        batchers=[c[2] for c in cases],
        learning_rate=lr, n_iters=n_iters, mesh=None, seed=seed)

    # Replicate the joint run's key schedule, then tune each scene alone
    # with its own Adam on identical batches (fresh batchers, same seeds).
    key = jax.random.PRNGKey(seed)
    key_sched = []
    for _ in range(n_iters):
        key, *subs = jax.random.split(key, len(cases) + 1)
        key_sched.append(subs)
    fresh_batchers = [make_case(i)[2] for i in range(len(cases))]

    for i, scene in enumerate(scenes):
        opt = optax.adam(lr)
        sc = scales_list[i]
        opt_state = opt.init(sc)
        last_il = None
        for it in range(n_iters):
            ro, rd, tgt = fresh_batchers[i].next_batch()
            loss_fn = lambda s: double_mse_loss(
                s, params_list[i], ro, rd, None, tgt,
                scene["near"], scene["far"], key_sched[it][i], RC)
            (_, last_il), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(sc)
            updates, opt_state = opt.update(grads, opt_state, sc)
            sc = optax.apply_updates(sc, updates)
        # scales agree leaf-by-leaf
        for joint_s, seq_s in zip(tuned_joint[i], sc):
            for name in seq_s:
                np.testing.assert_allclose(
                    np.asarray(joint_s[name]), np.asarray(seq_s[name]),
                    rtol=2e-4, atol=2e-6,
                    err_msg=f"scene {i} scale {name} diverged from "
                            f"sequential tuning")
        # final PSNR proxy agrees
        assert abs(psnr_joint[i] - mse2psnr(float(last_il))) < 0.05, (
            psnr_joint[i], mse2psnr(float(last_il)))


@pytest.mark.parametrize("use_mesh", [False, True])
def test_multi_scene_tune(use_mesh):
    cases = [make_case(0), make_case(1)]
    scenes = [c[0] for c in cases]
    params_list = [(perturb(c[1][0], 10 + i), perturb(c[1][1], 20 + i))
                   for i, c in enumerate(cases)]
    scales_list = [(nerf.init_lsa_scales(MLP), nerf.init_lsa_scales(MLP))
                   for _ in cases]
    batchers = [c[2] for c in cases]
    mesh = multi_scene.make_scene_mesh(2) if use_mesh else None
    tuned, psnrs = multi_scene.tune_multi_scene(
        scenes, params_list, scales_list, RC, batchers=batchers,
        learning_rate=1e-3, n_iters=3, mesh=mesh)
    assert len(tuned) == 2 and len(psnrs) == 2
    for (lc, lf) in tuned:
        for name in lc:
            assert np.all(np.isfinite(np.asarray(lc[name])))
    # scales moved (trained)
    moved = np.abs(np.asarray(tuned[0][0]["pts_linears.0"]) - 1.0).max()
    assert moved > 0
