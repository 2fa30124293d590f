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
