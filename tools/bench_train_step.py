"""Dev benchmark: LSA train-step time, XLA MLP vs fused custom_vjp kernels."""
import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--with_dw", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from nnc_tpu.data.synthetic import make_solid_mlp
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer
    from nnc_tpu.train import lsa

    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    params = (make_solid_mlp(mlp), make_solid_mlp(mlp))
    scales = (nerf.init_lsa_scales(mlp), nerf.init_lsa_scales(mlp))
    key = jax.random.PRNGKey(0)
    n = args.n_rand
    ro = jax.random.normal(key, (n, 3)) * 0.1
    rd = jax.random.normal(jax.random.fold_in(key, 1), (n, 3)) * 0.2 + \
        jnp.array([0, 0, -1.0])
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    tgt = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))

    for name, use_fused in (("xla", False), ("fused", True)):
        rc = renderer.RenderConfig(
            mlp=mlp, n_samples=64, n_importance=128,
            use_fused_train=use_fused, train_with_dw=args.with_dw)
        optimizer = optax.adam(1e-4)
        opt_state = optimizer.init(scales)
        step = lsa.make_train_step(rc, optimizer)
        sc, st = scales, opt_state
        t0 = time.perf_counter()
        sc, st, loss, il = step(sc, st, params, ro, rd, vd, tgt, 2.0, 6.0,
                                key)
        print(f"{name}: compile+1st {time.perf_counter() - t0:.1f}s "
              f"loss={float(loss):.5f}")
        t0 = time.perf_counter()
        for i in range(args.iters):
            sc, st, loss, il = step(sc, st, params, ro, rd, vd, tgt, 2.0,
                                    6.0, key)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt * 1e3:6.2f} ms/it  ({n / dt:,.0f} rays/s) "
              f"final loss {float(loss):.5f} "
              f"ls[0][:3]={np.asarray(sc[0]['pts_linears.0'][:3])}")


if __name__ == "__main__":
    main()
