"""Benchmark: hierarchical NeRF render throughput (rays/sec/chip).

Runs the flagship configuration (8x256 MLP, lego operating point: 64 coarse +
128 importance samples per ray, viewdirs, bf16 matmuls) on whatever backend
JAX selects (TPU on the driver). Prints ONE JSON line.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer

    chunk = 8192
    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=64, n_importance=128,
                               white_bkgd=True, chunk=chunk,
                               use_fused_mlp=True)
    key = jax.random.PRNGKey(0)
    params_c = nerf.init_params(key, mlp)
    params_f = nerf.init_params(jax.random.fold_in(key, 1), mlp)

    rng = np.random.default_rng(0)
    rays_o = jnp.asarray(rng.normal(0, 0.1, (chunk, 3)).astype(np.float32))
    rays_d = jnp.asarray(
        (rng.normal(0, 0.2, (chunk, 3)) + [0, 0, -1]).astype(np.float32))

    def run():
        return renderer.render_chunk(params_c, params_f, None, None, rays_o,
                                     rays_d, 2.0, 6.0, key, rc, True)

    np.asarray(run()["rgb_map"])  # compile + warmup

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    # force completion with a device-to-host read (block_until_ready is not
    # reliable on the experimental axon backend)
    np.asarray(out["rgb_map"])
    dt = time.perf_counter() - t0

    rays_per_sec = chunk * iters / dt
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 5e6, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # always emit a recordable line
        print(json.dumps({
            "metric": "render_rays_per_sec_per_chip",
            "value": 0.0,
            "unit": "rays/s",
            "vs_baseline": 0.0,
            "error": f"{type(exc).__name__}: {exc}"[:300],
        }))
        raise
