"""Measure the tensor-parallel fused-MLP structural cost on one real chip.

Decides VERDICT r2 #7 (TP x fused vs data-parallel) with data. On a single
chip we cannot measure ICI psum latency, so we measure the piece that is
already decisive: the per-device compute time of the width-split pair-
kernel sequence (psum replaced by identity). M-way tensor parallel can
only beat M-way data parallel if

    t_tp_shard(M) + 5 * t_psum  <  t_full_fused / M

so if ``t_tp_shard(M) >= t_full_fused / M`` even at ZERO collective cost,
TP is strictly worse than DP at this width. Results are recorded in
BASELINE.md ("Tensor-parallel fused MLP").

Run on the axon TPU: ``python tools/tp_mlp_bench.py [N_points]``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jnp.sum(out))  # compile + sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    s = float(np.asarray(jnp.sum(out)))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    from nnc_tpu.models import nerf
    from nnc_tpu.ops import mlp_pallas, mlp_tp_pallas

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    mlp = nerf.NeRFConfig(compute_dtype=jnp.bfloat16)
    dtype = jnp.bfloat16
    params = nerf.init_params(jax.random.PRNGKey(0), mlp)
    packed, biases = mlp_pallas._pack_weights(params, None, dtype)
    emb = jax.random.normal(jax.random.PRNGKey(1), (n, mlp_pallas._PACK_W),
                            dtype)
    emb = jax.device_put(emb)

    backend = jax.default_backend()
    interpret = backend not in ("tpu", "axon")
    print(f"backend={backend} n={n} dtype=bf16 (interpret={interpret})")

    full = jax.jit(lambda e: mlp_pallas._fused_call(packed, biases, e,
                                                    interpret=interpret))
    t_full, _ = timeit(full, emb)
    print(f"full fused (1 call, 12 matmul chain): {t_full*1e3:8.3f} ms  "
          f"({n/t_full/1e6:6.2f} Mpts/s)")

    for m in (1, 2, 4):
        shards, reps = mlp_tp_pallas.shard_tp_weights(params, None, m, dtype)
        local = {k: v[0:1] for k, v in shards.items()}  # one device's shard

        def shard_seq(e, local=local):
            return mlp_tp_pallas._tp_forward(
                e, local, reps, interpret, psum=lambda v: v)

        t_m, _ = timeit(jax.jit(shard_seq), emb)
        dp_budget = t_full / m
        verdict = "LOSES even at zero psum cost" if t_m >= dp_budget \
            else f"would need 5 psums under {1e3*(dp_budget-t_m)/5:.3f} ms"
        print(f"TP shard M={m} (5 pair calls + XLA epilogues): "
              f"{t_m*1e3:8.3f} ms  vs DP budget {dp_budget*1e3:.3f} ms  "
              f"-> {verdict}")


if __name__ == "__main__":
    main()
