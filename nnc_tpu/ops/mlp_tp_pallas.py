"""Tensor-parallel fused NeRF MLP: width-split shard_map variant.

Megatron-style pairing over a 'model' mesh axis of size M: each device
holds a COLUMN shard of the even layers (w0, w2, w4, w6, wf) and a ROW
shard of the odd layers (w1, w3, w5b, w7, wva). One fused Pallas "pair
kernel" computes ``(relu(x @ Wcol + bcol)) @ Wrow`` per device — the
hidden activation never leaves the shard — and a `psum` over 'model'
reassembles the full-width activation between pairs (5 psums per MLP
eval). The small irregular pieces (skip-input w5a, view-input wvb, alpha
and rgb heads) run replicated in XLA: ~16% redundant FLOPs, accepted for
this feasibility variant.

Purpose (VERDICT r2 next-step #7): the production render path is
data-parallel only because, at W=256, width-splitting is a measured LOSS
on v5e — the per-device pair matmuls have K or N of 256/M <= 128 where
the MXU already runs at its Mosaic structural MFU ceiling, the kernel
fission (1 fused call -> 5 pair calls) forfeits the cross-layer
interleaving, and each psum adds latency on top. Measured numbers live in
BASELINE.md ("Tensor-parallel fused MLP"); this module exists so the
decision is backed by a working implementation (correctness-tested on the
virtual mesh, exercised by dryrun_multichip) rather than an assumption.
(reference is strictly single-GPU: README.md:76; there is no counterpart.)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models import nerf
from .mlp_pallas import TILE, _PACK_W, _pack_weights, supports

_COL = ("w0", "w2", "w4", "w6", "wf")         # column-sharded (output dim)
_ROW = {"w0": "w1", "w2": "w3", "w4": "w5b", "w6": "w7", "wf": "wva"}


def shard_tp_weights(params, ls, n_shards, dtype=jnp.float32):
    """Build the (M, ...) shard stacks + replicated remainder consumed by
    :func:`fused_nerf_mlp_tp`. Stacks are sharded over 'model' on axis 0."""
    packed, biases = _pack_weights(params, ls, dtype)
    m = n_shards
    shards = {}
    for wc in _COL:
        w = packed[wc]                          # (K, O)
        k, o = w.shape
        assert o % m == 0, (wc, o, m)
        s = o // m
        shards[wc] = jnp.transpose(w.reshape(k, m, s), (1, 0, 2))  # (M,K,S)
        bkey = "b" + wc[1:] if wc != "wf" else "bf"
        shards[bkey] = jnp.transpose(
            biases[bkey].reshape(1, m, s), (1, 0, 2))              # (M,1,S)
        wr = packed[_ROW[wc]]                   # (O, O2)
        shards[_ROW[wc]] = wr.reshape(m, s, wr.shape[1])           # (M,S,O2)
    reps = {"w5a": packed["w5a"], "wvb": packed["wvb"],
            "wa": packed["wa"], "wr": packed["wr"]}
    for bkey in ("b1", "b3", "b5", "b7", "ba", "bv", "br"):
        reps[bkey] = biases[bkey]
    return shards, reps


def _pair_kernel(x_ref, wa_ref, ba_ref, wb_ref, out_ref, *, relu_mid):
    """out = act(x @ Wa + ba) @ Wb on one activation tile; two interleaved
    half-tile chains (same MXU/VPU overlap trick as mlp_pallas._kernel)."""
    f32 = jnp.float32

    def chain(x):
        y = jnp.dot(x, wa_ref[:], preferred_element_type=f32) + ba_ref[:]
        if relu_mid:
            y = jax.nn.relu(y)
        y = y.astype(wa_ref.dtype)
        return jnp.dot(y, wb_ref[:], preferred_element_type=f32)

    half = x_ref.shape[0] // 2
    out_ref[:half] = chain(x_ref[:half])
    out_ref[half:] = chain(x_ref[half:])


@functools.partial(jax.jit, static_argnames=("relu_mid", "interpret"))
def fused_pair(x, wa, ba, wb, relu_mid=True, interpret=False):
    """Per-device fused column+row pair: (N, K) -> (N, O2) partial sums."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = x.shape
    o2 = wb.shape[1]
    s = wa.shape[1]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_pair_kernel, relu_mid=relu_mid),
        grid=(n // TILE,),
        in_specs=[pl.BlockSpec((TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  full(wa), full(ba), full(wb)],
        out_specs=pl.BlockSpec((TILE, o2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, o2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * (k * s + s * o2), bytes_accessed=n * (4 * k + 4 * o2),
            transcendentals=0),
    )(x, wa, ba, wb)


def _tp_forward(emb, shards, reps, interpret, psum=None):
    """Per-device TP forward on a replicated (N, 144) packed embedding;
    runs inside shard_map over the 'model' axis. ``psum`` overrides the
    cross-shard reduction (tools/tp_mlp_bench.py passes identity to time
    the per-device compute alone on a single chip)."""
    sh = {k: v[0] for k, v in shards.items()}  # strip the local M=1 axis
    cdt = sh["w0"].dtype
    if psum is None:
        psum = lambda v: jax.lax.psum(v, "model")
    pair = lambda x, wc, bk, wr_, relu=True: fused_pair(
        x.astype(cdt), sh[wc], sh[bk].astype(jnp.float32), sh[wr_],
        relu_mid=relu, interpret=interpret)

    h1 = jax.nn.relu(psum(pair(emb, "w0", "b0", "w1")) + reps["b1"])
    h3 = jax.nn.relu(psum(pair(h1, "w2", "b2", "w3")) + reps["b3"])
    skip = jnp.dot(emb.astype(cdt), reps["w5a"],
                   preferred_element_type=jnp.float32)
    h5 = jax.nn.relu(psum(pair(h3, "w4", "b4", "w5b")) + skip + reps["b5"])
    h7 = jax.nn.relu(psum(pair(h5, "w6", "b6", "w7")) + reps["b7"])
    vpre = psum(pair(h7, "wf", "bf", "wva", relu=False))
    vemb = jnp.dot(emb.astype(cdt), reps["wvb"],
                   preferred_element_type=jnp.float32)
    v = jax.nn.relu(vpre + vemb + reps["bv"])
    alpha = jnp.dot(h7.astype(cdt), reps["wa"],
                    preferred_element_type=jnp.float32) + reps["ba"]
    rgb = jnp.dot(v.astype(cdt), reps["wr"],
                  preferred_element_type=jnp.float32) + reps["br"]
    return rgb + alpha  # cols 0:3 rgb logits, col 3 sigma (packed layout)


def fused_nerf_mlp_tp(params, ls, pts_emb, views_emb,
                      config: nerf.NeRFConfig, mesh, interpret=None):
    """Width-split tensor-parallel fused MLP over ``mesh``'s 'model' axis.

    Same contract as ops.mlp_pallas.fused_nerf_mlp (flagship config only;
    (..., 63)/(.., 27) embeddings -> (..., 4) raw). Weights shard by width,
    the point batch is replicated across 'model' (compose with a 'data'
    axis outside for batch sharding)."""
    assert supports(config), "TP fused path: flagship architecture only"
    from jax.experimental.shard_map import shard_map

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    m = mesh.shape["model"]
    dtype = jnp.bfloat16 if config.compute_dtype == jnp.bfloat16 \
        else jnp.float32
    shards, reps = shard_tp_weights(params, ls, m, dtype)

    lead = pts_emb.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    n_pad = ((n + TILE - 1) // TILE) * TILE
    emb = jnp.concatenate(
        [pts_emb.reshape(n, 63).astype(dtype),
         jnp.zeros((n, 1), dtype),
         views_emb.reshape(n, 27).astype(dtype),
         jnp.zeros((n, _PACK_W - 91), dtype)], axis=-1)
    if n_pad != n:
        emb = jnp.pad(emb, ((0, n_pad - n), (0, 0)))

    shard_specs = {k: P("model") for k in shards}
    fn = shard_map(
        functools.partial(_tp_forward, interpret=interpret),
        mesh=mesh,
        in_specs=(P(*([None] * 2)), shard_specs, {k: P() for k in reps}),
        out_specs=P(None, None),
        check_rep=False)
    out = fn(emb, shards, reps)
    return out[:n, :4].reshape(*lead, 4)
