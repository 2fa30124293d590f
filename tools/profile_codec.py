"""Encoder/decoder phase breakdown on the flagship 4.77 MB NeRFWrapper.

Answers VERDICT r4 Weak #6 ("encoder throughput is half of decode — where
does the time go?") with an API-level phase split:

  quant   — dc_enc_quant_layer (fused single-pass 8-state DQ trellis)
  est     — the 4-profile estimation walk, isolated as
            encodeLayer(param_opt=1) - encodeLayer(param_opt=0)
  emit    — encodeLayer(param_opt=0): syntax derivation + range-coder emit
  decode  — decodeLayer
  dequant — dequantLayer (two-pass vectorized)

Timing discipline (CLAUDE.md): host noise is ~30% ACROSS process runs even
with contenders paused — run this several times and trust the min per
phase; in-process we report min-of-N too.

Usage: python tools/profile_codec.py [--qp -20] [--reps 3]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qp", type=int, default=-20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    # codec profiling is pure host work; don't pay (or hang on) axon TPU
    # init just to draw random weights
    import jax
    jax.config.update("jax_platforms", "cpu")
    from nnc_tpu.coder import cabac
    from nnc_tpu.models import nerf

    mlp = nerf.NeRFConfig()
    sd = {}
    sd.update(nerf.params_to_state_dict(
        nerf.init_params(jax.random.PRNGKey(0), mlp), "model."))
    sd.update(nerf.params_to_state_dict(
        nerf.init_params(jax.random.PRNGKey(1), mlp), "model_fine."))
    sd = {k: np.ascontiguousarray(np.asarray(v, np.float32))
          for k, v in sd.items()}
    raw = sum(v.nbytes for v in sd.values())
    qp_density = 2
    culm1 = 9

    def once():
        t = {"quant": 0.0, "enc_opt": 0.0, "enc_noopt": 0.0,
             "decode": 0.0, "dequant": 0.0}
        nbytes = 0
        for name, v in sd.items():
            q = np.zeros(v.size, np.int32)
            enc = cabac.Encoder()
            enc.initCtxModels(culm1, 1)
            t0 = time.perf_counter()
            enc.quantLayer(v.reshape(v.shape[0], -1) if v.ndim > 1
                           else v, q, 1, qp_density, args.qp, 0.0,
                           culm1, 0)
            t["quant"] += time.perf_counter() - t0
            qv = q.reshape(v.shape[0], -1) if v.ndim > 1 else q

            # emit with the 4-profile estimation walk (production path)
            t0 = time.perf_counter()
            enc.encodeLayer(qv, 1, 0)
            enc.terminate_segment()
            t["enc_opt"] += time.perf_counter() - t0
            bs = enc.finish()
            nbytes += bs.nbytes

            # emit without it (param_opt=0): pure syntax + range coder
            enc2 = cabac.Encoder()
            enc2.initCtxModels(culm1, 0)
            t0 = time.perf_counter()
            enc2.encodeLayer(qv, 1, 0)
            enc2.terminate_segment()
            t["enc_noopt"] += time.perf_counter() - t0
            bs2 = enc2.finish()

            dec = cabac.Decoder()
            dec.setStream(bs)
            dec.initCtxModels(culm1)
            out = np.zeros(v.size, np.int32)
            t0 = time.perf_counter()
            dec.decodeLayer(out.reshape(v.shape[0], -1) if v.ndim > 1
                            else out, 1, 0)
            t["decode"] += time.perf_counter() - t0
            dec.terminate_segment()
            f = np.zeros(v.size, np.float32)
            t0 = time.perf_counter()
            dec.dequantLayer(f.reshape(v.shape[0], -1) if v.ndim > 1
                             else f,
                             out.reshape(v.shape[0], -1) if v.ndim > 1
                             else out, 1, args.qp, qp_density)
            t["dequant"] += time.perf_counter() - t0
            assert (out == q).all()
        return t, nbytes

    best = None
    for _ in range(args.reps):
        t, nbytes = once()
        if best is None:
            best = t
        else:
            best = {k: min(best[k], t[k]) for k in t}
    est = best["enc_opt"] - best["enc_noopt"]
    enc_total = best["quant"] + best["enc_opt"]
    dec_total = best["decode"] + best["dequant"]
    print(f"model {raw/1e6:.2f} MB -> bitstream {nbytes/1e6:.2f} MB "
          f"(qp={args.qp}, dq on, scan 0, min of {args.reps} reps)")
    for k, label in (("quant", "DQ trellis quant"),
                     ("enc_noopt", "syntax+range emit"),
                     (None, "4-profile estimation (enc_opt - enc_noopt)"),
                     ("decode", "decode walk"),
                     ("dequant", "dequant (two-pass)")):
        v = est if k is None else best[k]
        print(f"  {label:44s} {v*1e3:7.1f} ms  "
              f"({raw/1e6/v if v > 0 else float('inf'):6.1f} MB/s)")
    print(f"encode total {enc_total*1e3:.1f} ms = {raw/1e6/enc_total:.1f} "
          f"MB/s | decode total {dec_total*1e3:.1f} ms = "
          f"{raw/1e6/dec_total:.1f} MB/s")


if __name__ == "__main__":
    main()
