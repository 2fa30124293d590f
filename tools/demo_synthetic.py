"""Full-pipeline demo on a synthetic scene — no datasets required.

Runs the complete reference workflow at the flagship model size: build a
teacher NeRF scene -> save a nerf-pytorch style .tar -> compress with LSA
(rendering on the accelerator) -> decompress -> convert back to .tar ->
report PSNR and sizes.

Usage: python tools/demo_synthetic.py [--hw 64] [--iters 100] [--qp -20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nnc_tpu.utils.platform import honor_jax_platforms_env
honor_jax_platforms_env()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=64, help="image side")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--qp", type=int, default=-20)
    ap.add_argument("--out", type=str, default="./demo_run")
    ap.add_argument("--i-save", type=int, default=0)
    ap.add_argument("--full-mlp", action="store_true",
                    help="use the flagship 8x256 MLP (default: 8x64)")
    ap.add_argument("--occupancy-tuning", action="store_true",
                    help="LSA tunes on grid-selected samples (~3x faster "
                         "steps; pays one extra compile + grid build, so "
                         "it wins at production iteration counts, not in "
                         "this short demo. Measured at 60 iters/flagship: "
                         "+2.56 dB vs dense +3.09 — run ~2x the iters in "
                         "the same wall time to come out ahead)")
    args = ap.parse_args()

    import jax
    import nnc_tpu
    from nnc_tpu.data import synthetic
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer
    from nnc_tpu.train.presets import create_nerf_model_executer
    from nnc_tpu.utils import ckpt as cku

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    mlp = nerf.NeRFConfig() if args.full_mlp else nerf.NeRFConfig(W=64)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=32, n_importance=32,
                               chunk=4096)
    t0 = time.time()
    scene, (tc, tf_) = synthetic.make_scene(n_images=6, H=args.hw, W=args.hw,
                                            mlp=mlp, rc=rc, seed=0)
    scene["n_importance"] = 32
    print(f"scene built in {time.time()-t0:.1f}s")

    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))
    os.makedirs(args.out, exist_ok=True)
    tar = os.path.join(args.out, "teacher_200000.tar")
    cku.wrapper_dict_to_nerf_tar(sd, tar)

    wrapper, _ = cku.nerf_tar_to_wrapper_dict(tar)
    paths = cku.create_save_path(args.out, "teacher", args.qp, True,
                                 args.epochs, 1e-3, "NeRF", "synthetic",
                                 args.iters, 0.1)

    ex = create_nerf_model_executer(
        scene=scene, mlp_config=mlp, learning_rate=1e-3, epochs=args.epochs,
        learning_rate_decay=0.1, n_iters=args.iters, i_save=args.i_save,
        use_fused_mlp=True, verbose=True)
    if args.occupancy_tuning:
        import dataclasses
        ex.rc = dataclasses.replace(ex.rc, use_occupancy_tuning=True,
                                    use_occupancy_renders=True)

    t0 = time.time()
    nnc_tpu.compress_model(wrapper, bitstream_path=paths["bitstream"],
                           qp=args.qp, lsa=True, model_executer=ex,
                           scene=scene, mlp_config=mlp, verbose=True)
    t_comp = time.time() - t0
    nnc_tpu.decompress_model(paths["bitstream"],
                             model_path=paths["reconstructed"])
    cku.convert_nerfwrapper_to_nerf_ckpt(
        paths["reconstructed"],
        cku.change_extension_to_tar(paths["reconstructed"]))

    rec = nnc_tpu.decompress(paths["bitstream"], verbose=False)
    psnr_lsa = ex.test_model(rec)
    # baseline: no LSA at same qp
    bs2 = os.path.join(args.out, "nolsa.nnc")
    nnc_tpu.compress_model(wrapper, bitstream_path=bs2, qp=args.qp,
                           lsa=False, verbose=False)
    psnr_plain = ex.test_model(nnc_tpu.decompress(bs2, verbose=False))
    psnr_teacher = ex.test_model(wrapper)

    raw = sum(np.asarray(v).nbytes for v in wrapper.values())
    print(json.dumps({
        "raw_bytes": int(raw),
        "bitstream_bytes": os.path.getsize(paths["bitstream"]),
        "compress_seconds": round(t_comp, 1),
        "psnr_teacher": round(psnr_teacher, 3),
        "psnr_quantized": round(psnr_plain, 3),
        "psnr_quantized_lsa": round(psnr_lsa, 3),
    }))


if __name__ == "__main__":
    main()
