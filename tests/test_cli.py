"""CLI driver end-to-end (no datasets: lsa off exercises steps 1-5)."""
import os
import subprocess
import sys

import numpy as np
import jax
import pytest

from nnc_tpu.models import nerf
from nnc_tpu.utils import ckpt as cku

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_compress_nerf_cli_roundtrip(tmp_path):
    mlp = nerf.NeRFConfig(W=32)
    key = jax.random.PRNGKey(0)
    sd = {}
    sd.update(nerf.params_to_state_dict(nerf.init_params(key, mlp), "model."))
    sd.update(nerf.params_to_state_dict(
        nerf.init_params(jax.random.fold_in(key, 1), mlp), "model_fine."))
    tar = str(tmp_path / "tiny_200000.tar")
    cku.wrapper_dict_to_nerf_tar(sd, tar, global_step=200000)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "compress_nerf.py"),
         "--ckpt_path", tar, "--ckpt_nickname", "tiny",
         "--base_path_to_save", str(tmp_path / "runs"),
         "--qp", "-38", "--lsa", "false", "--N_iters", "1", "--i_save", "0"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=500)
    assert out.returncode == 0, out.stderr[-2000:]

    # run dir contains bitstream + reconstructed .pt + converted .tar
    runs = list((tmp_path / "runs").iterdir())
    assert len(runs) == 1
    run = runs[0]
    bs = list((run / "bitstream").glob("*.nnc"))
    rec_pt = list((run / "reconstructed").glob("*_reconstructed.pt"))
    rec_tar = list((run / "reconstructed").glob("*_reconstructed.tar"))
    assert bs and rec_pt and rec_tar

    # reconstructed .tar loads as a standard nerf-pytorch checkpoint and
    # matches the original weights within the qp=-38 stepsize
    wrapper, _ = cku.nerf_tar_to_wrapper_dict(str(rec_tar[0]))
    assert set(wrapper.keys()) == set(sd.keys())
    for k in sd:
        assert np.abs(np.asarray(wrapper[k]) - np.asarray(sd[k])).max() < 2e-3
