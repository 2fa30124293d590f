"""End-to-end pipeline tests on a tiny synthetic scene (no datasets needed)."""
import os

import numpy as np
import jax
import pytest

import nnc_tpu
from nnc_tpu.data import synthetic
from nnc_tpu.models import nerf
from nnc_tpu.render import renderer
from nnc_tpu.utils import ckpt as ckpt_utils

MLP = nerf.NeRFConfig(W=32)


def make_wrapper_state_dict(seed=0):
    key = jax.random.PRNGKey(seed)
    params_c = nerf.init_params(key, MLP)
    params_f = nerf.init_params(jax.random.fold_in(key, 1), MLP)
    sd = {}
    sd.update(nerf.params_to_state_dict(params_c, "model."))
    sd.update(nerf.params_to_state_dict(params_f, "model_fine."))
    return sd, (params_c, params_f)


def test_compress_decompress_no_lsa(tmp_path):
    sd, _ = make_wrapper_state_dict()
    bs_path = str(tmp_path / "bitstream.nnc")
    nnc_tpu.compress_model(sd, bitstream_path=bs_path, qp=-38, lsa=False,
                           verbose=False)
    assert os.path.getsize(bs_path) > 0
    rec = nnc_tpu.decompress(bs_path, verbose=False)
    assert set(rec.keys()) == set(sd.keys())
    for name in sd:
        err = np.abs(rec[name] - sd[name]).max()
        assert err < 2e-3, (name, err)  # qp=-38 -> stepsize ~0.0015
    # compression should be far below fp32
    raw = sum(np.asarray(v).nbytes for v in sd.values())
    assert os.path.getsize(bs_path) < raw / 2


def test_compress_model_with_lsa_smoke(tmp_path):
    scene, (teacher_c, teacher_f) = synthetic.make_scene(
        n_images=3, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    sd = {}
    sd.update(nerf.params_to_state_dict(teacher_c, "model."))
    sd.update(nerf.params_to_state_dict(teacher_f, "model_fine."))

    run_dir = tmp_path / "run" / "bitstream"
    run_dir.mkdir(parents=True)
    bs_path = str(run_dir / "bitstream.nnc")

    scene["n_importance"] = 4
    nnc_tpu.compress_model(
        sd, bitstream_path=bs_path, qp=-20, lsa=True, verbose=False,
        task_type="NeRF", scene=scene, mlp_config=MLP,
        N_iters=4, epochs=1, i_save=0, learning_rate=1e-3,
        learning_rate_decay=0.1)

    rec = nnc_tpu.decompress(bs_path, verbose=False)
    # scales were applied into the weights on decode; no ls params remain
    assert not any(n.endswith("_scaling") for n in rec)
    assert set(rec.keys()) == set(sd.keys())
    # result.txt was written by the tuning loop
    result_txt = tmp_path / "run" / "result.txt"
    assert result_txt.exists()
    from nnc_tpu.utils.logging import read_result_file
    psnr, loss = read_result_file(str(result_txt))
    assert len(psnr) == 4 and len(loss) == 4


def test_capability_gating_with_occupancy_flags(tmp_path, capsys):
    """compress_model(lsa=True, occupancy_renders/tuning=True) without a
    dataset must degrade gracefully (INFO + compression completes without
    LSA), not AttributeError on the None executer (regression: the round-2
    occupancy-flag block dereferenced model_executer.rc after the except
    path set it to None; reference gating: nnc/compression.py:424-436)."""
    sd, _ = make_wrapper_state_dict()
    bs_path = str(tmp_path / "b.nnc")
    nnc_tpu.compress_model(
        sd, bitstream_path=bs_path, qp=-38, lsa=True, verbose=False,
        task_type="NeRF", dataset_path=str(tmp_path / "missing_dataset"),
        occupancy_renders=True, occupancy_tuning=True)
    out = capsys.readouterr().out
    assert "could not create a NeRF model executer" in out
    assert "lsa requires a model executer; disabled" in out
    assert os.path.getsize(bs_path) > 0
    rec = nnc_tpu.decompress(bs_path, verbose=False)
    assert set(rec.keys()) == set(sd.keys())


def test_tar_pt_roundtrip(tmp_path):
    sd, _ = make_wrapper_state_dict(seed=3)
    tar_path = str(tmp_path / "ckpt.tar")
    ckpt_utils.wrapper_dict_to_nerf_tar(sd, tar_path, global_step=1234)
    wrapper, step = ckpt_utils.nerf_tar_to_wrapper_dict(tar_path)
    assert step == 1234
    assert set(wrapper.keys()) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(wrapper[k], sd[k], atol=0)
    # .tar -> .pt conversion keeps the checkpoint loadable
    pt_path = str(tmp_path / "ckpt.pt")
    ckpt_utils.convert_tar_to_pt(tar_path, pt_path)
    import torch
    loaded = torch.load(pt_path, map_location="cpu")
    assert "network_fn_state_dict" in loaded


def test_executer_test_model():
    scene, (teacher_c, teacher_f) = synthetic.make_scene(
        n_images=3, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    scene["n_importance"] = 4
    from nnc_tpu.train.presets import create_nerf_model_executer
    ex = create_nerf_model_executer(scene=scene, mlp_config=MLP, n_iters=1,
                                    epochs=1, i_save=0, verbose=False)
    sd = {}
    sd.update(nerf.params_to_state_dict(teacher_c, "model."))
    sd.update(nerf.params_to_state_dict(teacher_f, "model_fine."))
    # the teacher rendered the scene itself; the executer re-renders with
    # its own (denser) sampling config, so PSNR is high but finite
    psnr = ex.test_model(sd)
    assert psnr > 20


def test_lsa_resume_from_checkpoint(tmp_path):
    """The executer resumes scales + step counter from ckpt_step*.pt."""
    scene, (tc, tf_) = synthetic.make_scene(
        n_images=2, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    scene["n_importance"] = 4
    from nnc_tpu.train.presets import create_nerf_model_executer
    ex = create_nerf_model_executer(scene=scene, mlp_config=MLP, n_iters=2,
                                    epochs=1, i_save=0, verbose=False)
    ex.resume = True

    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))
    sd = {k: np.asarray(v) for k, v in sd.items()}

    run = tmp_path / "run"
    rec = run / "reconstructed"
    rec.mkdir(parents=True)
    # fabricate a mid-tune checkpoint with recognizable scales
    ck = {}
    ls_marked = {n: np.full((v.shape[0], 1), 1.25, np.float32)
                 for n, v in sd.items() if n.endswith(".weight")}
    ck.update(sd)
    for n, v in ls_marked.items():
        ck[n + "_scaling"] = v
    import torch
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in ck.items()}, str(rec / "ckpt_step7.pt"))

    bs_path = str(run / "bitstream" / "b.nnc")
    (run / "bitstream").mkdir()
    lsa_params, _ = ex.tune_model(bs_path, parameters=dict(sd),
                                  param_types={}, lsa_flag=True)
    # tuned scales started from the checkpoint's 1.25, not 1.0
    some = next(iter(lsa_params.values()))
    assert abs(float(np.mean(some)) - 1.25) < 0.05


def test_lsa_resume_restores_optimizer_state(tmp_path, capsys):
    """Mid-tune checkpoints persist the Adam moments + step count in an
    .opt.npz sidecar (the reference carries tuning_optimizer_state_dict,
    utils.py:103-106); a resumed run loads them so the lr schedule and
    momentum continue instead of restarting."""
    scene, (tc, tf_) = synthetic.make_scene(
        n_images=2, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    scene["n_importance"] = 4
    from nnc_tpu.train.presets import create_nerf_model_executer

    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))
    sd = {k: np.asarray(v) for k, v in sd.items()}

    run = tmp_path / "run"
    (run / "bitstream").mkdir(parents=True)
    bs_path = str(run / "bitstream" / "b.nnc")

    ex1 = create_nerf_model_executer(scene=scene, mlp_config=MLP, n_iters=4,
                                     epochs=1, i_save=2, verbose=False)
    ex1.tune_model(bs_path, parameters=dict(sd), param_types={},
                   lsa_flag=True)
    rec = run / "reconstructed"
    assert (rec / "ckpt_step4.pt").exists()
    assert (rec / "ckpt_step4.opt.npz").exists()

    ex2 = create_nerf_model_executer(scene=scene, mlp_config=MLP, n_iters=6,
                                     epochs=1, i_save=0, verbose=True)
    ex2.resume = True
    capsys.readouterr()
    ex2.tune_model(bs_path, parameters=dict(sd), param_types={},
                   lsa_flag=True)
    out = capsys.readouterr().out
    assert "resuming LSA from step 4" in out
    assert "with optimizer state" in out


def test_ndc_llff_style_lsa_smoke(tmp_path):
    """NDC path: viewdirs from pre-warp dirs, rays warped to NDC space."""
    scene, (tc, tf_) = synthetic.make_scene(
        n_images=3, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    # llff-flavored scene: NDC bounds [0,1], pooled ray batching
    scene.update({"ndc": True, "near": 0.0, "far": 1.0,
                  "batching_mode": "pool", "n_importance": 4,
                  "raw_noise_std": 0.0, "dataset_type": "llff"})
    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))

    run_dir = tmp_path / "run" / "bitstream"
    run_dir.mkdir(parents=True)
    bs_path = str(run_dir / "b.nnc")
    nnc_tpu.compress_model(
        sd, bitstream_path=bs_path, qp=-24, lsa=True, verbose=False,
        task_type="NeRF", scene=scene, mlp_config=MLP,
        N_iters=3, epochs=1, i_save=0, learning_rate=1e-3,
        learning_rate_decay=0)
    rec = nnc_tpu.decompress(bs_path, verbose=False)
    assert set(rec.keys()) == set(sd.keys())
    from nnc_tpu.utils.logging import read_result_file
    psnr, loss = read_result_file(str(tmp_path / "run" / "result.txt"))
    assert len(loss) == 3 and all(np.isfinite(loss))


def test_i_save_checkpoints_and_renders(tmp_path):
    """i_save cadence: mid-tune checkpoints + testset renders are written."""
    scene, (tc, tf_) = synthetic.make_scene(
        n_images=2, H=8, W=8, mlp=MLP,
        rc=renderer.RenderConfig(mlp=MLP, n_samples=8, n_importance=4,
                                 chunk=64))
    scene["n_importance"] = 4
    sd = {}
    sd.update(nerf.params_to_state_dict(tc, "model."))
    sd.update(nerf.params_to_state_dict(tf_, "model_fine."))

    run_dir = tmp_path / "run" / "bitstream"
    run_dir.mkdir(parents=True)
    bs_path = str(run_dir / "b.nnc")
    nnc_tpu.compress_model(
        sd, bitstream_path=bs_path, qp=-24, lsa=True, verbose=False,
        task_type="NeRF", scene=scene, mlp_config=MLP,
        N_iters=4, epochs=1, i_save=2, learning_rate=1e-3,
        learning_rate_decay=0)
    rec_dir = tmp_path / "run" / "reconstructed"
    ckpts = sorted(p.name for p in rec_dir.glob("ckpt_step*.pt"))
    assert "ckpt_step1.pt" in ckpts  # first-step save
    assert "ckpt_step2.pt" in ckpts and "ckpt_step4.pt" in ckpts
    # testset renders written as PNGs
    t1 = tmp_path / "run" / "testset_step2"
    assert t1.is_dir() and list(t1.glob("*.png"))
    # testset + spiral render-path videos (reference run_nerf.py:781-794);
    # mp4 with ffmpeg, pure-Python MJPEG .avi without — a real video
    # artifact must exist either way
    movies = tmp_path / "run" / "movies"
    for stem in ("step2_rgb", "step2_spiral_rgb"):
        paths = list(movies.glob(stem + ".*"))
        assert paths, f"missing video artifact {stem}"
        assert paths[0].suffix in (".mp4", ".avi")
