"""ImageNet loader, config-txt parser, mock evaluator, profiling utils."""
import os

import numpy as np
import pytest


def make_fake_imagenet(root, n_classes=2, per_class=3, size=32):
    from PIL import Image
    rng = np.random.default_rng(0)
    files = []
    for c in range(n_classes):
        d = os.path.join(root, f"n{c:08d}")
        os.makedirs(d)
        for i in range(per_class):
            name = f"img_{c}_{i}.JPEG"
            Image.fromarray(
                rng.integers(0, 255, (size, size, 3), np.uint8)).save(
                os.path.join(d, name))
            files.append((f"n{c:08d}", name))
    return files


def test_imagenet_dataset_and_loaders(tmp_path):
    from nnc_tpu.data.imagenet import ImageNetDataset, imagenet_dataloaders
    files = make_fake_imagenet(str(tmp_path))
    ds = ImageNetDataset(str(tmp_path), "train")
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (224, 224, 3) and 0 <= y < 2

    # validation split via file list
    val_list = str(tmp_path / "val.txt")
    with open(val_list, "w") as f:
        f.write(files[0][1] + "\n")
    train_fn, val_fn = imagenet_dataloaders(str(tmp_path), batch_size=4,
                                            validation_files_path=val_list)
    xb, yb = next(iter(train_fn()))
    assert xb.shape[0] <= 4 and xb.dtype == np.float32
    n_train = sum(len(y) for _x, y in train_fn())
    n_val = sum(len(y) for _x, y in val_fn())
    assert n_train == 5 and n_val == 1


def test_registry_real_imagenet_loaders(tmp_path):
    """NNR_PYT eval runs on a folder fixture through the registry alone
    (reference wires real loaders in use_case_init/__init__.py:21-72)."""
    import jax.numpy as jnp

    from nnc_tpu.framework.use_cases import use_cases

    # reference layout: root/train (train+val via list) + root/val (test)
    root = tmp_path / "inet"
    os.makedirs(root)
    train_files = make_fake_imagenet(str(root / "train"), per_class=3)
    make_fake_imagenet(str(root / "val"), per_class=2)
    with open(root / "val.txt", "w") as f:
        f.write(train_files[0][1] + "\n")

    handler = use_cases["NNR_PYT"]()
    train_loader = handler.init_training(str(root), 4, 0)
    val_set, val_loader = handler.init_validation(str(root), 4, 0)
    test_set, test_loader = handler.init_test(str(root), 4, 2)
    assert sum(len(y) for _x, y in train_loader) == 5
    assert len(val_set) == 1 and sum(len(y) for _x, y in val_loader) == 1
    assert len(test_set) == 4

    # eval a tiny linear classifier through the registry's evaluate callable
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(0, 1e-3, (224 * 224 * 3, 6)),
                               jnp.float32)}

    def apply_fn(p, _ls, x):
        return x.reshape(x.shape[0], -1) @ p["w"]

    top1, top5, loss = handler.evaluate(apply_fn, params, {}, test_loader)
    assert 0.0 <= top1 <= 1.0 and np.isfinite(loss)

    # pathless fallback keeps the data-free codec path working
    dummy = handler.init_training(None, 4, 0)
    assert len(dummy) == 0
    dset, dloader = handler.init_test("/nonexistent/path", 4, 0)
    assert len(dloader) == 0

    # flat class-folder root (no train/ subdir) works for every split
    flat = tmp_path / "flat"
    os.makedirs(flat)
    make_fake_imagenet(str(flat), per_class=2)
    fset, floader = handler.init_test(str(flat), 4, 0)
    assert len(fset) == 4


def test_config_txt_parser(tmp_path):
    from nnc_tpu.utils.config_txt import load_config, scene_overrides
    cfg = load_config(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "lego.txt"))
    assert cfg["dataset_type"] == "blender"
    assert cfg["N_importance"] == 128
    assert cfg["white_bkgd"] is True
    ov = scene_overrides(cfg)
    assert ov["n_importance"] == 128 and ov["half_res"] is True


def test_mock_nerf_evaluator():
    from nnc_tpu.train import evaluation_nerf_mock as m
    m.reset()
    p0 = m.evaluate_nerf_model(mode="finite")
    p1 = m.evaluate_nerf_model(mode="finite")
    assert p1[0] > p0[0]
    m.reset()
    vals = [m.evaluate_nerf_model(mode="infinite")[0] for _ in range(10)]
    assert all(b > a for a, b in zip(vals, vals[1:]))


def test_throughput_meter():
    from nnc_tpu.utils.profiling import Throughput
    t = Throughput()
    t.add(100)
    assert t.rate() > 0


def test_raybatcher_precrop_center_sampling():
    """precrop_iters batches sample only the center crop, then full frame
    (reference: run_nerf.py:466,715-725)."""
    from nnc_tpu.data.rays import RayBatcher
    rng = np.random.default_rng(0)
    H = W = 16
    images = rng.random((2, H, W, 3)).astype(np.float32)
    poses = np.tile(np.eye(4, dtype=np.float32)[None], (2, 1, 1))
    K = np.array([[8.0, 0, 8], [0, 8.0, 8], [0, 0, 1]], np.float32)
    b = RayBatcher(images, poses, K, [0, 1], n_rand=64, seed=1,
                   precrop_iters=2, precrop_frac=0.5)
    # reconstruct sampled pixel coords by matching targets
    def coords_of(target, img_i=None):
        ys, xs = [], []
        for t in target:
            hit = np.argwhere(np.all(np.isclose(images, t), axis=-1))
            assert len(hit) >= 1
            ys.append(hit[0][1]); xs.append(hit[0][2])
        return np.array(ys), np.array(xs)

    dH = dW = int(H // 2 * 0.5)  # 4 -> crop rows/cols 4..11
    for _ in range(2):  # precrop batches
        _, _, target = b.next_batch()
        assert target.shape == (4 * dH * dW, 3)  # crop has 64 pixels
        ys, xs = coords_of(target)
        assert ys.min() >= H // 2 - dH and ys.max() <= H // 2 + dH - 1
        assert xs.min() >= W // 2 - dW and xs.max() <= W // 2 + dW - 1
    # post-precrop batch covers the full frame eventually
    seen_outside = False
    for _ in range(8):
        _, _, target = b.next_batch()
        ys, xs = coords_of(target)
        if ys.min() < H // 2 - dH or ys.max() > H // 2 + dH - 1:
            seen_outside = True
    assert seen_outside


def test_render_factor_downsamples_preview():
    """render_factor=2 previews at (H//2, W//2) (ref run_nerf.py:161-172)."""
    from nnc_tpu.data import synthetic
    from nnc_tpu.framework.executer import NeRFModelExecuter
    from nnc_tpu.models import nerf
    from nnc_tpu.render import renderer
    mlp = nerf.NeRFConfig(W=16)
    rc = renderer.RenderConfig(mlp=mlp, n_samples=4, n_importance=2,
                               chunk=256, perturb=False)
    scene, (tc, tf_) = synthetic.make_scene(n_images=2, H=8, W=8, mlp=mlp,
                                            rc=rc, seed=0)
    ex = NeRFModelExecuter(scene, rc, n_iters=1, i_save=0, n_rand=16,
                           render_factor=2, verbose=False)
    rgbs = ex._render_poses(tc, tf_, None, None, scene["poses"][:1],
                            render_factor=2)
    assert rgbs.shape == (1, 4, 4, 3)
    full = ex._render_poses(tc, tf_, None, None, scene["poses"][:1])
    assert full.shape == (1, 8, 8, 3)


def test_merge_rd_results(tmp_path):
    """tools/merge_rd.py: budget-keyed merge, later inputs win, pre-r4
    records normalize to the old 500x1 budget, dirs accepted."""
    import json
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import merge_rd

    into = tmp_path / "rd_results.json"
    into.write_text(json.dumps([
        {"qp": -20, "lsa": True, "bytes": 100, "psnr": 30.0,
         "run_dir": "r3"},  # legacy record: no budget fields
    ]))
    sweep_dir = tmp_path / "sweep"
    sweep_dir.mkdir()
    (sweep_dir / "rd_results.json").write_text(json.dumps([
        {"qp": -20, "lsa": True, "bytes": 104, "psnr": 33.0,
         "lsa_iters": 3000, "epochs": 2, "run_dir": "r4prod"},
        {"qp": -20, "lsa": True, "bytes": 101, "psnr": 30.5,
         "lsa_iters": 500, "epochs": 1, "run_dir": "r4short"},
    ]))
    merge_rd.main([str(sweep_dir), "--into", str(into)])

    out = json.loads(into.read_text())
    assert len(out) == 2  # legacy 500x1 replaced by the newer 500x1
    short = [r for r in out if r["lsa_iters"] == 500]
    prod = [r for r in out if r["lsa_iters"] == 3000]
    assert len(short) == 1 and short[0]["run_dir"] == "r4short"
    assert len(prod) == 1 and prod[0]["psnr"] == 33.0
    # sorted: short budget first
    assert out[0]["lsa_iters"] == 500

    # an IOQ record at the same (qp, lsa, budget) is its own series key,
    # not a replacement for the flat-QP record
    ioq_file = tmp_path / "ioq.json"
    ioq_file.write_text(json.dumps([
        {"qp": -20, "lsa": True, "bytes": 90, "psnr": 35.0,
         "lsa_iters": 3000, "epochs": 2, "mode": "ioq",
         "run_dir": "r4ioq"},
    ]))
    merge_rd.main([str(ioq_file), "--into", str(into)])
    out = json.loads(into.read_text())
    prod = [r for r in out if r["lsa_iters"] == 3000]
    assert {r["mode"] for r in prod} == {"flat", "ioq"}
    assert len(prod) == 2

    # --plot renders one series per (mode, lsa, budget) without error
    png = tmp_path / "rd.png"
    merge_rd.main([str(sweep_dir), "--into", str(into),
                   "--plot", str(png)])
    assert png.stat().st_size > 0
