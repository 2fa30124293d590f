"""Dataset loaders exercised against synthesized on-disk fixtures."""
import json
import os

import numpy as np
import pytest


def write_png(path, arr):
    import imageio.v2 as imageio
    imageio.imwrite(path, arr.astype(np.uint8))


def make_blender_tree(root, n=2, size=16):
    rng = np.random.default_rng(0)
    for split in ("train", "val", "test"):
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            name = f"./{split}/r_{i}"
            write_png(os.path.join(root, f"{split}/r_{i}.png"),
                      rng.integers(0, 255, (size, size, 4)))
            c2w = np.eye(4)
            c2w[2, 3] = 4.0
            frames.append({"file_path": name,
                           "transform_matrix": c2w.tolist()})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.6911, "frames": frames}, f)


def test_blender_loader(tmp_path):
    from nnc_tpu.data.blender import load_blender_data
    make_blender_tree(str(tmp_path))
    imgs, poses, render_poses, hwf, i_split = load_blender_data(
        str(tmp_path), half_res=True, testskip=1)
    assert imgs.shape == (6, 8, 8, 4)  # half_res
    assert poses.shape == (6, 4, 4)
    assert render_poses.shape == (40, 4, 4)
    assert len(i_split) == 3 and len(i_split[0]) == 2
    H, W, focal = hwf
    assert H == 8 and W == 8 and focal > 0
    assert imgs.max() <= 1.0


def test_blender_scene_preset(tmp_path):
    from nnc_tpu.train.presets import load_scene
    make_blender_tree(str(tmp_path))
    scene = load_scene("blender", str(tmp_path), half_res=False, testskip=1)
    assert scene["images"].shape[-1] == 3  # white-bkgd composited
    assert scene["near"] == 2.0 and scene["far"] == 6.0
    assert scene["white_bkgd"] and not scene["ndc"]


def make_llff_tree(root, n=4, size=16):
    rng = np.random.default_rng(1)
    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir)
    for i in range(n):
        write_png(os.path.join(imgdir, f"img{i:03d}.png"),
                  rng.integers(0, 255, (size, size, 3)))
    poses = np.zeros((n, 3, 5), np.float32)
    for i in range(n):
        # camera at z=+4 with small offsets, looking at origin (llff
        # convention: [down right back] before loader rotation)
        c2w = np.eye(4)[:3]
        c2w[0, 3] = 0.1 * i
        c2w[2, 3] = 4.0 + 0.05 * i
        poses[i, :, :4] = c2w
        poses[i, :, 4] = [size, size, 20.0]  # h, w, focal
    bounds = np.stack([np.full(n, 2.0), np.full(n, 6.0)], -1)
    arr = np.concatenate([poses.reshape(n, -1), bounds], -1)
    np.save(os.path.join(root, "poses_bounds.npy"), arr)


def test_llff_loader(tmp_path):
    from nnc_tpu.data.llff import load_llff_data
    make_llff_tree(str(tmp_path))
    imgs, poses, bds, render_poses, i_test = load_llff_data(
        str(tmp_path), factor=2)
    assert imgs.shape == (4, 8, 8, 3)
    assert poses.shape == (4, 3, 5)
    assert render_poses.shape[0] == 120
    assert 0 <= i_test < 4
    # minified images cached on disk
    assert os.path.isdir(os.path.join(str(tmp_path), "images_2"))


def make_deepvoxels_tree(root, scene="cube", n=2, size=512):
    rng = np.random.default_rng(2)
    for split in ("train", "test", "validation"):
        base = os.path.join(root, split, scene)
        os.makedirs(os.path.join(base, "pose"))
        os.makedirs(os.path.join(base, "rgb"))
        with open(os.path.join(base, "intrinsics.txt"), "w") as f:
            f.write("500.0 256.0 256.0\n0 0 0\n0.5\n1.0\n512 512\n0\n")
        for i in range(n):
            pose = np.eye(4)
            pose[2, 3] = 2.0
            with open(os.path.join(base, "pose", f"{i:04d}.txt"), "w") as f:
                f.write(" ".join(str(x) for x in pose.flatten()))
            write_png(os.path.join(base, "rgb", f"{i:04d}.png"),
                      rng.integers(0, 255, (size, size, 3)))


def test_deepvoxels_loader(tmp_path):
    from nnc_tpu.data.deepvoxels import load_dv_data
    make_deepvoxels_tree(str(tmp_path))
    imgs, poses, render_poses, hwf, i_split = load_dv_data(
        scene="cube", basedir=str(tmp_path), testskip=1)
    assert imgs.shape[1:] == (512, 512, 3)
    assert poses.shape[1:] == (3, 4)
    assert hwf[0] == 512 and hwf[2] > 0


def make_linemod_tree(root, n=2, size=16):
    rng = np.random.default_rng(3)
    os.makedirs(os.path.join(root, "imgs"))
    K = [[100.0, 0, 8.0], [0, 100.0, 8.0], [0, 0, 1.0]]
    for split in ("train", "val", "test"):
        frames = []
        for i in range(n):
            p = os.path.join(root, "imgs", f"{split}_{i}.png")
            write_png(p, rng.integers(0, 255, (size, size, 3)))
            frames.append({"file_path": p,
                           "transform_matrix": np.eye(4).tolist(),
                           "intrinsic_matrix": K})
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"frames": frames, "near": 0.5, "far": 3.2}, f)


def test_linemod_loader(tmp_path):
    from nnc_tpu.data.linemod import load_LINEMOD_data
    make_linemod_tree(str(tmp_path))
    imgs, poses, render_poses, hwf, K, i_split, near, far = \
        load_LINEMOD_data(str(tmp_path), half_res=False, testskip=1)
    assert imgs.shape == (6, 16, 16, 3)
    assert near == 0.0 and far == 4.0  # floor/ceil of 0.5 / 3.2
    assert K[0][0] == 100.0
