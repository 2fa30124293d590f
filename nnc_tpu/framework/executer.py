"""NeRF model executer: the codec's callback for LSA tuning / testing.

JAX counterpart of the reference's NeRFModelExecuter
(reference: framework/pytorch_model/__init__.py:922-1217): ``tune_model``
loads the dequantized wrapper parameters, optimizes only the
``weight_scaling`` vectors by rendering rays (coarse+fine double MSE), applies
per-epoch LR decay, periodically checkpoints + renders the test set, and
returns the tuned scales as flat numpy arrays.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import ModelExecute
from ..models import nerf
from ..render import renderer
from ..render.rays import get_rays_np, ndc_rays
from ..train import lsa
from ..utils.logging import mse2psnr, to8b


class NeRFModelExecuter(ModelExecute):
    def __init__(self, scene, render_config: renderer.RenderConfig, *,
                 learning_rate=1e-4, epochs=2, learning_rate_decay=0.1,
                 n_iters=50000, i_save=10000, n_rand=1024, seed=451,
                 mesh=None, verbose=True, resume=False, render_factor=0,
                 precrop_iters=0, precrop_frac=0.5):
        self.resume = resume
        # render_factor: downsample spiral/preview renders by this divisor
        # (reference: run_nerf.py:161-172); 0 = full resolution. Testset
        # renders stay full-res so PSNRs remain comparable.
        self.render_factor = int(render_factor)
        self.precrop_iters = int(precrop_iters)
        self.precrop_frac = float(precrop_frac)
        self.scene = scene
        self.rc = render_config
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.learning_rate_decay = learning_rate_decay
        self.n_iters = n_iters
        self.i_save = i_save
        self.n_rand = n_rand
        self.seed = seed
        self.mesh = mesh
        self.verbose = verbose
        self.dataset_type = scene.get("dataset_type", "synthetic")

    # -- helpers ------------------------------------------------------------
    def _make_batcher(self):
        from ..data.rays import RayBatcher
        scene = self.scene
        base = RayBatcher(scene["images"], scene["poses"], scene["K"],
                          scene["i_train"], self.n_rand,
                          mode=scene.get("batching_mode", "image"),
                          seed=self.seed,
                          precrop_iters=self.precrop_iters,
                          precrop_frac=self.precrop_frac)
        if not scene.get("ndc", False):
            return base

        H, W, focal = scene["H"], scene["W"], float(scene["K"][0][0])

        class NDCBatcher:
            def next_batch(_self):
                ro, rd, target = base.next_batch()
                vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
                ro_n, rd_n = ndc_rays(H, W, focal, 1.0, jnp.asarray(ro),
                                      jnp.asarray(rd))
                return (np.asarray(ro_n), np.asarray(rd_n),
                        vd.astype(np.float32), target)

        return NDCBatcher()

    def _split_params(self, parameters):
        cfg = self.rc.mlp
        params_c, ls_c = nerf.params_from_state_dict(parameters, "model.",
                                                     cfg)
        params_f, ls_f = nerf.params_from_state_dict(parameters,
                                                     "model_fine.", cfg)
        if ls_c is None:
            ls_c = nerf.init_lsa_scales(cfg)
        if ls_f is None:
            ls_f = nerf.init_lsa_scales(cfg)
        return params_c, params_f, ls_c, ls_f

    def _render_poses(self, params_c, params_f, ls_c, ls_f, poses,
                      savedir=None, names=None, render_factor=0):
        """Render an array of camera poses, through the occupancy fast mode
        when enabled (one grid per call, amortized across all poses; NDC
        scenes use the NDC-cube grid with pre-warp viewdirs).

        render_factor > 0 renders at (H//rf, W//rf) with focal/rf — the
        reference's fast-preview divisor (run_nerf.py:161-172)."""
        scene = self.scene
        H, W = scene["H"], scene["W"]
        K = np.asarray(scene["K"], np.float32)
        if render_factor:
            rf = int(render_factor)
            H, W = H // rf, W // rf
            K = K.copy()
            K[0, 0] /= rf; K[1, 1] /= rf; K[0, 2] /= rf; K[1, 2] /= rf
        rgbs = []
        grid = None
        is_ndc = bool(scene.get("ndc", False))
        if self.rc.use_occupancy_renders:
            from ..ops.mlp_pallas import supports
            if supports(self.rc.mlp):
                from ..render import occupancy
                # grid bounds: NDC scenes sample the NDC cube (the MLP
                # operates on NDC points, run_nerf.py:119-133); otherwise
                # the scene override or the blender-convention [-2, 2]^3
                if is_ndc:
                    aabb = ((-1.0,) * 3, (1.0,) * 3)
                else:
                    aabb = scene.get("aabb", ((-2.0,) * 3, (2.0,) * 3))
                grid = occupancy.build_occupancy_grid(
                    params_f if params_f is not None else params_c,
                    ls_f if params_f is not None else ls_c, self.rc.mlp,
                    lo=tuple(aabb[0]), hi=tuple(aabb[1]))
        for i, pose in enumerate(np.asarray(poses)):
            ro, rd = get_rays_np(H, W, K, pose[:3, :4])
            vd = None
            near, far = scene["near"], scene["far"]
            if is_ndc:
                vd = rd / np.linalg.norm(rd, axis=-1, keepdims=True)
                ro_j, rd_j = ndc_rays(H, W, float(K[0][0]), 1.0,
                                      jnp.asarray(ro), jnp.asarray(rd))
                ro, rd = np.asarray(ro_j), np.asarray(rd_j)
                near, far = 0.0, 1.0
            if grid is not None:
                from ..render import occupancy
                out = occupancy.render_image_fast(
                    params_f if params_f is not None else params_c,
                    ls_f if params_f is not None else ls_c,
                    ro, rd, near, far, self.rc, grid, viewdirs=vd)
            else:
                out = renderer.render_image(params_c, params_f, ls_c, ls_f,
                                            ro, rd, near, far, self.rc,
                                            viewdirs=vd)
            rgb = out["rgb_map"]
            rgbs.append(rgb)
            if savedir is not None:
                import imageio.v2 as imageio
                name = names[i] if names is not None else i
                imageio.imwrite(os.path.join(savedir, f"{name:03d}.png"),
                                to8b(rgb))
        return np.stack(rgbs)

    def _render_views(self, params_c, params_f, ls_c, ls_f, pose_indices,
                      savedir=None):
        scene = self.scene
        rgbs = self._render_poses(params_c, params_f, ls_c, ls_f,
                                  scene["poses"][np.asarray(pose_indices)],
                                  savedir=savedir, names=pose_indices)
        psnrs = [mse2psnr(float(np.mean((rgbs[i] - scene["images"][vi]) ** 2)))
                 for i, vi in enumerate(pose_indices)]
        return rgbs, psnrs

    # -- ModelExecute interface --------------------------------------------
    def tune_model(self, bitstream_path, parameters, param_types,
                   lsa_flag=True, ft_flag=False, verbose=False):
        params_c, params_f, ls_c, ls_f = self._split_params(parameters)
        scene = self.scene
        batcher = self._make_batcher()
        basedir_save = os.path.dirname(os.path.dirname(bitstream_path)) \
            if bitstream_path else None

        # resume-from-interruption (improvement over the reference, which
        # restarts tuning from scratch; SURVEY §5 checkpoint/resume gap):
        # pick up the newest mid-tune checkpoint's scales + step counter.
        global_step0 = 0
        opt_state0 = None
        if self.resume and basedir_save:
            import glob as _glob
            ckpts = _glob.glob(os.path.join(basedir_save, "reconstructed",
                                            "ckpt_step*.pt"))
            if ckpts:
                latest = max(ckpts, key=lambda p: int(
                    os.path.basename(p)[len("ckpt_step"):-3]))
                global_step0 = int(os.path.basename(latest)
                                   [len("ckpt_step"):-3])
                import torch
                sd = {k: v.numpy() for k, v in
                      torch.load(latest, map_location="cpu", weights_only=True).items()}
                _pc, _pf, ls_c, ls_f = self._split_params(sd)
                # optimizer-state sidecar (Adam moments + step count; the
                # reference carries tuning_optimizer_state_dict the same
                # way, utils.py:103-106) — flat leaves, re-structured by
                # tune_lsa_scales against a fresh optimizer.init
                opt_path = latest[:-3] + ".opt.npz"
                if os.path.exists(opt_path):
                    with np.load(opt_path) as z:
                        opt_state0 = [z[k] for k in sorted(
                            z.files, key=lambda s: int(s.split("_")[1]))]
                if self.verbose:
                    print(f"INFO: resuming LSA from step {global_step0} "
                          f"({latest}"
                          f"{', with optimizer state' if opt_state0 else ''})")

        def save_hook(step, cur_ls_c, cur_ls_f, opt_state=None):
            if basedir_save is None:
                return
            from ..utils import ckpt as ckpt_utils
            sd = {}
            sd.update(nerf.params_to_state_dict(params_c, "model.", cur_ls_c))
            sd.update(nerf.params_to_state_dict(params_f, "model_fine.",
                                                cur_ls_f))
            rec_dir = os.path.join(basedir_save, "reconstructed")
            os.makedirs(rec_dir, exist_ok=True)
            from ..framework.torch_io import save_to_torch_file
            save_to_torch_file(sd, os.path.join(rec_dir,
                                                f"ckpt_step{step}.pt"))
            if opt_state is not None:
                leaves = jax.tree_util.tree_leaves(opt_state)
                np.savez(os.path.join(rec_dir, f"ckpt_step{step}.opt.npz"),
                         **{f"leaf_{i}": np.asarray(l)
                            for i, l in enumerate(leaves)})
            testdir = os.path.join(basedir_save, f"testset_step{step}")
            os.makedirs(testdir, exist_ok=True)
            rgbs, _ = self._render_views(params_c, params_f, cur_ls_c,
                                         cur_ls_f, scene["i_test"],
                                         savedir=testdir)
            moviedir = os.path.join(basedir_save, "movies")
            os.makedirs(moviedir, exist_ok=True)
            # spiral render-path video from render_poses (reference:
            # run_nerf.py:781-794 writes the render_poses mp4 at i_save);
            # rides the occupancy fast mode when enabled, like the testsets
            spiral_frames = None
            rposes = scene.get("render_poses")
            if rposes is not None and len(rposes):
                spiral_frames = self._render_poses(
                    params_c, params_f, cur_ls_c, cur_ls_f, rposes,
                    render_factor=self.render_factor)
            def write_video(name, frames):
                # mp4 when ffmpeg exists, else pure-Python MJPEG .avi
                from ..utils.video import write_video as wv
                wv(os.path.join(moviedir, name), to8b(frames),
                   fps=30, quality=8)

            write_video(f"step{step}_rgb", rgbs)
            if spiral_frames is not None:
                write_video(f"step{step}_spiral_rgb", spiral_frames)

        # occupancy-accelerated tuning (opt-in): selection grid built once
        # from the quantized fine network (the geometry LSA corrects is
        # channel-scale error — occupancy barely moves, and the dilated
        # grid is conservative). Same gating as the fast test renders.
        occ_grid = None
        if self.rc.use_occupancy_tuning:
            from ..ops.mlp_pallas import supports
            if supports(self.rc.mlp):
                from ..render import occupancy
                # NDC scenes: the batcher already warps rays, and the MLP
                # operates on NDC points — sample the NDC cube
                if scene.get("ndc", False):
                    aabb = ((-1.0,) * 3, (1.0,) * 3)
                else:
                    aabb = scene.get("aabb", ((-2.0,) * 3, (2.0,) * 3))
                # per-ray selection needs no block-divergence absorption:
                # dilate=1 keeps the training sample count minimal (the
                # default dilation exists for raster-tiled frame selection)
                occ_grid = occupancy.build_occupancy_grid(
                    params_f if params_f is not None else params_c,
                    ls_f if params_f is not None else ls_c, self.rc.mlp,
                    lo=tuple(aabb[0]), hi=tuple(aabb[1]), dilate=1)

        ls_c, ls_f, mean_psnr, mean_loss, _, biases = lsa.tune_lsa_scales(
            params_c, params_f, ls_c, ls_f, batcher, self.rc,
            scene["near"], scene["far"], grid=occ_grid,
            learning_rate=self.learning_rate,
            learning_rate_decay=self.learning_rate_decay,
            epochs=self.epochs, n_iters=self.n_iters, i_save=self.i_save,
            basedir_save=basedir_save, global_step0=global_step0,
            seed=self.seed, verbose=self.verbose or verbose,
            save_hook=save_hook, mesh=self.mesh, tune_biases=ft_flag,
            tune_scales=lsa_flag, opt_state0=opt_state0)

        lsa_params, ft_params = {}, {}
        if lsa_flag:
            for name in ls_c:
                lsa_params["model." + name + ".weight_scaling"] = \
                    np.asarray(ls_c[name]).flatten()
            for name in ls_f:
                lsa_params["model_fine." + name + ".weight_scaling"] = \
                    np.asarray(ls_f[name]).flatten()
        if ft_flag and biases is not None:
            # fine-tuning adjusts the bias companions against the quantized
            # weights (reference ft trains O_TYPES params, not weights:
            # pytorch_model/__init__.py:1129-1145, 1195-1203)
            b_c, b_f = biases
            for name, b in b_c.items():
                ft_params["model." + name + ".bias"] = np.asarray(b)
            for name, b in b_f.items():
                ft_params["model_fine." + name + ".bias"] = np.asarray(b)
        return lsa_params, ft_params

    def test_model(self, parameters, verbose=False):
        """Render all test views; returns mean PSNR."""
        params_c, params_f, ls_c, ls_f = self._split_params(parameters)
        _, psnrs = self._render_views(params_c, params_f, ls_c, ls_f,
                                      self.scene["i_test"])
        if verbose:
            print(f"test PSNR per view: {psnrs}")
        return float(np.mean(psnrs))

    def eval_model(self, parameters, verbose=False):
        """Cheap probe: PSNR over one random ray batch per test view."""
        params_c, params_f, ls_c, ls_f = self._split_params(parameters)
        scene = self.scene
        batcher = self._make_batcher()
        batch = batcher.next_batch()
        if len(batch) == 4:
            ro, rd, vd, target = batch
        else:
            ro, rd, target = batch
            vd = None
        out = renderer.render_image(params_c, params_f, ls_c, ls_f, ro, rd,
                                    scene["near"], scene["far"], self.rc,
                                    viewdirs=vd)
        psnr = mse2psnr(float(np.mean((out["rgb_map"] - target) ** 2)))
        return psnr, psnr, float(np.mean((out["rgb_map"] - target) ** 2))

    def has_eval(self):
        return True

    def has_test(self):
        return True

    def has_tune_ft(self):
        return True

    def has_tune_lsa(self):
        return True
