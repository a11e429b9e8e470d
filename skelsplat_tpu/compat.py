"""Reference-API compatibility facade.

``GaussianModel`` and ``Scene`` mirror the reference's public classes
(scene/gaussian_model.py:30-498, scene/__init__.py:21-129) on top of the
functional core, so code written against the reference's object API ports
mechanically. The functional pytree API (core/gaussians.py,
engine/trainer.py) is the recommended interface — this facade wraps it.
"""

from __future__ import annotations

import json
import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from skelsplat_tpu.core.gaussians import (GaussianParams, init_params,
                                          one_hot_features)
from skelsplat_tpu.data import ply
from skelsplat_tpu.engine.optim import AdamGroups, AdamState, OptConfig
from skelsplat_tpu.utils import searchForMaxIteration


class BasicPointCloud(NamedTuple):
    """utils/graphics_utils.py:17-20."""

    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray


class GaussianModel:
    """Mutable facade over GaussianParams + AdamGroups
    (gaussian_model.py:30-339; the densify/prune family lives in
    ops/densify.py as pure functions)."""

    def __init__(self, sh_degree: int = 1, optimizer_type: str = "default"):
        self.active_sh_degree = 0
        self.max_sh_degree = sh_degree
        self.optimizer_type = optimizer_type
        self.params: GaussianParams | None = None
        self.opt: AdamGroups | None = None
        self.opt_state: AdamState | None = None
        self.spatial_lr_scale = 0.0
        self._features_dc = None

    # --- activations (gaussian_model.py:102-143) ---
    @property
    def get_xyz(self):
        return self.params.xyz

    @property
    def get_scaling(self):
        return self.params.scales

    @property
    def get_rotation(self):
        return self.params.rotations

    @property
    def get_opacity(self):
        return self.params.opacity

    @property
    def get_features(self):
        return self._features_dc

    def get_covariance(self, scaling_modifier=1):
        return self.params.covariance(scaling_modifier)

    def oneupSHdegree(self):
        if self.active_sh_degree < self.max_sh_degree:
            self.active_sh_degree += 1

    # --- lifecycle (gaussian_model.py:149-248) ---
    def create_from_pcd(self, pcd, cam_infos, spatial_lr_scale: float,
                        opacity_on: bool, scaling: float, n_joints: int,
                        scaling_modifier: float = 1.0,
                        scene_type: str = "h36m"):
        self.spatial_lr_scale = spatial_lr_scale
        self.params = init_params(np.asarray(pcd.points), scene_type,
                                  scaling, scaling_modifier)
        self._features_dc = one_hot_features(self.params.n_joints)[:, None, :]
        self.opacity_on = opacity_on

    def training_setup(self, training_args):
        cfg = OptConfig(
            iterations=int(getattr(training_args, "iterations", 500)),
            position_lr_init=float(training_args.position_lr_init),
            position_lr_final=float(training_args.position_lr_final),
            position_lr_delay_mult=float(training_args.position_lr_delay_mult),
            position_lr_max_steps=int(training_args.position_lr_max_steps),
            feature_lr=float(training_args.feature_lr),
            opacity_lr=float(training_args.opacity_lr),
            scaling_lr=float(training_args.scaling_lr),
            rotation_lr=float(training_args.rotation_lr),
        )
        self.opt = AdamGroups(cfg)
        self.opt_state = self.opt.init(self.params)

    def update_learning_rate(self, iteration):
        """Returns the xyz lr at ``iteration`` (the stateless optimizer
        applies it at step time)."""
        return float(self.opt.xyz_lr(iteration, self.spatial_lr_scale))

    def step(self, grads: GaussianParams, iteration: int):
        self.params, self.opt_state = self.opt.step(
            self.params, grads, self.opt_state, iteration,
            self.spatial_lr_scale)

    # --- checkpointing (gaussian_model.py:68-100, 264-339) ---
    def capture(self):
        return (self.active_sh_degree, self.params, self.opt_state,
                self.spatial_lr_scale)

    def restore(self, model_args, training_args):
        (self.active_sh_degree, self.params, opt_state,
         self.spatial_lr_scale) = model_args
        self.training_setup(training_args)
        self.opt_state = opt_state

    def save_ply(self, path):
        ply.write_gaussian_ply(
            path, np.asarray(self.params.xyz),
            np.asarray(self.params.log_scales),
            np.asarray(self.params.quats),
            np.asarray(self.params.opacity_logit))

    def load_ply(self, path, use_train_test_exp=False):
        g = ply.read_gaussian_ply(path)
        self.params = GaussianParams(
            xyz=jnp.asarray(g["xyz"]),
            log_scales=jnp.asarray(g["log_scales"]),
            quats=jnp.asarray(g["quats"]),
            opacity_logit=jnp.asarray(g["opacity_logit"]))
        if g["features_dc"] is not None:
            self._features_dc = jnp.asarray(g["features_dc"])[:, None, :]
        self.active_sh_degree = self.max_sh_degree


class Scene:
    """Per-frame scene assembly facade (scene/__init__.py:21-129)."""

    def __init__(self, dataset, model, gaussians: GaussianModel,
                 initial_guess_3d, cameras, scene_name, output_dir,
                 load_iteration=None):
        from skelsplat_tpu.core.gaussians import N_JOINTS, scene_type_of
        from skelsplat_tpu.data import cameras_io
        from skelsplat_tpu.engine.trainer import cameras_extent

        self.model_path = output_dir
        self.gaussians = gaussians
        self.scene_name = scene_name
        self.poses_3d = initial_guess_3d
        self.cameras = cameras
        self.scene_type = dataset.data_root.split("/")[-1]
        self.loaded_iter = None

        stype = scene_type_of(dataset.data_root)
        self.n_joints = N_JOINTS[stype]

        if load_iteration:
            if load_iteration == -1:
                self.loaded_iter = searchForMaxIteration(
                    os.path.join(self.model_path, "point_cloud"))
            else:
                self.loaded_iter = load_iteration

        # on-disk artifacts (scene/__init__.py:67-79)
        xyz = np.asarray(initial_guess_3d, np.float32).reshape(-1, 3)
        rgb = np.ones_like(xyz) * 255
        ply.write_point_ply(os.path.join(output_dir, "sparse", "points3D.ply"),
                            xyz, rgb)
        ply.write_point_ply(os.path.join(output_dir, "input.ply"), xyz, rgb)
        with open(os.path.join(output_dir, "cameras.json"), "w") as f:
            json.dump([cameras_io.camera_to_json(i, c)
                       for i, c in enumerate(cameras)], f)

        self.camera_batch = cameras_io.build_camera_batch(cameras)
        self.cameras_extent = cameras_extent(self.camera_batch)

        if self.loaded_iter:
            self.gaussians.load_ply(os.path.join(
                self.model_path, "point_cloud",
                f"iteration_{self.loaded_iter}", "point_cloud.ply"))
        else:
            pcd = BasicPointCloud(xyz, rgb / 255.0, np.zeros_like(xyz))
            self.gaussians.create_from_pcd(
                pcd, cameras, self.cameras_extent,
                bool(getattr(model, "opacity_on", True)),
                float(model.scaling), self.n_joints,
                float(model.scaling_modifier), stype)

    def save_h36m(self, iteration, scene_name):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}", f"{scene_name}.ply")
        self.gaussians.save_ply(path)

    def save(self, iteration):
        path = os.path.join(self.model_path, "point_cloud",
                            f"iteration_{iteration}", "point_cloud.ply")
        self.gaussians.save_ply(path)

    def getTrainCameras(self, scale=1.0):
        return self.camera_batch

    def getTestCameras(self, scale=1.0):
        return None

    def getSceneName(self, scene_idx=None):
        return self.scene_name
