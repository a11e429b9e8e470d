"""Per-group Adam with exponential-decay xyz LR.

Replaces the reference's torch.optim.Adam param groups
(gaussian_model.py:203-248, training_setup + update_learning_rate) with a
pure pytree transform. Semantics match torch.optim.Adam exactly:

  m ← β1·m + (1−β1)·g          v ← β2·v + (1−β2)·g²
  p ← p − lr · (m / (1−β1ᵗ)) / ( √(v / (1−β2ᵗ)) + ε ),   ε = 1e-15

(the reference sets eps=1e-15, gaussian_model.py:218). The xyz group's lr
follows expon_lr(iteration) evaluated at the iteration of the optimizer step
(train.py:134 updates it every iteration, but only the value at step time
matters). Feature groups (f_dc/f_rest) are excluded: their grads are None in
the reference so torch's Adam never touches them.

Implemented by hand rather than via optax.multi_transform so the group/LR/
bias-correction behavior provably matches torch for parity, and so the whole
update stays a trivially fuseable elementwise block under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from skelsplat_tpu.core import geometry
from skelsplat_tpu.core.gaussians import GaussianParams

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@dataclasses.dataclass(frozen=True)
class OptConfig:
    """Mirror of the ``optimization`` config group (configs/*.yaml) — the
    subset that is live in the SkelSplat path."""

    iterations: int = 500
    position_lr_init: float = 5e-4
    position_lr_final: float = 5e-6
    position_lr_delay_mult: float = 0.0
    position_lr_max_steps: int = 4000
    feature_lr: float = 0.0
    opacity_lr: float = 0.0
    scaling_lr: float = 5e-3
    rotation_lr: float = 1e-3
    # delay steps for the xyz schedule (0 in every reference config)
    position_lr_delay_steps: int = 0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    m: Any   # GaussianParams-shaped first moments
    v: Any   # second moments
    t: Any   # scalar int32 step count


class AdamGroups:
    """Stateless operator; state lives in AdamState (scan-carry friendly)."""

    def __init__(self, cfg: OptConfig):
        self.cfg = cfg

    def init(self, params: GaussianParams) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(m=zeros, v=zeros, t=jnp.asarray(0, jnp.int32))

    def xyz_lr(self, iteration, spatial_lr_scale=1.0):
        """expon LR at ``iteration`` (1-based). ``spatial_lr_scale`` is the
        per-scene cameras_extent (nerf_normalization radius) multiplying both
        LR endpoints (gaussian_model.py:209, 228-231 + scene/__init__.py:85,99).
        Implemented as a traced multiplier so per-scene extents don't retrigger
        compilation: lr(init·s, final·s) = s · lr(init, final) exactly, since
        the log-lerp is degree-1 homogeneous in (init, final)."""
        c = self.cfg
        return spatial_lr_scale * geometry.expon_lr(
            iteration, c.position_lr_init, c.position_lr_final,
            lr_delay_steps=c.position_lr_delay_steps,
            lr_delay_mult=c.position_lr_delay_mult,
            max_steps=c.position_lr_max_steps)

    def group_lrs(self, iteration, spatial_lr_scale=1.0) -> GaussianParams:
        c = self.cfg
        return GaussianParams(
            xyz=self.xyz_lr(iteration, spatial_lr_scale),
            log_scales=jnp.asarray(c.scaling_lr, jnp.float32),
            quats=jnp.asarray(c.rotation_lr, jnp.float32),
            opacity_logit=jnp.asarray(c.opacity_lr, jnp.float32),
        )

    def step(self, params: GaussianParams, grads: GaussianParams,
             state: AdamState, iteration,
             spatial_lr_scale=1.0) -> tuple[GaussianParams, AdamState]:
        """One Adam step; ``iteration`` is the (1-based) inner iteration at
        which the step fires (sets the xyz LR)."""
        t = state.t + 1
        tf = t.astype(jnp.float32)
        bc1 = 1.0 - BETA1 ** tf
        bc2 = 1.0 - BETA2 ** tf
        lrs = self.group_lrs(iteration, spatial_lr_scale)

        def upd(p, g, m, v, lr):
            m = BETA1 * m + (1.0 - BETA1) * g
            v = BETA2 * v + (1.0 - BETA2) * g * g
            denom = jnp.sqrt(v / bc2) + EPS
            return p - lr * (m / bc1) / denom, m, v

        out = jax.tree.map(upd, params, grads, state.m, state.v, lrs)
        # tree of (p, m, v) tuples → three trees
        new_p = jax.tree.map(lambda o: o[0], out,
                             is_leaf=lambda o: isinstance(o, tuple))
        new_m = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda o: isinstance(o, tuple))
        new_v = jax.tree.map(lambda o: o[2], out,
                             is_leaf=lambda o: isinstance(o, tuple))
        return new_p, AdamState(m=new_m, v=new_v, t=t)
