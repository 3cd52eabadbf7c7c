"""Distributed sliding-window BA: landmark shards x psum-reduced camera system.

Scaling story (BASELINE.json north star; the reference is single-process
C++ with no distributed anything, SURVEY.md §5): bundle adjustment's
structure is embarrassingly parallel in the LANDMARK dimension once the
camera system is Schur-reduced —

  * observations are stored landmark-major [L, W]: landmark l observed in
    window keyframe w at obs_uv[l, w] (at most one observation per
    (landmark, keyframe), so the layout is dense and static);
  * the landmark axis L is sharded over the mesh with `shard_map`; each
    device builds its shard's Hll (3x3), Wpl (6x3 per pose), landmark
    gradients, and its PARTIAL reduced camera system S_partial [W,6,W,6],
    b_partial [W,6];
  * one `psum` over the mesh produces the exact global reduced system —
    the only cross-device traffic is O((6W)^2) floats per GN iteration,
    riding ICI;
  * the dense [6W, 6W] solve is replicated (cheap); landmark
    back-substitution is local to each shard.

Poses are replicated; landmarks never leave their device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ya_vo_tpu.core import lie
from ya_vo_tpu.core.camera import Camera


class DistBAProblem(NamedTuple):
    """Landmark-major BA problem (see module docstring for layout)."""

    poses: jnp.ndarray      # [W, 4, 4] world->camera (replicated)
    landmarks: jnp.ndarray  # [L, 3] (sharded on L)
    lm_valid: jnp.ndarray   # [L] bool
    obs_uv: jnp.ndarray     # [L, W, 2]
    obs_valid: jnp.ndarray  # [L, W] bool


def from_window_problem(prob) -> DistBAProblem:
    """Convert a keyframe-major `ba.window.BAProblem` (obs [W, O]) to the
    landmark-major layout (host-side, numpy)."""
    W = int(prob.poses.shape[0])
    L = int(prob.landmarks.shape[0])
    obs_uv = np.zeros((L, W, 2), np.float32)
    obs_valid = np.zeros((L, W), bool)
    kf_lm = np.asarray(prob.obs_lm)
    kf_uv = np.asarray(prob.obs_uv)
    kf_ok = np.asarray(prob.obs_valid)
    for w in range(W):
        ok = kf_ok[w] & (kf_lm[w] >= 0)
        lm = kf_lm[w][ok]
        obs_uv[lm, w] = kf_uv[w][ok]
        obs_valid[lm, w] = True
    return DistBAProblem(
        poses=jnp.asarray(np.asarray(prob.poses)),
        landmarks=jnp.asarray(np.asarray(prob.landmarks)),
        lm_valid=jnp.asarray(np.asarray(prob.lm_valid)),
        obs_uv=jnp.asarray(obs_uv),
        obs_valid=jnp.asarray(obs_valid),
    )


def _shard_terms(poses, landmarks, lm_valid, obs_uv, obs_valid, cam: Camera,
                 huber_delta: float):
    """Per-observation terms in the landmark-major layout.
    Shapes: r [L, W, 2], Jp [L, W, 2, 6], Jl [L, W, 2, 3], w [L, W]."""
    R = poses[None, :, :3, :3]                    # [1, W, 3, 3]
    t = poses[None, :, :3, 3]
    X = landmarks[:, None, :]                     # [L, 1, 3]
    pc = jnp.einsum("lwij,lwj->lwi",
                    jnp.broadcast_to(R, (X.shape[0], R.shape[1], 3, 3)),
                    jnp.broadcast_to(X, (X.shape[0], R.shape[1], 3))) + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    valid = obs_valid & lm_valid[:, None] & (z > 1e-2)
    # a landmark needs >= 2 usable observations to be part of the problem:
    # with one, its position is unconstrained along the ray and its
    # (damped-singular) Hll^-1 corrupts the reduced camera system
    valid = valid & (jnp.sum(valid, axis=1, keepdims=True) >= 2)
    z_safe = jnp.where(z < 1e-2, 1e-2, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - obs_uv

    zeros = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1),
            jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # [L, W, 2, 3]
    Jp_point = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape + (3,)),
            -lie.hat(pc),
        ],
        axis=-1,
    )  # [L, W, 3, 6]
    Jp = jnp.einsum("lwij,lwjk->lwik", J_proj, Jp_point,
                    preferred_element_type=jnp.float32)
    Jl = jnp.einsum("lwij,wjk->lwik", J_proj, poses[:, :3, :3],
                    preferred_element_type=jnp.float32)

    chi2 = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.minimum(1.0, huber_delta / nrm)
    w = w_huber * valid.astype(r.dtype)
    huber_cost = jnp.where(
        nrm <= huber_delta, 0.5 * chi2,
        huber_delta * (nrm - 0.5 * huber_delta))
    cost = jnp.sum(jnp.where(valid, huber_cost, 0.0))
    return r, Jp, Jl, w, cost


def make_dist_solver(
    mesh: Mesh,
    cam: Camera,
    *,
    axis: str = "lm",
    iters: int = 8,
    huber_delta: float = 2.4477,
    damping: float = 1e-4,
):
    """Build a jitted distributed window-BA solver over `mesh`.

    Returns solve(problem) -> (poses [W,4,4], landmarks [L,3], cost0, cost1).
    The landmark axis of the problem must be divisible by the mesh size.
    """

    def shard_body(poses, landmarks, lm_valid, obs_uv, obs_valid):
        """Runs per-device on a landmark shard; poses replicated."""
        W = poses.shape[0]

        def lm_cost_rows(poses_q, lms_q):
            """Per-landmark robust costs [Ls] (+ their local sum)."""
            r_q, _, _, w_q, _ = _shard_terms(
                poses_q, lms_q, lm_valid, obs_uv, obs_valid,
                cam, huber_delta)
            chi2q = jnp.sum(r_q * r_q, axis=-1)
            nq = jnp.sqrt(jnp.maximum(chi2q, 1e-12))
            hc = jnp.where(nq <= huber_delta, 0.5 * chi2q,
                           huber_delta * (nq - 0.5 * huber_delta))
            return jnp.sum(jnp.where(w_q > 0, hc, 0.0), axis=1)

        def gn_iter(_, state):
            poses_i, lms_i = state
            r, Jp, Jl, w, cost_prev_local = _shard_terms(
                poses_i, lms_i, lm_valid, obs_uv, obs_valid, cam, huber_delta)
            JpW = Jp * w[..., None, None]
            # local partials of the reduced system
            Hpp = jnp.einsum("lwia,lwib->wab", Jp, JpW,
                             preferred_element_type=jnp.float32)
            bp = -jnp.einsum("lwik,lwi->wk", JpW, r,
                             preferred_element_type=jnp.float32)
            Hll = jnp.einsum("lwik,lwim->lkm", Jl, Jl * w[..., None, None],
                             preferred_element_type=jnp.float32)  # [Ls, 3, 3]
            bl = -jnp.einsum("lwik,lwi->lk", Jl * w[..., None, None], r,
                             preferred_element_type=jnp.float32)
            Wpl = jnp.einsum("lwik,lwim->lwkm", JpW, Jl,
                             preferred_element_type=jnp.float32)  # [Ls,W,6,3]

            Hll_inv = jnp.linalg.inv(
                Hll + damping * jnp.eye(3, dtype=Hll.dtype))
            S_off = jnp.einsum("lwik,lkm,lvjm->wivj", Wpl, Hll_inv, Wpl,
                               preferred_element_type=jnp.float32)
            eyeW = jnp.eye(W, dtype=r.dtype)
            S_part = jnp.einsum("wv,wkl->wkvl", eyeW, Hpp) - S_off
            b_part = bp - jnp.einsum("lwik,lkm,lm->wi", Wpl, Hll_inv, bl,
                                     preferred_element_type=jnp.float32)

            # ---- THE collective: exact global reduced system over ICI ----
            S = jax.lax.psum(S_part, axis)
            b = jax.lax.psum(b_part, axis)

            # gauge + damping, replicated dense solve
            pin = jnp.zeros((W,), S.dtype).at[0].set(1e8)
            S = S + jnp.einsum("w,kl,wv->wkvl", pin,
                               jnp.eye(6, dtype=S.dtype),
                               jnp.eye(W, dtype=S.dtype))
            S = S + damping * jnp.einsum(
                "wv,kl->wkvl", jnp.eye(W, dtype=S.dtype),
                jnp.eye(6, dtype=S.dtype))
            dxp = jnp.linalg.solve(
                S.reshape(W * 6, W * 6), b.reshape(-1)).reshape(W, 6)
            ok = jnp.all(jnp.isfinite(dxp))
            dxp = jnp.where(ok, dxp, 0.0)
            dxp = dxp.at[0].set(0.0)

            # local landmark back-substitution
            rhs = bl - jnp.einsum("lwik,wi->lk", Wpl, dxp,
                                  preferred_element_type=jnp.float32)
            dxl = jnp.einsum("lkm,lm->lk", Hll_inv, rhs,
                             preferred_element_type=jnp.float32)
            dxl = jnp.where(ok & lm_valid[:, None], dxl, 0.0)
            dxl = jnp.clip(dxl, -5.0, 5.0)

            new_poses = lie.se3_exp(dxp) @ poses_i
            cand_lms = lms_i + dxl

            # per-landmark acceptance (local; landmark-major layout makes
            # the per-landmark cost a plain sum over the W axis): weakly-
            # observed landmarks must not poison the whole step. The two
            # evaluations also yield the exact mixed-configuration cost
            # (per-landmark costs partition the total).
            lmA = lm_cost_rows(new_poses, cand_lms)
            lmB = lm_cost_rows(new_poses, lms_i)
            better = lmA <= lmB
            new_lms = jnp.where(better[:, None], cand_lms, lms_i)
            mixed_cost = jax.lax.psum(jnp.sum(jnp.minimum(lmA, lmB)), axis)

            # accept-if-better on the GLOBAL cost for the pose step
            # (cost_prev came free with the linearization)
            cost_prev = jax.lax.psum(cost_prev_local, axis)
            accept = mixed_cost < cost_prev
            poses_i = jnp.where(accept, new_poses, poses_i)
            lms_i = jnp.where(accept, new_lms, lms_i)
            return poses_i, lms_i

        *_, cost0 = _shard_terms(poses, landmarks, lm_valid, obs_uv,
                                 obs_valid, cam, huber_delta)
        cost0 = jax.lax.psum(cost0, axis)
        poses, landmarks = jax.lax.fori_loop(
            0, iters, gn_iter, (poses, landmarks))
        *_, cost1 = _shard_terms(poses, landmarks, lm_valid, obs_uv,
                                 obs_valid, cam, huber_delta)
        cost1 = jax.lax.psum(cost1, axis)
        return poses, landmarks, cost0, cost1

    mapped = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(), P(axis), P(), P()),
    )

    @jax.jit
    def solve(prob: DistBAProblem):
        # full f32 matmul precision: GN normal equations cancel heavily and
        # the MXU's bf16 input rounding stalls convergence
        with jax.default_matmul_precision("float32"):
            return mapped(prob.poses, prob.landmarks, prob.lm_valid,
                          prob.obs_uv, prob.obs_valid)

    return solve
