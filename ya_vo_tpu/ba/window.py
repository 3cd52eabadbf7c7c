"""Sliding-window bundle adjustment: Gauss-Newton with Schur-complement
landmark marginalization, fully batched.

The reference never finished BA: `Optimizer::partialBA` builds a g2o
optimizer but the edge-adding and optimize calls are commented out
(reference: src/Optimizer.cc:17-71; README.md:7 lists "Add online full BA"
as a to-do). This module implements it the TPU way:

  * observations live in fixed-shape arrays [W, O] (W keyframes x O obs
    slots, landmark links as int32 indices);
  * per-observation 2x6 pose Jacobians and 2x3 landmark Jacobians are one
    batched einsum;
  * landmark blocks Hll (3x3), cross blocks Wpl (6x3) and landmark
    gradients are `segment_sum`s over the landmark index;
  * the reduced camera system S = Hpp - W Hll^-1 W^T is assembled as one
    einsum over the landmark axis and solved dense ([6W, 6W]; W <= ~16);
  * landmark updates by back-substitution dx_l = Hll^-1 (b_l - W^T dx_p).

Gauge: the first pose is frozen (its 6x6 block is pinned to identity and
its update zeroed); Levenberg damping handles the residual monocular scale
freedom. All contractions pin float32 accumulation for the TPU MXU.

The distributed variant (landmark shards x psum over the reduced system)
lives in ya_vo_tpu.parallel.dist_ba and reuses `_build_terms` /
`_reduced_system` below.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ya_vo_tpu.core import lie
from ya_vo_tpu.core.camera import Camera


def select_window_landmarks(lm_p, ok_p, alive, cap: int):
    """Choose which of a window's landmarks enter a capacity-`cap` solve.

    Selection is by WINDOW observation count, descending (ties: lower slot
    id — the older, longer-lived landmark) — the landmarks with the most
    constraints in THIS problem, i.e. the best-conditioned ones, survive.
    Round-4 verdict weak #3: the previous `used[:cap]` slice kept slot
    order (effectively oldest-first with free-list recycling noise), so an
    over-full window could evict its best-constrained landmarks while
    keeping single-observation ones.

    lm_p : [W, O] int32 landmark ids (-1 = none)
    ok_p : [W, O] bool observation validity
    alive: [max_landmarks] bool
    Returns (used_ids ascending, n_dropped_landmarks, n_dropped_obs).
    """
    import numpy as np

    ids, counts = np.unique(lm_p[ok_p & (lm_p >= 0)], return_counts=True)
    keep = alive[ids]
    ids, counts = ids[keep], counts[keep]
    if len(ids) <= cap:
        return ids, 0, 0
    order = np.argsort(-counts, kind="stable")  # stable => low id on ties
    kept = order[:cap]
    n_dropped = len(ids) - cap
    n_dropped_obs = int(counts[order[cap:]].sum())
    return np.sort(ids[kept]), n_dropped, n_dropped_obs


class BAProblem(NamedTuple):
    poses: jnp.ndarray      # [W, 4, 4] world->camera
    pose_valid: jnp.ndarray # [W] bool
    landmarks: jnp.ndarray  # [L, 3]
    lm_valid: jnp.ndarray   # [L] bool
    obs_uv: jnp.ndarray     # [W, O, 2]
    obs_lm: jnp.ndarray     # [W, O] int32 (-1 = none)
    obs_valid: jnp.ndarray  # [W, O] bool


class BAResult(NamedTuple):
    poses: jnp.ndarray
    landmarks: jnp.ndarray
    cost_initial: jnp.ndarray
    cost_final: jnp.ndarray
    n_obs: jnp.ndarray


def _obs_terms(poses, landmarks, prob: BAProblem, cam: Camera,
               huber_delta: float):
    """Per-observation residuals, Jacobians and robust weights.

    Returns r [W,O,2], Jp [W,O,2,6], Jl [W,O,2,3], w [W,O], cost []."""
    lm_idx = jnp.maximum(prob.obs_lm, 0)
    X = landmarks[lm_idx]                        # [W, O, 3]
    R = poses[:, None, :3, :3]                   # [W, 1, 3, 3]
    t = poses[:, None, :3, 3]
    pc = jnp.einsum("woij,woj->woi", jnp.broadcast_to(R, X.shape[:2] + (3, 3)),
                    X) + t                       # [W, O, 3]
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    valid = (
        prob.obs_valid & (prob.obs_lm >= 0)
        & prob.pose_valid[:, None]
        & prob.lm_valid[lm_idx] & (z > 1e-2)
    )
    # exclude landmarks with < 2 usable observations (position unconstrained
    # along its single ray; damped-singular Hll^-1 corrupts the Schur system)
    L = prob.landmarks.shape[0]
    seg = jnp.where(prob.obs_lm.reshape(-1) >= 0,
                    prob.obs_lm.reshape(-1), L)
    n_obs_per_lm = jax.ops.segment_sum(
        valid.reshape(-1).astype(jnp.int32), seg, num_segments=L + 1)[:L]
    valid = valid & (n_obs_per_lm[lm_idx] >= 2)
    z_safe = jnp.where(z < 1e-2, 1e-2, z)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u = cam.fx * x * inv_z + cam.cx
    v = cam.fy * y * inv_z + cam.cy
    r = jnp.stack([u, v], axis=-1) - prob.obs_uv  # [W, O, 2]

    zeros = jnp.zeros_like(x)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zeros, -cam.fx * x * inv_z2], axis=-1),
            jnp.stack([zeros, cam.fy * inv_z, -cam.fy * y * inv_z2], axis=-1),
        ],
        axis=-2,
    )  # [W, O, 2, 3]
    # pose Jacobian (left-multiplicative tangent [v, w]): d pc = [I | -hat(pc)]
    Jp_point = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape + (3,)),
            -lie.hat(pc),
        ],
        axis=-1,
    )  # [W, O, 3, 6]
    Jp = jnp.einsum("woij,wojk->woik", J_proj, Jp_point,
                    preferred_element_type=jnp.float32)       # [W, O, 2, 6]
    # landmark Jacobian: d pc / d X = R
    Jl = jnp.einsum("woij,wjk->woik", J_proj, poses[:, :3, :3],
                    preferred_element_type=jnp.float32)       # [W, O, 2, 3]

    chi2 = jnp.sum(r * r, axis=-1)
    nrm = jnp.sqrt(jnp.maximum(chi2, 1e-12))
    w_huber = jnp.minimum(1.0, huber_delta / nrm)
    w = w_huber * valid.astype(r.dtype)

    huber_cost = jnp.where(
        nrm <= huber_delta, 0.5 * chi2,
        huber_delta * (nrm - 0.5 * huber_delta))
    cost = jnp.sum(jnp.where(valid, huber_cost, 0.0))
    return r, Jp, Jl, w, cost, valid


def _reduced_system(r, Jp, Jl, w, obs_lm, n_landmarks: int, damping):
    """Build the Schur-reduced camera system.

    Returns S [W,6,W,6], b_red [W,6], and the landmark-side pieces
    (Hll_inv [L,3,3], bl [L,3], Wpl [L,W,6,3]) for back-substitution."""
    W, O = r.shape[:2]
    L = n_landmarks

    JpW = Jp * w[..., None, None]
    # pose diagonal blocks and gradient
    Hpp = jnp.einsum("woik,woil->wkl", Jp, JpW,
                     preferred_element_type=jnp.float32)      # [W, 6, 6]
    bp = -jnp.einsum("woik,woi->wk", JpW, r,
                     preferred_element_type=jnp.float32)      # [W, 6]

    # per-observation landmark-side blocks
    Hll_obs = jnp.einsum("woik,woil->wokl", Jl, Jl * w[..., None, None],
                         preferred_element_type=jnp.float32)  # [W, O, 3, 3]
    bl_obs = -jnp.einsum("woik,woi->wok", Jl * w[..., None, None], r,
                         preferred_element_type=jnp.float32)  # [W, O, 3]
    G_obs = jnp.einsum("woik,woil->wokl", JpW, Jl,
                       preferred_element_type=jnp.float32)    # [W, O, 6, 3]

    flat_lm = obs_lm.reshape(-1)                              # [W*O]
    seg = jnp.where(flat_lm >= 0, flat_lm, L)                 # dump invalid
    Hll = jax.ops.segment_sum(
        Hll_obs.reshape(-1, 9), seg, num_segments=L + 1)[:L].reshape(L, 3, 3)
    bl = jax.ops.segment_sum(
        bl_obs.reshape(-1, 3), seg, num_segments=L + 1)[:L]
    # cross blocks per (landmark, pose): segment id = lm * W + w
    w_ids = jnp.broadcast_to(jnp.arange(W)[:, None], (W, O)).reshape(-1)
    seg_lw = jnp.where(flat_lm >= 0, flat_lm * W + w_ids, L * W)
    Wpl = jax.ops.segment_sum(
        G_obs.reshape(-1, 18), seg_lw, num_segments=L * W + 1
    )[: L * W].reshape(L, W, 6, 3)

    Hll_d = Hll + damping * jnp.eye(3, dtype=Hll.dtype)
    Hll_inv = jnp.linalg.inv(Hll_d)

    # S = blockdiag(Hpp) - sum_l Wpl[l] Hll_inv[l] Wpl[l]^T
    S_off = jnp.einsum("lwik,lkm,lvjm->wivj", Wpl, Hll_inv, Wpl,
                       preferred_element_type=jnp.float32)    # [W,6,W,6]
    eyeW = jnp.eye(W, dtype=r.dtype)
    S = jnp.einsum("wv,wkl->wkvl", eyeW, Hpp) - S_off
    b_red = bp - jnp.einsum("lwik,lkm,lm->wi", Wpl, Hll_inv, bl,
                            preferred_element_type=jnp.float32)
    return S, b_red, Hll_inv, bl, Wpl


def _gauge_fix(S, b_red, n_fixed: int = 1, pose_weight: float = 1e8):
    """Pin the first `n_fixed` poses by adding a huge diagonal to their
    blocks. One pinned pose fixes the SE(3) gauge; a second also pins the
    monocular SCALE gauge (otherwise window-to-window scale wanders under
    observation noise and the trajectory accumulates scale drift)."""
    W = S.shape[0]
    pin = jnp.zeros((W,), S.dtype)
    for i in range(n_fixed):
        pin = pin.at[i].set(pose_weight)
    eye6 = jnp.eye(6, dtype=S.dtype)
    S = S + jnp.einsum("w,kl,wv->wkvl", pin, eye6, jnp.eye(W, dtype=S.dtype))
    return S, b_red


@functools.partial(jax.jit, static_argnames=("iters", "n_fixed_poses",
                                              "rel_tol",
                                              "pose_prior_weight"))
def solve_window(
    prob: BAProblem,
    cam: Camera,
    *,
    iters: int = 8,
    huber_delta: float = 2.4477,
    damping: float = 1e-4,
    n_fixed_poses: int = 1,
    rel_tol: float = 1e-3,
    pose_prior_weight: float = 0.0,
) -> BAResult:
    """Run up to `iters` damped GN steps on the window problem.

    Early-exits (lax.while_loop) once the relative cost decrease of an
    iteration falls below `rel_tol`: a well-tracked window is usually
    near-converged already, and each GN iteration costs ~6 ms on a v5e —
    paying 8 of them to confirm convergence tripled the per-keyframe BA
    cost for nothing.

    `pose_prior_weight` is a TRUST REGION anchoring every pose to its
    INPUT value: a quadratic prior w/2 * ||log(T T_init^-1)||^2 added to
    the reduced camera system. Forward-motion monocular windows have a
    near-null scale mode (stretching the pose chain along the travel axis
    barely changes robust reprojection cost when observation arcs are
    short); unconstrained GN ratchets along it — measured on the round-3
    textured longrun as repeated ~1-unit translation "corrections" with
    ~0 rotation that eventually collapsed the tracker's inlier count.
    The prior is negligible against real reprojection gradients (a pose
    with 150 observations has diag(Hpp) ~ 2e5 px^2/unit^2; w = 100 only
    matters in directions the data leaves free). 0 disables."""
    with jax.default_matmul_precision("float32"):
        return _solve_window(prob, cam, iters=iters, huber_delta=huber_delta,
                             damping=damping, n_fixed_poses=n_fixed_poses,
                             rel_tol=rel_tol,
                             pose_prior_weight=pose_prior_weight)


def _solve_window(prob, cam, *, iters, huber_delta, damping, n_fixed_poses,
                  rel_tol, pose_prior_weight) -> BAResult:
    # full f32 matmul precision (set by the wrapper): normal equations and
    # Schur complements cancel heavily; bf16 input rounding stalls GN
    L = prob.landmarks.shape[0]
    W = prob.poses.shape[0]

    def cost_of(poses, landmarks):
        *_, cost, valid = _obs_terms(poses, landmarks, prob, cam, huber_delta)
        return cost, valid

    def lm_cost_eval(poses, landmarks):
        """Per-landmark robust cost [L] + total (every obs belongs to
        exactly one landmark, so the per-landmark costs sum to the total)."""
        r_q, _, _, _, cost_q, valid_q = _obs_terms(
            poses, landmarks, prob, cam, huber_delta)
        chi2q = jnp.sum(r_q * r_q, axis=-1)
        nq = jnp.sqrt(jnp.maximum(chi2q, 1e-12))
        hc = jnp.where(nq <= huber_delta, 0.5 * chi2q,
                       huber_delta * (nq - 0.5 * huber_delta))
        hc = jnp.where(valid_q, hc, 0.0)
        seg = jnp.where(prob.obs_lm.reshape(-1) >= 0,
                        prob.obs_lm.reshape(-1), L)
        per_lm = jax.ops.segment_sum(hc.reshape(-1), seg,
                                     num_segments=L + 1)[:L]
        return per_lm, cost_q

    cost0, valid0 = cost_of(prob.poses, prob.landmarks)
    n_obs = jnp.sum(valid0)

    init_inv = jnp.linalg.inv(prob.poses)        # [W, 4, 4]

    def prior_dev(poses):
        """Tangent deviation of each pose from its input [W, 6]."""
        return jax.vmap(lie.se3_log)(poses @ init_inv)

    def prior_cost(poses):
        if pose_prior_weight <= 0:
            return jnp.float32(0.0)
        d = prior_dev(poses)
        return 0.5 * pose_prior_weight * jnp.sum(d * d)

    def body(state):
        poses, landmarks, it, _ = state
        r, Jp, Jl, w, cost_prev, _ = _obs_terms(poses, landmarks, prob, cam,
                                                huber_delta)
        S, b_red, Hll_inv, bl, Wpl = _reduced_system(
            r, Jp, Jl, w, prob.obs_lm, L, damping)
        S, b_red = _gauge_fix(S, b_red, n_fixed=n_fixed_poses)
        S = S + damping * jnp.einsum(
            "wv,kl->wkvl", jnp.eye(W, dtype=S.dtype), jnp.eye(6, dtype=S.dtype))
        if pose_prior_weight > 0:
            # trust region (see solve_window docstring): w/2 ||dev + dx||^2
            # contributes w I to the diagonal and -w dev to the gradient
            dev = prior_dev(poses)
            S = S + pose_prior_weight * jnp.einsum(
                "wv,kl->wkvl", jnp.eye(W, dtype=S.dtype),
                jnp.eye(6, dtype=S.dtype))
            b_red = b_red - pose_prior_weight * dev
            cost_prev = cost_prev + prior_cost(poses)

        Sm = S.reshape(W * 6, W * 6)
        dxp = jnp.linalg.solve(Sm, b_red.reshape(-1)).reshape(W, 6)
        ok = jnp.all(jnp.isfinite(dxp))
        dxp = jnp.where(ok, dxp, 0.0)
        for i in range(n_fixed_poses):  # hard gauge
            dxp = dxp.at[i].set(0.0)

        # landmark back-substitution
        rhs = bl - jnp.einsum("lwik,wi->lk", Wpl, dxp,
                              preferred_element_type=jnp.float32)
        dxl = jnp.einsum("lkm,lm->lk", Hll_inv, rhs,
                         preferred_element_type=jnp.float32)
        dxl = jnp.where(ok & prob.lm_valid[:, None], dxl, 0.0)
        # step clamp for stray landmarks
        dxl = jnp.clip(dxl, -5.0, 5.0)

        new_poses = lie.se3_exp(dxp) @ poses
        cand_landmarks = landmarks + dxl

        # per-landmark acceptance: a weakly-observed landmark (e.g. one
        # observation -> rank-deficient Hll) must not poison the whole step.
        # Two evaluations give both the per-landmark choice AND (since
        # per-landmark costs partition the total) the exact cost of the
        # mixed configuration — no third evaluation needed.
        lmA, _ = lm_cost_eval(new_poses, cand_landmarks)
        lmB, _ = lm_cost_eval(new_poses, landmarks)
        better = lmA <= lmB
        new_landmarks = jnp.where(better[:, None], cand_landmarks, landmarks)
        mixed_cost = jnp.sum(jnp.minimum(lmA, lmB)) + prior_cost(new_poses)

        # global acceptance for the pose step (cost_prev came free with the
        # GN linearization above)
        accept = mixed_cost < cost_prev
        poses = jnp.where(accept, new_poses, poses)
        landmarks = jnp.where(accept, new_landmarks, landmarks)
        improvement = jnp.where(
            accept, (cost_prev - mixed_cost) / jnp.maximum(cost_prev, 1e-12),
            0.0)
        return poses, landmarks, it + 1, improvement

    def cond(state):
        _, _, it, improvement = state
        return (it < iters) & ((it == 0) | (improvement > rel_tol))

    poses, landmarks, _, _ = jax.lax.while_loop(
        cond, body,
        (prob.poses, prob.landmarks, jnp.int32(0), jnp.float32(1.0)))
    cost1, _ = cost_of(poses, landmarks)
    return BAResult(
        poses=poses, landmarks=landmarks,
        cost_initial=cost0, cost_final=cost1, n_obs=n_obs,
    )
