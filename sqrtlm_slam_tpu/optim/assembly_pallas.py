"""Pallas TPU kernel for the bucketed-BA assembly front half.

Replaces the XLA-level edge-term + reduction chain of
`schur_bucketed.pieces_from_terms` (stereo reprojection residuals/Jacobians,
Huber weighting, the landmark-local K-axis reductions Hll/bl/U and the
pose-block reductions Hpp/bp) with ONE kernel pass.

Why a kernel: the XLA formulation operates on (L, K, 3, 6)-shaped arrays
whose trailing dims of 3/6 pad to 128-lane vregs — the "lane-padding tax"
measured in PERF.md (edge terms + reductions ~1.7 ms/iter at the bench shape
vs ~0.1 ms of theoretical HBM traffic). Here the landmark axis lives on
lanes: every per-slot quantity is a (K, 128) vreg row set at full lane
occupancy, the K-axis reductions are register sums, and the pose-block
reduction rides the MXU as a one-hot (P,128)x(128,42) contraction per slot
(idea measured in benchmarks/breakdown2.py: one-hot matmul beats TPU
scatter ~30x for these shapes).

Semantics mirror exactly:
  * stereo/mono residual rows (factors/reprojection.py::stereo_residual_jac;
    the reference's g2o EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ used in
    /root/reference/src/backend/g2oOptimizer.cc:704-1191),
  * Huber IRLS weights on the info-weighted squared error (optim/loss.py,
    reference loss_function.h:38-56),
  * free-pose masking of Jp (fixed-frontier keyframes, g2oOptimizer.cc:760).

The reductions feed schur_bucketed's sqrt-Schur step unchanged.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ZEPS = 1e-6
LANES = 128


class AssemblyOut(NamedTuple):
    Hll: jnp.ndarray  # (L, 3, 3)
    bl: jnp.ndarray  # (L, 3)
    U: jnp.ndarray  # (L, K, 6, 3)
    Hpp: jnp.ndarray  # (P, 6, 6)
    bp: jnp.ndarray  # (P, 6)
    chi2: jnp.ndarray  # ()


class PreparedObs(NamedTuple):
    """Observation-side kernel inputs in landmark-on-lanes layout.

    These are constant across an entire LM loop (the observation graph,
    weights, stereo flags, free-pose mask and camera assignment do not change
    between iterations) — preparing them ONCE outside the scan and closing
    over them keeps their transposes/gathers out of the per-iteration cost
    (measured 0.2+ ms/iter at the bench shape, benchmarks/breakdown10.py)."""

    uvr_t: jnp.ndarray  # (3, K, L)
    w_t: jnp.ndarray  # (K, L) inv_sigma2 * active
    st_t: jnp.ndarray  # (K, L) stereo row mask
    fr_t: jnp.ndarray  # (K, L) free-pose mask
    cam_t: jnp.ndarray  # (K, L) int32 pose index


def prepare(obs_uvr, w_active, pose_free, obs_cam) -> PreparedObs:
    """Transpose the loop-constant observation arrays once."""
    L, K = obs_cam.shape
    f32 = jnp.float32
    return PreparedObs(
        uvr_t=obs_uvr.transpose(2, 1, 0).astype(f32),
        w_t=w_active.T.astype(f32),
        st_t=(obs_uvr[..., 2] >= 0.0).T.astype(f32),
        fr_t=jnp.broadcast_to(pose_free[obs_cam].T.astype(f32), (K, L)),
        cam_t=obs_cam.T.astype(jnp.int32),
    )


def _pose_flat(pose_R, pose_t, P_pad):
    """Pack poses as (12, P_pad): rows 0-8 = R[i,j] (row-major), 9-11 = t.

    The kernel gathers per-slot pose rows on the MXU (one-hot contraction
    over the pose axis) instead of the XLA-side (L, K, 12) gather+transpose
    that used to feed it — the gathered tensor never touches HBM."""
    P = pose_R.shape[0]
    flat = jnp.concatenate(
        [pose_R.reshape(P, 9), pose_t], axis=1
    ).T.astype(jnp.float32)  # (12, P)
    return jnp.pad(flat, ((0, 0), (0, P_pad - P)))


def _gather_poses(pose_ref, cam, K, P_pad, T):
    """In-kernel pose gather: per slot k, (12, T) = pose (12, P_pad) @ onehot.

    Returns (Rg, tg) stacked as (9, K, T) / (3, K, T) to feed the shared
    elementwise pipeline."""
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P_pad, T), 0)
    g = []
    for k in range(K):
        onehot = (iota_p == cam[k][None, :]).astype(jnp.float32)  # (P_pad, T)
        g.append(
            jax.lax.dot_general(
                pose_ref[:],
                onehot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST = full-f32 MXU passes. DEFAULT truncates the f32
                # inputs to bf16, which would round the gathered poses
                # (selection by a 0/1 matrix must be exact). The (12, P_pad)
                # x (P_pad, T) contraction is tiny either way.
                precision=jax.lax.Precision.HIGHEST,
            )
        )  # (12, T)
    Rg = jnp.stack(
        [jnp.stack([g[k][r] for k in range(K)], axis=0) for r in range(9)], axis=0
    )
    tg = jnp.stack(
        [jnp.stack([g[k][9 + i] for k in range(K)], axis=0) for i in range(3)],
        axis=0,
    )
    return Rg, tg


def _kernel(
    pose_ref,  # (12, P_pad) packed poses (see _pose_flat)
    x_ref,  # (3, T) landmark position
    uvr_ref,  # (3, K, T) observations
    w_ref,  # (K, T) inv_sigma2 * active
    st_ref,  # (K, T) stereo row mask (1.0 stereo / 0.0 mono)
    fr_ref,  # (K, T) free-pose mask
    cam_ref,  # (K, T) int32 pose index
    hll_ref,  # out (9, T)
    bl_ref,  # out (3, T)
    u_ref,  # out (18, K, T)
    hpp_ref,  # out (P_pad, 48) accumulated: [:,:36]=Hpp rows, [:,36:42]=bp
    chi_ref,  # out (1, T) accumulated
    *,
    K: int,
    P_pad: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        hpp_ref[:] = jnp.zeros_like(hpp_ref)
        chi_ref[:] = jnp.zeros_like(chi_ref)

    cam = cam_ref[:]
    T = cam.shape[-1]
    Rg, tg = _gather_poses(pose_ref, cam, K, P_pad, T)
    X = x_ref[:][:, None, :]  # (3, 1, T) broadcasts over K
    uvr = uvr_ref[:]
    w_info = w_ref[:]  # (K, T)
    st = st_ref[:]
    fr = fr_ref[:]

    # Camera-frame point x_c = R X + t, per component (K, T).
    xc = [
        Rg[3 * i_ + 0] * X[0] + Rg[3 * i_ + 1] * X[1] + Rg[3 * i_ + 2] * X[2] + tg[i_]
        for i_ in range(3)
    ]
    z = jnp.maximum(xc[2], _ZEPS)
    iz = 1.0 / z
    iz2 = iz * iz

    u = fx * xc[0] * iz + cx
    v = fy * xc[1] * iz + cy
    ur = u - bf * iz
    r = [u - uvr[0], v - uvr[1], (ur - uvr[2]) * st]

    # dproj rows; stereo row masked by st (masks r2/Jp2/Jl2 in one place).
    zero = jnp.zeros_like(u)
    d = [
        [fx * iz, zero, -fx * xc[0] * iz2],
        [zero, fy * iz, -fy * xc[1] * iz2],
        [(fx * iz) * st, zero, (-fx * xc[0] * iz2 + bf * iz2) * st],
    ]

    # Jp = dproj @ [I | -hat(x_c)] (raw x_c in the hat, clamp only in iz).
    Jp = [
        [
            d[a][0],
            d[a][1],
            d[a][2],
            -d[a][1] * xc[2] + d[a][2] * xc[1],
            d[a][0] * xc[2] - d[a][2] * xc[0],
            -d[a][0] * xc[1] + d[a][1] * xc[0],
        ]
        for a in range(3)
    ]
    # Jl = dproj @ R.
    Jl = [
        [sum(d[a][m] * Rg[3 * m + j] for m in range(3)) for j in range(3)]
        for a in range(3)
    ]

    e2 = w_info * (r[0] * r[0] + r[1] * r[1] + r[2] * r[2])
    if robust_delta is None:
        w = w_info
        rho = e2
    else:
        delta = robust_delta
        d2 = delta * delta
        sqrt_e2 = jnp.sqrt(jnp.maximum(e2, 1e-12))
        inl = e2 <= d2
        rho = jnp.where(inl, e2, 2.0 * delta * sqrt_e2 - d2)
        w = w_info * jnp.where(inl, 1.0, delta / sqrt_e2)

    chi_ref[:] = chi_ref[:] + jnp.sum(rho, axis=0, keepdims=True)

    # Free-pose masking applies to every Jp-sided product.
    Jp = [[Jp[a][i_] * fr for i_ in range(6)] for a in range(3)]

    # Landmark-local reductions (sum over K = sublane reduction).
    for i_ in range(3):
        bl_ref[i_, :] = jnp.sum(
            sum(Jl[a][i_] * w * r[a] for a in range(3)), axis=0
        )
        for j in range(3):
            hll = sum(Jl[a][i_] * w * Jl[a][j] for a in range(3))
            hll_ref[3 * i_ + j, :] = jnp.sum(hll, axis=0)

    # Per-slot cross blocks U = Jp^T w Jl (kept per slot for back-subst).
    for i_ in range(6):
        for j in range(3):
            u_ref[3 * i_ + j] = sum(Jp[a][i_] * w * Jl[a][j] for a in range(3))

    # Pose-block reduction on the MXU: per slot k, rows = [Hpp(36) | bp(6)]
    # contracted against the one-hot camera assignment over the lane axis.
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (P_pad, LANES), 0)
    cam = cam_ref[:]
    acc = hpp_ref[:]
    for k in range(K):
        rows = []
        for i_ in range(6):
            for j in range(6):
                rows.append(sum(Jp[a][i_][k] * w[k] * Jp[a][j][k] for a in range(3)))
        for i_ in range(6):
            rows.append(sum(Jp[a][i_][k] * w[k] * r[a][k] for a in range(3)))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        rows.append(jnp.zeros_like(rows[0]))
        hb = jnp.stack(rows, axis=0)  # (48, T)
        onehot = (iota_p == cam[k][None, :]).astype(hb.dtype)  # (P_pad, T)
        acc = acc + jax.lax.dot_general(
            onehot,
            hb,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            # HIGHEST: DEFAULT would round the f32 Hpp/bp rows to bf16 on
            # the MXU — measured up to 19% relative error on
            # cancellation-heavy off-diagonal Hpp entries. The onehot side
            # is 0/1 (exact either way).
            precision=jax.lax.Precision.HIGHEST,
        )
    hpp_ref[:] = acc


class AssemblyRows(NamedTuple):
    """Kernel-native rows layout (landmarks on lanes) — no transposes.

    The (L, 3, 3)/(L, K, 6, 3) shapes of AssemblyOut pad their trailing
    3/6 dims to 128 lanes in every downstream elementwise op (a 20-40x
    memory-traffic tax); consumers that keep the whole sqrt-Schur tail in
    rows layout (schur_bucketed._pieces_tail_rows) avoid it entirely."""

    hll9: jnp.ndarray  # (9, L) rows of Hll (row-major 3x3)
    bl3: jnp.ndarray  # (3, L)
    u18: jnp.ndarray  # (18, K, L) rows of U: index 3*i+j = U[i, j]
    Hpp: jnp.ndarray  # (P, 6, 6)
    bp: jnp.ndarray  # (P, 6)
    chi2: jnp.ndarray  # ()


def assemble_prepared_rows(
    pose_R, pose_t, points, prep: PreparedObs, *,
    fx, fy, cx, cy, bf, robust_delta, interpret: bool = False,
) -> AssemblyRows:
    """assemble_prepared without the output transposes (rows layout)."""
    hll, bl, u, hpp, chi = _assemble_raw(
        pose_R, pose_t, points, prep,
        fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
        robust_delta=robust_delta, interpret=interpret,
    )
    P = pose_R.shape[0]
    return AssemblyRows(
        hll9=hll,
        bl3=bl,
        u18=u,
        Hpp=hpp[:P, :36].reshape(P, 6, 6),
        bp=hpp[:P, 36:42],
        chi2=jnp.sum(chi),
    )


def assemble_prepared(
    pose_R,  # (P, 3, 3)
    pose_t,  # (P, 3)
    points,  # (L, 3)
    prep: PreparedObs,
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
    interpret: bool = False,
) -> AssemblyOut:
    """Run the assembly kernel on pre-transposed observation buffers.

    Only the pose/point state crosses HBM per call; the pose gather happens
    inside the kernel on the MXU (see _gather_poses)."""
    P, L = pose_R.shape[0], points.shape[0]
    hll, bl, u, hpp, chi = _assemble_raw(
        pose_R, pose_t, points, prep,
        fx=fx, fy=fy, cx=cx, cy=cy, bf=bf,
        robust_delta=robust_delta, interpret=interpret,
    )
    K = prep.cam_t.shape[0]
    return AssemblyOut(
        Hll=hll.T.reshape(L, 3, 3),
        bl=bl.T,
        U=u.transpose(2, 1, 0).reshape(L, K, 6, 3),
        Hpp=hpp[:P, :36].reshape(P, 6, 6),
        bp=hpp[:P, 36:42],
        chi2=jnp.sum(chi),
    )


def _assemble_raw(
    pose_R, pose_t, points, prep: PreparedObs, *,
    fx, fy, cx, cy, bf, robust_delta, interpret: bool = False,
):
    """Shared pallas_call: returns raw kernel outputs (rows layout)."""
    P, L = pose_R.shape[0], points.shape[0]
    K = prep.cam_t.shape[0]
    assert L % LANES == 0, f"L={L} must be a multiple of {LANES}"
    P_pad = max(128, -(-P // 128) * 128)
    n_tiles = L // LANES
    f32 = jnp.float32

    pose_flat = _pose_flat(pose_R, pose_t, P_pad)  # (12, P_pad)
    x_t = points.T.astype(f32)  # (3, L)

    kern = functools.partial(
        _kernel,
        K=K,
        P_pad=P_pad,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        bf=bf,
        robust_delta=robust_delta,
    )
    tile3 = lambda c: pl.BlockSpec(
        (c, K, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    tile2 = lambda c: pl.BlockSpec(
        (c, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    acc_spec = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    hll, bl, u, hpp, chi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[
            acc_spec((12, P_pad)),
            tile2(3),
            tile3(3),
            tile2(K),
            tile2(K),
            tile2(K),
            tile2(K),
        ],
        out_specs=[
            tile2(9),
            tile2(3),
            tile3(18),
            acc_spec((P_pad, 48)),
            acc_spec((1, LANES)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((9, L), f32),
            jax.ShapeDtypeStruct((3, L), f32),
            jax.ShapeDtypeStruct((18, K, L), f32),
            jax.ShapeDtypeStruct((P_pad, 48), f32),
            jax.ShapeDtypeStruct((1, LANES), f32),
        ],
        interpret=interpret,
    )(pose_flat, x_t, prep.uvr_t, prep.w_t, prep.st_t, prep.fr_t, prep.cam_t)

    return hll, bl, u, hpp, chi


@functools.partial(
    jax.jit,
    static_argnames=("robust_delta", "fx", "fy", "cx", "cy", "bf", "interpret"),
)
def assemble(
    pose_R,  # (P, 3, 3)
    pose_t,  # (P, 3)
    pose_free,  # (P,) bool  (~pose_fixed)
    points,  # (L, 3)
    obs_cam,  # (L, K) int32
    obs_uvr,  # (L, K, 3)
    w_active,  # (L, K)  inv_sigma2 * active
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
    interpret: bool = False,
) -> AssemblyOut:
    """One-shot wrapper: prepare the observation buffers and assemble.

    Inside an LM loop call prepare() once and assemble_prepared() per
    iteration instead, so the constant transposes stay out of the loop."""
    prep = prepare(obs_uvr, w_active, pose_free, obs_cam)
    return assemble_prepared(
        pose_R,
        pose_t,
        points,
        prep,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        bf=bf,
        robust_delta=robust_delta,
        interpret=interpret,
    )


def _chi2_kernel(
    pose_ref,  # (12, P_pad) packed poses
    x_ref,  # (3, T)
    uvr_ref,  # (3, K, T)
    w_ref,  # (K, T)
    st_ref,  # (K, T)
    cam_ref,  # (K, T) int32
    chi_ref,  # out (1, T) accumulated
    *,
    K: int,
    P_pad: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
):
    """Residual-only pass: the robust chi2 sum at the given state (the LM
    candidate evaluation). Same projection/loss semantics as _kernel."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        chi_ref[:] = jnp.zeros_like(chi_ref)

    cam = cam_ref[:]
    T = cam.shape[-1]
    Rg, tg = _gather_poses(pose_ref, cam, K, P_pad, T)
    X = x_ref[:][:, None, :]  # (3, 1, T)
    uvr = uvr_ref[:]
    w_info = w_ref[:]
    st = st_ref[:]

    xc = [
        Rg[3 * i_ + 0] * X[0] + Rg[3 * i_ + 1] * X[1] + Rg[3 * i_ + 2] * X[2] + tg[i_]
        for i_ in range(3)
    ]
    z = jnp.maximum(xc[2], _ZEPS)
    iz = 1.0 / z
    u = fx * xc[0] * iz + cx
    v = fy * xc[1] * iz + cy
    ur = u - bf * iz
    r0 = u - uvr[0]
    r1 = v - uvr[1]
    r2 = (ur - uvr[2]) * st
    e2 = w_info * (r0 * r0 + r1 * r1 + r2 * r2)
    if robust_delta is None:
        rho = e2
    else:
        delta = robust_delta
        d2 = delta * delta
        sqrt_e2 = jnp.sqrt(jnp.maximum(e2, 1e-12))
        rho = jnp.where(e2 <= d2, e2, 2.0 * delta * sqrt_e2 - d2)
    chi_ref[:] = chi_ref[:] + jnp.sum(rho, axis=0, keepdims=True)


def chi2_prepared(
    pose_R,  # (P, 3, 3)
    pose_t,  # (P, 3)
    points,  # (L, 3)
    prep: PreparedObs,
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
    interpret: bool = False,
) -> jnp.ndarray:
    """Robust chi2 via the residual-only kernel on prepared buffers."""
    P, L = pose_R.shape[0], points.shape[0]
    K = prep.cam_t.shape[0]
    assert L % LANES == 0, f"L={L} must be a multiple of {LANES}"
    P_pad = max(128, -(-P // 128) * 128)
    n_tiles = L // LANES
    f32 = jnp.float32

    pose_flat = _pose_flat(pose_R, pose_t, P_pad)
    x_t = points.T.astype(f32)

    kern = functools.partial(
        _chi2_kernel,
        K=K,
        P_pad=P_pad,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        bf=bf,
        robust_delta=robust_delta,
    )
    tile3 = lambda c: pl.BlockSpec(
        (c, K, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
    )
    tile2 = lambda c: pl.BlockSpec(
        (c, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    chi = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[full((12, P_pad)), tile2(3), tile3(3), tile2(K), tile2(K), tile2(K)],
        out_specs=pl.BlockSpec(
            (1, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, LANES), f32),
        interpret=interpret,
    )(pose_flat, x_t, prep.uvr_t, prep.w_t, prep.st_t, prep.cam_t)
    return jnp.sum(chi)


@functools.partial(
    jax.jit,
    static_argnames=("robust_delta", "fx", "fy", "cx", "cy", "bf", "interpret"),
)
def chi2_sum(
    pose_R,  # (P, 3, 3)
    pose_t,  # (P, 3)
    points,  # (L, 3)
    obs_cam,  # (L, K) int32
    obs_uvr,  # (L, K, 3)
    w_active,  # (L, K)
    *,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    bf: float,
    robust_delta,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-shot wrapper: robust chi2 of the bucketed problem."""
    prep = prepare(
        obs_uvr, w_active, jnp.ones(pose_R.shape[0], bool), obs_cam
    )
    return chi2_prepared(
        pose_R,
        pose_t,
        points,
        prep,
        fx=fx,
        fy=fy,
        cx=cx,
        cy=cy,
        bf=bf,
        robust_delta=robust_delta,
        interpret=interpret,
    )
