"""BAL-format bundle-adjustment problem IO.

Parity for the reference's PBA file bridge (reference:
`Converter::toPbaDataMatrix/printPbaMatrixToFile/dataFromPbaFile`
src/Converter.cc + include/Converter.h:57-60, consumed by the GBA dump at
src/Optimizer.cc:55-73 and by PBA's own loader
Thirdparty/pba/src/pba/util.h): header `<ncam> <npt> <nproj>`, then
observation rows `<cam> <pt> <x> <y>`, camera rows (focal, Rodrigues
rotation, translation — the reference writes f, R (Rodrigues), t), and
xyz point rows. The reference used this to A/B its CUDA BA against g2o
(SURVEY.md §4); here it serves the same role: offline BA benchmarking
fixtures interchangeable with standard BAL tooling.
"""

from __future__ import annotations

import numpy as np


def save_bal(problem, path: str, focal: float):
    """Write a solvers.bundle_adjust.BAProblem (mono observations) to a
    BAL text file. Projections use the BAL convention of the reference's
    dump (`p = -P/P.z * f`, Converter.cc toPbaDataMatrix): observations
    are written centered (caller passes principal-point-subtracted uv if
    desired — here raw uv is written unchanged, matching the reference's
    `printPbaMatrixToFile` which writes measurement coordinates as-is)."""
    import jax.numpy as jnp

    from ..geometry import se3

    obs_valid = np.asarray(problem.obs_valid)
    oc = np.asarray(problem.obs_cam)[obs_valid]
    op = np.asarray(problem.obs_pt)[obs_valid]
    uv = np.asarray(problem.obs_uv)[obs_valid]
    cams = np.asarray(problem.cam_pose)
    pts = np.asarray(problem.xyz)
    pt_valid = np.asarray(problem.pt_valid)

    n_cam = cams.shape[0]
    n_pt = pts.shape[0]
    with open(path, "w") as f:
        f.write(f"{n_cam} {n_pt} {len(oc)}\n")
        for c, p, (x, y) in zip(oc, op, uv):
            f.write(f"{c} {p} {x:.6f} {y:.6f}\n")
        for c in range(n_cam):
            R = cams[c, :3, :3]
            t = cams[c, :3, 3]
            rod = np.asarray(se3.so3_log(jnp.asarray(R[None].astype(np.float32))))[0]
            f.write(
                f"{rod[0]:.9f} {rod[1]:.9f} {rod[2]:.9f} "
                f"{t[0]:.9f} {t[1]:.9f} {t[2]:.9f} {focal:.6f} 0 0\n"
            )
        for p in range(n_pt):
            x, y, z = pts[p] if pt_valid[p] else (0.0, 0.0, 0.0)
            f.write(f"{x:.9f} {y:.9f} {z:.9f}\n")
    return path


def load_bal(path: str):
    """Read a BAL file -> BAProblem (+ focal). Accepts both this module's
    output and standard BAL datasets (9-param camera rows: angle-axis,
    t, f, k1, k2 — distortion ignored)."""
    import jax.numpy as jnp

    from ..geometry import se3
    from ..solvers import bundle_adjust as ba

    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    n_cam, n_pt, n_obs = int(next(it)), int(next(it)), int(next(it))
    oc = np.zeros(n_obs, np.int32)
    op = np.zeros(n_obs, np.int32)
    uv = np.zeros((n_obs, 2), np.float32)
    for i in range(n_obs):
        oc[i] = int(next(it))
        op[i] = int(next(it))
        uv[i, 0] = float(next(it))
        uv[i, 1] = float(next(it))
    cams = np.zeros((n_cam, 4, 4), np.float32)
    focal = 1.0
    for c in range(n_cam):
        rod = np.array([float(next(it)) for _ in range(3)], np.float32)
        t = np.array([float(next(it)) for _ in range(3)], np.float32)
        focal = float(next(it))
        _k1, _k2 = float(next(it)), float(next(it))
        R = np.asarray(se3.so3_exp(jnp.asarray(rod[None])))[0]
        cams[c] = np.eye(4)
        cams[c, :3, :3] = R
        cams[c, :3, 3] = t
    pts = np.zeros((n_pt, 3), np.float32)
    for p in range(n_pt):
        pts[p] = [float(next(it)) for _ in range(3)]

    problem = ba.BAProblem(
        cam_pose=jnp.asarray(cams),
        cam_fixed=jnp.asarray(np.arange(n_cam) == 0),
        xyz=jnp.asarray(pts),
        pt_valid=jnp.ones((n_pt,), bool),
        obs_cam=jnp.asarray(oc),
        obs_pt=jnp.asarray(op),
        obs_uv=jnp.asarray(uv),
        obs_ur=jnp.full((n_obs,), -1.0, jnp.float32),
        obs_inv_sigma2=jnp.ones((n_obs,), jnp.float32),
        obs_valid=jnp.ones((n_obs,), bool),
    )
    return problem, focal
