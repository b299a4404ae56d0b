"""Native pose-graph optimizer — replaces the reference's g2o backend
(include/GraphOptimizer.h:84-286: addVertex/addEdge/optimizeGraph/getPoses/
saveGraph; 6-DoF SE(3), Levenberg-Marquardt, dense solver, 10 iterations,
vertex 0 fixed).

The graphs here are 10^2-10^3 vertices (SURVEY.md §7.6), so dense normal
equations in float64 on the host are exact and instant; a batched jnp path
is unnecessary at this scale. Edge error follows the g2o SE3 convention
e = log(Z^-1 X_i^-1 X_j) with right-perturbation Jacobians approximated at
small error (J_j = I, J_i = -Ad(X_j^-1 X_i)), which is the standard
Gauss-Newton linearization for well-initialized pose graphs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


def _skew(v):
    return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]], np.float64)


def _exp_so3(w):
    th = np.linalg.norm(w)
    W = _skew(w)
    if th < 1e-10:
        return np.eye(3) + W
    return (
        np.eye(3)
        + np.sin(th) / th * W
        + (1 - np.cos(th)) / (th * th) * (W @ W)
    )


def _log_so3(R):
    cos_t = np.clip((np.trace(R) - 1) / 2, -1, 1)
    th = np.arccos(cos_t)
    if th < 1e-10:
        return np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]) / 2
    return th / (2 * np.sin(th)) * np.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )


def _exp_se3(xi):
    v, w = xi[:3], xi[3:]
    T = np.eye(4)
    R = _exp_so3(w)
    th = np.linalg.norm(w)
    W = _skew(w)
    if th < 1e-10:
        V = np.eye(3) + 0.5 * W
    else:
        V = (
            np.eye(3)
            + (1 - np.cos(th)) / th**2 * W
            + (th - np.sin(th)) / th**3 * (W @ W)
        )
    T[:3, :3] = R
    T[:3, 3] = V @ v
    return T


def _log_se3(T):
    w = _log_so3(T[:3, :3])
    th = np.linalg.norm(w)
    W = _skew(w)
    if th < 1e-10:
        Vinv = np.eye(3) - 0.5 * W
    else:
        Vinv = (
            np.eye(3)
            - 0.5 * W
            + (1 / th**2 - (1 + np.cos(th)) / (2 * th * np.sin(th))) * (W @ W)
        )
    return np.concatenate([Vinv @ T[:3, 3], w])


def _adjoint(T):
    R = T[:3, :3]
    t = T[:3, 3]
    A = np.zeros((6, 6))
    A[:3, :3] = R
    A[3:, 3:] = R
    A[:3, 3:] = _skew(t) @ R
    return A


@dataclasses.dataclass
class Edge:
    i: int
    j: int
    z: np.ndarray  # measured relative pose: X_i^-1 X_j
    info: np.ndarray  # 6x6 information


class GraphOptimizer:
    """Same interface family as the reference GraphOptimizer (g2o/MRPT)."""

    def __init__(self, rigidity: int = 6):
        assert rigidity in (3, 6), "3-DoF (SE2) or 6-DoF (SE3)"
        self.rigidity = rigidity
        self.vertices: List[np.ndarray] = []
        self.edges: List[Edge] = []

    # -- construction ----------------------------------------------------------
    def add_vertex(self, pose: np.ndarray) -> int:
        self.vertices.append(np.asarray(pose, np.float64).copy())
        return len(self.vertices) - 1

    def add_edge(self, i: int, j: int, rel_pose: np.ndarray, information: np.ndarray) -> None:
        info = np.asarray(information, np.float64)
        info = 0.5 * (info + info.T)
        # guard: non-PSD or degenerate information falls back to identity
        ev = np.linalg.eigvalsh(info)
        if not np.isfinite(ev).all() or ev[0] < 0 or ev[-1] <= 0:
            info = np.eye(6)
        self.edges.append(Edge(i, j, np.asarray(rel_pose, np.float64).copy(), info))

    # -- optimization ------------------------------------------------------------
    def optimize_graph(self, iterations: int = 10, lam: float = 1e-6) -> float:
        """Levenberg-Marquardt over all vertices, vertex 0 fixed
        (reference GraphOptimizer.h:181-208). Returns the final chi2."""
        n = len(self.vertices)
        if n < 2 or not self.edges:
            return 0.0
        X = [v.copy() for v in self.vertices]

        def chi2(Xs):
            c = 0.0
            for e in self.edges:
                err = _log_se3(np.linalg.inv(e.z) @ np.linalg.inv(Xs[e.i]) @ Xs[e.j])
                c += float(err @ e.info @ err)
            return c

        current = chi2(X)
        for _ in range(iterations):
            H = np.zeros((6 * n, 6 * n))
            b = np.zeros(6 * n)
            for e in self.edges:
                Xi, Xj = X[e.i], X[e.j]
                err = _log_se3(np.linalg.inv(e.z) @ np.linalg.inv(Xi) @ Xj)
                Jj = np.eye(6)
                Ji = -_adjoint(np.linalg.inv(Xj) @ Xi)
                for (a, Ja) in ((e.i, Ji), (e.j, Jj)):
                    for (c_, Jc) in ((e.i, Ji), (e.j, Jj)):
                        H[6 * a : 6 * a + 6, 6 * c_ : 6 * c_ + 6] += Ja.T @ e.info @ Jc
                    b[6 * a : 6 * a + 6] += Ja.T @ e.info @ err
            # fix vertex 0
            H = H[6:, 6:] + lam * np.diag(np.diag(H[6:, 6:]) + 1e-12)
            b = b[6:]
            try:
                delta = np.linalg.solve(H, -b)
            except np.linalg.LinAlgError:
                break
            Xnew = [X[0]] + [
                X[k] @ _exp_se3(delta[6 * (k - 1) : 6 * k]) for k in range(1, n)
            ]
            new = chi2(Xnew)
            if new <= current:
                X = Xnew
                if current - new < 1e-12:
                    current = new
                    break
                current = new
                lam = max(lam / 10, 1e-12)
            else:
                lam *= 10
        self.vertices = X
        return current

    # -- accessors -----------------------------------------------------------------
    def get_poses(self) -> List[np.ndarray]:
        return [v.copy() for v in self.vertices]

    def vertex_count(self) -> int:
        return len(self.vertices)

    def save_graph(self, path: str) -> None:
        """g2o text format (VERTEX_SE3:QUAT / EDGE_SE3:QUAT), matching the
        reference's saveGraph output family (GraphOptimizer.h:273-277)."""
        def quat(R):
            # w,x,y,z from rotation matrix
            tr = np.trace(R)
            if tr > 0:
                s = np.sqrt(tr + 1) * 2
                return np.array(
                    [(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s, s / 4]
                )
            i = int(np.argmax(np.diag(R)))
            j, k = (i + 1) % 3, (i + 2) % 3
            s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1, 1e-12)) * 2
            q = np.zeros(4)
            q[i] = s / 4
            q[j] = (R[j, i] + R[i, j]) / s
            q[k] = (R[k, i] + R[i, k]) / s
            q[3] = (R[k, j] - R[j, k]) / s
            return q

        with open(path, "w") as f:
            for vid, v in enumerate(self.vertices):
                q = quat(v[:3, :3])
                t = v[:3, 3]
                f.write(
                    f"VERTEX_SE3:QUAT {vid} {t[0]} {t[1]} {t[2]} {q[0]} {q[1]} {q[2]} {q[3]}\n"
                )
            for e in self.edges:
                q = quat(e.z[:3, :3])
                t = e.z[:3, 3]
                upper = e.info[np.triu_indices(6)]
                f.write(
                    f"EDGE_SE3:QUAT {e.i} {e.j} {t[0]} {t[1]} {t[2]} "
                    f"{q[0]} {q[1]} {q[2]} {q[3]} " + " ".join(map(str, upper)) + "\n"
                )
