"""Host-side map / keyframe bookkeeping with device-batched math.

Mirrors the reference's state layer (reference: python/src/
templering_sfm.py:476-526 ``Keyframe``/``MapPoint``/``MapState``;
cpp/src/templering_sfm.cpp:766-798). The host keeps cheap index
bookkeeping (dicts / growing lists — this is control flow, not compute);
every numeric batch (triangulation, BA linearization) is handed to the
device as padded fixed-shape arrays.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Keyframe:
    """One keyframe: pose + a snapshot of the track table.

    ``ids/uv/valid`` are the (T,)-shaped tracker snapshot — a track alive
    in two keyframes occupies the same slot in both, so correspondence
    between keyframes is a slot-aligned mask (no matching pass needed).
    """

    kf_id: int
    frame_idx: int
    img_name: str
    R_cw: np.ndarray  # (3,3)
    t_cw: np.ndarray  # (3,)
    ids: np.ndarray  # (T,) i32
    uv: np.ndarray  # (T,2) f32
    valid: np.ndarray  # (T,) bool
    desc: np.ndarray | None = None  # (D,) global descriptor for loop closure
    pyr: tuple | None = None  # device image pyramid kept for loop verify
    orb: tuple | None = None  # (xy, desc, valid) oriented binary features

    @property
    def pose_wc(self):
        Rwc = self.R_cw.T
        return Rwc, -Rwc @ self.t_cw

    @property
    def center(self):
        return self.t_cw


@dataclasses.dataclass
class Edge:
    """Pose-graph edge i->j (x_j = R_ji x_i + t_ji). ref py:601-608 /
    cpp PGEdge:819-826."""

    i: int
    j: int
    R_ji: np.ndarray
    t_ji: np.ndarray
    inliers: int = 0
    is_loop: bool = False
    w_rot: float = 1.0
    w_trans: float = 1.0


class MapState:
    """Sparse map: track-id -> point index, world points, observations.

    ref: py:497-526 / cpp:781-798. Observations are stored as growing
    flat arrays (kf_id, pid, uv) — the natural layout for the batched BA
    linearization (SURVEY §2.6 'obs table').
    """

    def __init__(self):
        self.tid2pid: dict[int, int] = {}
        self.points: list[np.ndarray] = []  # pid -> (3,)
        self.point_tid: list[int] = []
        self.obs_kf: list[int] = []
        self.obs_pid: list[int] = []
        self.obs_uv: list[np.ndarray] = []
        # vectorized tid -> pid lookup (python dict loops over thousands of
        # tracks cost ~100ms per keyframe on the host path)
        self._pid_of_tid = np.full(4096, -1, np.int64)

    def _ensure_tid(self, tid: int) -> None:
        if tid >= len(self._pid_of_tid):
            n = len(self._pid_of_tid)
            while n <= tid:
                n *= 2
            grown = np.full(n, -1, np.int64)
            grown[: len(self._pid_of_tid)] = self._pid_of_tid
            self._pid_of_tid = grown

    def pids_for(self, tids: np.ndarray) -> np.ndarray:
        """Vectorized tid -> pid (-1 when unmapped / invalid tid)."""
        tids = np.asarray(tids, np.int64)
        safe = np.clip(tids, 0, len(self._pid_of_tid) - 1)
        out = self._pid_of_tid[safe]
        out[(tids < 0) | (tids >= len(self._pid_of_tid))] = -1
        return out

    def add_point(self, tid: int, Xw: np.ndarray) -> int:
        pid = len(self.points)
        self.points.append(np.asarray(Xw, np.float64))
        self.point_tid.append(tid)
        self.tid2pid[tid] = pid
        self._ensure_tid(tid)
        self._pid_of_tid[tid] = pid
        return pid

    def rebuild_lookup(self) -> None:
        """Recompute the vectorized tid->pid table from point_tid (used by
        checkpoint restore)."""
        self._pid_of_tid = np.full(4096, -1, np.int64)
        for pid, tid in enumerate(self.point_tid):
            self._ensure_tid(int(tid))
            self._pid_of_tid[int(tid)] = pid

    def add_obs(self, kf_id: int, pid: int, uv: np.ndarray) -> None:
        self.obs_kf.append(kf_id)
        self.obs_pid.append(pid)
        self.obs_uv.append(np.asarray(uv, np.float64))

    def xyz(self) -> np.ndarray:
        if not self.points:
            return np.zeros((0, 3))
        return np.stack(self.points)

    def set_xyz(self, X: np.ndarray) -> None:
        for i in range(len(self.points)):
            self.points[i] = X[i]

    @property
    def num_points(self) -> int:
        return len(self.points)

    @property
    def num_obs(self) -> int:
        return len(self.obs_kf)

    def obs_arrays(self):
        """(M,) kf ids, (M,) pids, (M,2) uv as numpy arrays."""
        if not self.obs_kf:
            return (
                np.zeros(0, np.int32),
                np.zeros(0, np.int32),
                np.zeros((0, 2), np.float64),
            )
        return (
            np.asarray(self.obs_kf, np.int32),
            np.asarray(self.obs_pid, np.int32),
            np.stack(self.obs_uv),
        )
