"""Robot controller interface + hermetic fake.

Interface parity with /root/reference/robot_controller/TestController.py:19-103
(the designated user-supplied-driver seam, README.md:58): move_joints,
get_pose(return_mm), get_joints(type), is_moving, is_home(eps), at_target,
move_to_pose, close_gripper/open_gripper.

`FakeRobot` simulates instantaneous or rate-limited joint motion with a
configurable forward-kinematics function (defaults to a toy FK that maps
joints to a camera pose on the synthetic view ring), so acquisition and
grasping flows run hermetically.
"""
from __future__ import annotations

import threading
import time
from typing import Callable, Dict, List, Optional

import numpy as np

HOME_JOINTS_DEG = [0.0, -90.0, 0.0, -90.0, 0.0, 0.0]


class RobotControllerBase:
    def move_joints(self, target, moveType: str = "p", vel: float = 0.1,
                    acc: float = 0.1) -> None:
        raise NotImplementedError

    def move_to_pose(self, pose: Dict, moveType: str = "p", vel: float = 0.1,
                     acc: float = 0.1) -> None:
        raise NotImplementedError

    def get_pose(self, return_mm: bool = True) -> Dict:
        raise NotImplementedError

    def get_joints(self, type: str = "deg"):
        raise NotImplementedError

    def is_moving(self) -> bool:
        raise NotImplementedError

    def is_home(self, eps: float = 0.02) -> bool:
        j = np.asarray(self.get_joints("deg"))
        return bool(np.all(np.abs(np.asarray(HOME_JOINTS_DEG) - j) <= eps))

    def at_target(self, t, type: str = "deg", eps: float = 0.02) -> bool:
        j = np.asarray(self.get_joints(type))
        return bool(np.all(np.abs(np.asarray(t) - j) <= eps))

    def close_gripper(self) -> None:
        raise NotImplementedError

    def open_gripper(self) -> None:
        raise NotImplementedError


class FakeRobot(RobotControllerBase):
    """Simulated robot. Joint targets passed in radians (like the reference's
    move_joints(np.deg2rad(...)) call sites); internal state in degrees.

    fk_fn(joints_deg) -> 4x4 robot->endEff transform (mm). The default places
    the end-effector at a fixed pose; tests supply scene-consistent FK.
    """

    def __init__(self, fk_fn: Optional[Callable] = None,
                 move_duration: float = 0.0):
        self.joints_deg = np.asarray(HOME_JOINTS_DEG, float)
        self.move_duration = move_duration
        self._moving_until = 0.0
        self.fk_fn = fk_fn or (lambda j: np.eye(4))
        self.gripper_closed = False
        self.history: List = []
        self._lock = threading.Lock()

    # -- motion ------------------------------------------------------------
    def move_joints(self, target, moveType: str = "p", vel: float = 0.1,
                    acc: float = 0.1) -> None:
        with self._lock:
            self.joints_deg = np.rad2deg(np.asarray(target, float))
            self._moving_until = time.time() + self.move_duration
            self.history.append(("joints", self.joints_deg.copy()))

    def move_to_pose(self, pose: Dict, moveType: str = "p", vel: float = 0.1,
                     acc: float = 0.1) -> None:
        with self._lock:
            self._pose_override = dict(pose)
            self._moving_until = time.time() + self.move_duration
            self.history.append(("pose", dict(pose)))

    def is_moving(self) -> bool:
        return time.time() < self._moving_until

    # -- state -------------------------------------------------------------
    def get_joints(self, type: str = "deg"):
        if type == "deg":
            return self.joints_deg.copy()
        if type == "rad":
            return np.deg2rad(self.joints_deg)
        return -1

    def get_pose(self, return_mm: bool = True) -> Dict:
        override = getattr(self, "_pose_override", None)
        if override is not None:
            return dict(override)
        tf = np.asarray(self.fk_fn(self.joints_deg))
        from ..utils import transforms as T
        import jax.numpy as jnp

        rv = np.asarray(T.mat_to_rotvec(jnp.asarray(tf[:3, :3],
                                                    jnp.float32)))
        scale = 1.0 if return_mm else 1e-3
        return {"x": float(tf[0, 3]) * scale, "y": float(tf[1, 3]) * scale,
                "z": float(tf[2, 3]) * scale,
                "a": float(rv[0]), "b": float(rv[1]), "c": float(rv[2])}

    def robot2end(self) -> np.ndarray:
        return np.asarray(self.fk_fn(self.joints_deg))

    # -- gripper -----------------------------------------------------------
    def close_gripper(self) -> None:
        self.gripper_closed = True
        self.history.append(("gripper", "close"))

    def open_gripper(self) -> None:
        self.gripper_closed = False
        self.history.append(("gripper", "open"))


def ring_fk(cams: List[np.ndarray], hand_eye: Optional[np.ndarray] = None
            ) -> Callable:
    """FK stub mapping joint[0] (deg) to an index in a precomputed camera
    ring: joint target i*step selects cams[i]. Used with FakeDepthCam so
    acquisition paths produce geometrically consistent data."""
    hand_eye = np.eye(4) if hand_eye is None else hand_eye

    def fk(joints_deg):
        idx = int(round(joints_deg[0])) % len(cams)
        robot2cam = cams[idx]
        return robot2cam @ np.linalg.inv(hand_eye)

    return fk
