from . import camera, robot, hand_eye  # noqa: F401
