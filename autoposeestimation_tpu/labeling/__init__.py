from . import create_labels, make_dataset, pose_labels  # noqa: F401
