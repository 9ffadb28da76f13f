from . import augment, loader, segmentation_dataset, pose_dataset, bs_dataset  # noqa: F401
