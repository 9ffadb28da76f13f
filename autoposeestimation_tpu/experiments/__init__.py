from . import eval, gt_test  # noqa: F401
