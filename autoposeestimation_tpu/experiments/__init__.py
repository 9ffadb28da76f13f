from . import eval, gt_test, legacy_eval, sweeps  # noqa: F401
