"""TPU-native (JAX/XLA/Pallas/pjit) rebuild of the AutoPoseEstimation stack.

A robot-assisted pipeline that autonomously generates annotated training data for
6D object pose estimation and then trains and serves the perception models
(U-Net segmentation + DenseFusion pose estimation) for live multi-object pose
prediction and robotic grasping.

Reference capability surface: KochPJ/AutoPoseEstimation (PyTorch + Open3D + CUDA).
This package re-architects every compute stage as jit-compiled XLA graphs with the
hot image/point-cloud transforms implemented as fused TPU kernels, and the
single-host DataParallel training replaced by `jax.sharding` data parallelism over
a device mesh.

Layout (mirrors SURVEY.md layer map L0-L6):
  utils/          transforms (quat/axangle/euler/4x4), dataset-contract IO, timing
  ops/            jittable compute ops: morphology, CCA, projection, KNN (Pallas),
                  voxel grid, outlier removal, ICP, background subtraction
  models/         flax models: U-Net-ResNet34 (3ch + 7ch), PSPNet, PoseNet/RefineNet
  data/           host-side datasets over the on-disk contract + device prefetch
  train/          training loops (segmentation, background subtraction, DenseFusion)
  parallel/       mesh construction + sharding helpers
  pipeline/       the jitted end-to-end serving path (full_prediction) + grasping
  labeling/       label generation drivers (classical BS, pred, new_pred, pose labels)
  reconstruction/ multi-view point-cloud reconstruction (ICP-based, on device)
  hardware/       DepthCam/RobotController interfaces + fakes, hand-eye calibration
  acquisition/    robot scan loop with extra-sample capture + pause/resume
  experiments/    ADD(-S) eval, seg-vs-GT eval, training sweeps
"""

__version__ = "0.1.0"
