"""Top-level TUI — the reference main.py's 10 menu actions, dependency-injected.

Parity with /root/reference/main.py:973-995: an action loop dispatching
acquisition, label generation, pose-label generation, dataset creation,
segmentation/pose training, live prediction, visualization, grasp teaching and
grasping. Hardware objects (camera/controller) come from injectable factories
so every action runs against the fakes in tests and against
RealSenseCam/user-supplied robot drivers in deployment.

Run: python -m autoposeestimation_tpu.main --root <workspace>
"""
from __future__ import annotations

import argparse
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import numpy as np

from .pipeline import tui

# 12-class overlay color table (reference main.py:440-453)
COLOR_DICT = {
    name: {"tag": tag, "value": value}
    for name, tag, value in [
        ("red", "r", (255, 0, 0)), ("green", "g", (0, 255, 0)),
        ("blue", "b", (0, 0, 255)), ("yellow", "y", (255, 255, 0)),
        ("cyan", "c", (0, 255, 255)), ("magenta", "m", (255, 0, 255)),
        ("orange", "o", (255, 128, 0)), ("purple", "p", (128, 0, 255)),
        ("lime", "l", (128, 255, 0)), ("teal", "t", (0, 128, 128)),
        ("pink", "k", (255, 128, 192)), ("white", "w", (255, 255, 255)),
    ]
}

REFERENCE_POINT = np.asarray([0.0, -767.5, 0.0])  # reference main.py:22


@dataclass
class App:
    root: str
    camera_factory: Callable = None
    controller_factory: Callable = None
    input_fn: Callable[[str], str] = input
    print_fn: Callable[[str], None] = print
    reference_point: np.ndarray = field(
        default_factory=lambda: REFERENCE_POINT.copy())

    # ------------------------------------------------------------------
    def _select_objects(self, multi=True):
        from .utils import io

        objects = io.list_objects(self.root)
        return tui.get_selection("objects", objects, multi=multi,
                                 add_all=True, input_fn=self.input_fn,
                                 print_fn=self.print_fn)

    def _select_dataset(self, kind="segmentation"):
        from .utils import io

        base = os.path.join(self.root, "label_generator", "data_sets", kind)
        names = sorted(os.listdir(base)) if os.path.isdir(base) else []
        return tui.get_selection(f"{kind} dataset", names,
                                 input_fn=self.input_fn,
                                 print_fn=self.print_fn)

    # -- 1. acquire --------------------------------------------------------
    # the reference's full scan session (main.py:103-135): background + an
    # upright foreground run + a 180-deg turn + three 90-deg turns about x/y
    DEFAULT_RUNS = {
        "background": {"a": 0, "b": 0, "c": 0},
        "foreground": {"a": 0, "b": 0, "c": 0},
        "foreground180": {"a": 0, "b": 0, "c": 180},
        "foreground90": {"a": 90, "b": 0, "c": 0},
        "foreground90_2": {"a": 90, "b": 0, "c": 90},
        "foreground90_3": {"a": 90, "b": 0, "c": 180},
    }

    def acquire_new_data_from_object(self, name: Optional[str] = None,
                                     path_data: Optional[Dict] = None,
                                     runs: Optional[Dict] = None,
                                     symmetric: int = 0,
                                     continue_at: Optional[str] = None,
                                     with_turns: bool = False) -> int:
        """Background + foreground scan runs (reference main.py:24-144).
        `runs` maps run name -> object_pose dict (turn declarations);
        `continue_at` resumes the session at a named run (main.py:44-64)."""
        from .acquisition import get_data as gd
        from .hardware import robot as robot_mod

        name = name or self.input_fn("object name> ").strip()
        camera = self.camera_factory()
        controller = self.controller_factory()
        hand_eye = self._load_hand_eye()
        if runs is None:
            runs = (dict(self.DEFAULT_RUNS) if with_turns else {
                "background": {"a": 0, "b": 0, "c": 0},
                "foreground": {"a": 0, "b": 0, "c": 0},
            })
        total = 0
        started = continue_at is None
        for run, object_pose in runs.items():
            if not started:
                if run == continue_at:
                    started = True
                else:
                    continue
            if run != "background":
                self.print_fn(f"place/turn object for run '{run}' "
                              f"(pose {object_pose})")
            if not controller.is_home():
                # each scan must start from home (reference getData.py:126)
                controller.move_joints(np.deg2rad(
                    np.asarray(robot_mod.HOME_JOINTS_DEG)))
                while controller.is_moving():
                    time.sleep(0.05)
            total += gd.get_data(camera, controller, path_data, self.root,
                                 name, run, object_pose, symmetric=symmetric,
                                 hand_eye_calibration=hand_eye)
        return total

    def _load_hand_eye(self) -> np.ndarray:
        path = os.path.join(self.root, "hand_eye_calibration", "data",
                            "handEye_tf.json")
        if os.path.exists(path):
            from .hardware import hand_eye

            return hand_eye.load_hand_eye(path)
        return np.eye(4)

    # -- 2. create labels --------------------------------------------------
    def create_labels(self, objects=None, mode: str = "gen") -> int:
        from .labeling import create_labels as cl

        objects = objects or self._select_objects()
        total = 0
        for obj in objects:
            t0 = time.time()
            if mode == "gen":
                total += cl.create_labels(obj, self.root,
                                          reference_point=self.reference_point)
            else:
                model, variables = self._load_bs_model()
                total += cl.create_mask_predictions(
                    obj, self.root, model, variables,
                    reference_point=self.reference_point)
            self.print_fn(f"{obj}: {time.time() - t0:.1f}s")
        return total

    def _load_bs_model(self):
        import jax.numpy as jnp

        from .models import unet
        from .train import checkpoints

        model = unet.UNet(classes=2, dtype=jnp.float32)
        ckpt = checkpoints.load_checkpoint(os.path.join(
            self.root, "background_subtraction", "trained_models",
            "Unet_resnet34.ckpt"))
        return model, ckpt["variables"]

    def _load_seg_model(self, ds_name: str, num_classes: int):
        import jax.numpy as jnp

        from .models import unet
        from .train import checkpoints

        model = unet.UNet(classes=num_classes, dtype=jnp.float32)
        ckpt = checkpoints.load_checkpoint(os.path.join(
            self.root, "segmentation", "trained_models", ds_name,
            "Unet_resnet34.ckpt"))
        return model, ckpt["variables"]

    # -- 3. create pose labels --------------------------------------------
    def create_pose_data(self, ds_name: Optional[str] = None,
                         global_regression: bool = False) -> Dict:
        from .labeling import create_labels as cl
        from .utils import io

        ds_name = ds_name or self._select_dataset("segmentation")
        classes = io.read_lines(os.path.join(
            io.dataset_dir(self.root, "segmentation", ds_name),
            "classes.txt"))
        model, variables = self._load_seg_model(ds_name, len(classes) + 1)
        return cl.create_pose_data(self.root, classes, ds_name, model,
                                   variables, self.reference_point,
                                   global_regression=global_regression)

    # -- 4. create dataset -------------------------------------------------
    def create_dataset(self, objects=None, kind: str = "segmentation",
                       save_name: Optional[str] = None, mode: str = "pred",
                       p_test: float = 0.2) -> Dict:
        from .labeling import make_dataset

        objects = objects or self._select_objects()
        save_name = save_name or self.input_fn("dataset name> ").strip()
        return make_dataset.make_train_and_test_dataset(
            self.root, objects, kind, save_name, p_test=p_test, mode=mode,
            use_extra_data=(kind == "pose_estimation"))

    # -- 5/6. training -----------------------------------------------------
    def train_segmentation(self, ds_name: Optional[str] = None,
                           epochs: Optional[int] = None, **overrides) -> Dict:
        from .data import loader, segmentation_dataset
        from .train import segmentation as seg
        from .utils import io

        ds_name = ds_name or self._select_dataset("segmentation")
        classes = io.read_lines(os.path.join(
            io.dataset_dir(self.root, "segmentation", ds_name),
            "classes.txt"))
        cfg = seg.SegConfig(classes=len(classes) + 1, **overrides)
        if epochs is not None:
            cfg.epochs = epochs
        train_ds = segmentation_dataset.SegmentationDataset(
            self.root, ds_name, mode="train",
            label_mode=overrides.get("label_mode", "pred"))
        valid_ds = segmentation_dataset.SegmentationDataset(
            self.root, ds_name, mode="test",
            label_mode=overrides.get("label_mode", "pred"))
        out_dir = os.path.join(self.root, "segmentation", "trained_models",
                               ds_name)
        return seg.segmentation_training(
            lambda: loader.Loader(train_ds, cfg.batch_size),
            lambda: loader.Loader(valid_ds, cfg.batch_size, shuffle=False,
                                  drop_last=False),
            cfg, out_dir=out_dir,
            sample_shape=(train_ds.output_size, train_ds.output_size))

    def train_pose_estimation(self, ds_name: Optional[str] = None,
                              epochs: Optional[int] = None,
                              p_viewpoints: float = 1.0,
                              p_extra_data: float = 0.0,
                              warm_start: Optional[str] = None,
                              warm_start_refine: Optional[str] = None,
                              **overrides):
        """warm_start/warm_start_refine: paths to pretrained weights (.pth
        torch or .npz) loaded with head re-init (reference load_pretrained,
        train.py:109-134). start_epoch>1 in overrides resumes the previous
        run's trainer_resume snapshot from the dataset's out_dir."""
        from .data import loader, pose_dataset
        from .train import densefusion as dft
        from .utils import io

        ds_name = ds_name or self._select_dataset("pose_estimation")
        classes = io.read_lines(os.path.join(
            io.dataset_dir(self.root, "pose_estimation", ds_name),
            "classes.txt"))
        cfg = dft.DFConfig(**overrides)
        state = dft.create_trainer(num_obj=len(classes), cfg=cfg)
        if warm_start:
            dft.warm_start(state, warm_start, warm_start_refine)
        train_ds = pose_dataset.PoseDataset(
            self.root, ds_name, mode="train", num_pt=cfg.num_points,
            num_pt_mesh=cfg.num_points_mesh, p_viewpoints=p_viewpoints,
            p_extra_data=p_extra_data)
        test_ds = pose_dataset.PoseDataset(
            self.root, ds_name, mode="test", num_pt=cfg.num_points,
            num_pt_mesh=cfg.num_points_mesh)
        out_dir = os.path.join(self.root, "DenseFusion", "trained_models",
                               ds_name)
        if cfg.start_epoch > 1:
            dft.resume_trainer(state, out_dir)
        # per-epoch prediction-panel dumps (reference plot_train,
        # train.py:256-317) from a raw-enabled copy of the test set
        image_ds = pose_dataset.PoseDataset(
            self.root, ds_name, mode="test", num_pt=cfg.num_points,
            num_pt_mesh=cfg.num_points_mesh, return_raw=True)
        return dft.train(
            state,
            lambda: loader.Loader(train_ds, cfg.batch_size),
            lambda: loader.Loader(test_ds, cfg.batch_size, shuffle=False,
                                  drop_last=False),
            out_dir=out_dir, epochs=epochs,
            image_dump_dir=os.path.join(out_dir, "logs", "images"),
            image_batches=lambda: loader.Loader(
                image_ds, cfg.batch_size, shuffle=False, drop_last=False))

    # -- 7. live prediction ------------------------------------------------
    def run_live_prediction(self, ds_name: Optional[str] = None,
                            max_frames: Optional[int] = None,
                            frame_callback=None, models=None,
                            pipelined: bool = False, in_flight: int = 4,
                            batch: int = 1) -> int:
        """Live loop (reference /root/reference/main.py:517-530: blocking
        capture->predict->draw). `pipelined=True` drives the same camera
        through predict.serve_stream instead — dispatch-ahead with
        `in_flight` frames outstanding and optional `batch`-frame device
        calls — so capture, device compute, and readback overlap (results
        still arrive in order, one callback per frame). `models` injects a
        prebuilt PredictionModels (tests / custom configs); default loads
        the dataset's trained weights."""
        from .pipeline import predict

        if models is None:
            ds_name = ds_name or self._select_dataset("segmentation")
            models = predict.get_prediction_models(self.root, ds_name)
        camera = self.camera_factory()
        meta = {"intr": camera.get_intrinsics(),
                "depth_scale": camera.get_depth_scale()}
        n = 0
        if pipelined:
            import collections

            raw = collections.deque()

            def capture():
                m = 0
                while max_frames is None or m < max_frames:
                    frames = camera.get_frames(with_repair=True)
                    if frames is None:
                        return
                    raw.append(frames)
                    yield frames["image"], frames["depth"], meta
                    m += 1

            t0 = time.time()
            for out in predict.serve_stream(capture(), models,
                                            in_flight=in_flight,
                                            batch=batch):
                frames = raw.popleft()
                n += 1
                fps = n / max(time.time() - t0, 1e-9)
                self.print_fn(f"fps: {fps:.1f}  objects: "
                              f"{list(out['predictions'])}")
                if frame_callback is not None:
                    frame_callback(frames, out)
            return n
        while max_frames is None or n < max_frames:
            frames = camera.get_frames(with_repair=True)
            if frames is None:
                break
            t0 = time.time()
            out = predict.full_prediction(frames["image"], frames["depth"],
                                          meta, models)
            fps = 1.0 / max(time.time() - t0, 1e-9)
            self.print_fn(f"fps: {fps:.1f}  objects: "
                          f"{list(out['predictions'])}")
            if frame_callback is not None:
                frame_callback(frames, out)
            n += 1
        return n

    # -- 9/10. grasping ----------------------------------------------------
    def teach_grasping(self, ds_name: str, cls: str, prediction: Dict) -> None:
        from .pipeline import grasping

        controller = self.controller_factory()
        pose = controller.get_pose(return_mm=False)
        grasping.save_grasping_delta(self.root, ds_name, cls,
                                     prediction["position"],
                                     prediction["rotation"], pose)

    def grasp(self, ds_name: str, cls: str, confirm=None) -> bool:
        from .pipeline import grasping, predict

        models = predict.get_prediction_models(self.root, ds_name)
        return grasping.execute_grasp(
            self.controller_factory(), self.camera_factory(),
            self._load_hand_eye(), models, self.root, ds_name, cls,
            confirm=confirm)

    # -- 8. visualise ------------------------------------------------------
    def visualise(self, kind: Optional[str] = None, obj: Optional[str] = None,
                  run: str = "foreground", mode: str = "gen",
                  show=None) -> int:
        """Mask-overlay / pose-label-reprojection slideshows (reference
        main.py:564-574). `show(frame)` receives each uint8 frame (defaults
        to matplotlib display when available); returns the frame count."""
        from .pipeline import visualize as viz

        kind = kind or tui.get_selection(
            "visualisation", ["segmentation masks", "pose labels"],
            input_fn=self.input_fn, print_fn=self.print_fn)
        obj = obj or self._select_objects(multi=False)
        if show is None:
            def show(frame):
                try:
                    import matplotlib.pyplot as plt

                    plt.imshow(frame)
                    plt.pause(0.05)
                except Exception:
                    pass

        token = viz.CancellationToken()
        gen = (viz.visualise_segmentation_masks(self.root, obj, run, mode,
                                                token=token)
               if kind == "segmentation masks"
               else viz.visualise_pose_labels(self.root, obj, run,
                                              token=token))
        n = 0
        for frame in gen:
            show(frame)
            n += 1
        return n

    # ------------------------------------------------------------------
    ACTIONS = [
        ("acquire new data from object", "acquire_new_data_from_object"),
        ("create labels", "create_labels"),
        ("create pose labels", "create_pose_data"),
        ("create data set", "create_dataset"),
        ("train segmentation", "train_segmentation"),
        ("train pose estimation", "train_pose_estimation"),
        ("run live prediction", "run_live_prediction"),
        ("visualise", "visualise"),
        ("teach grasping", "teach_grasping"),
        ("grasp", "grasp"),
        ("quit", None),
    ]

    def main(self) -> None:
        while True:
            choice = tui.get_selection(
                "action", [a for a, _ in self.ACTIONS],
                input_fn=self.input_fn, print_fn=self.print_fn)
            method = dict(self.ACTIONS).get(choice)
            if method is None:
                return
            try:
                getattr(self, method)()
            except Exception as exc:  # surface, keep the loop alive
                self.print_fn(f"action failed: {exc}")


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default=os.getcwd())
    args = parser.parse_args()

    def camera_factory():
        from .hardware import camera

        try:
            return camera.RealSenseCam()
        except Exception:
            return camera.FakeDepthCam()

    def controller_factory():
        from .hardware import robot

        return robot.FakeRobot()

    App(args.root, camera_factory, controller_factory).main()


if __name__ == "__main__":
    main()
