"""Full grasp sequence with a stubbed predictor, and warm-start import."""
import numpy as np
import pytest

from autoposeestimation_tpu.hardware import robot
from autoposeestimation_tpu.pipeline import grasping, predict
from autoposeestimation_tpu.utils import synthetic


def test_execute_grasp_sequence(tmp_path, monkeypatch):
    root = str(tmp_path)
    c = grasping.CONSTRAINTS
    inside = np.asarray([(c["max_x"] + c["min_x"]) / 2,
                         (c["max_y"] + c["min_y"]) / 2,
                         (c["max_z"] + c["min_z"]) / 2])

    # taught delta: grasp exactly at the predicted position
    grasping.save_grasping_delta(root, "ds", "mug", inside, [1, 0, 0, 0],
                                 {"x": inside[0], "y": inside[1],
                                  "z": inside[2], "a": 0.0, "b": 0.0,
                                  "c": 0.0})

    def fake_full_prediction(image, depth, meta, models, **kw):
        return {"predictions": {"mug": {
            "mask": np.zeros((8, 8), np.uint8),
            "position": inside.copy(),
            "rotation": np.asarray([1.0, 0, 0, 0]),
        }}, "elapsed_times": {}}

    def fake_robot2object(prediction, controller, end2cam):
        return prediction

    monkeypatch.setattr(predict, "full_prediction", fake_full_prediction)
    monkeypatch.setattr(predict, "get_robot2object", fake_robot2object)

    class FakeCam:
        def get_frames(self, **kw):
            return {"image": np.zeros((8, 8, 3), np.uint8),
                    "depth": np.zeros((8, 8), np.uint16)}

        def get_intrinsics(self):
            from autoposeestimation_tpu.utils.io import Intrinsics

            return Intrinsics()

        def get_depth_scale(self):
            return 0.001

    fr = robot.FakeRobot()
    assert grasping.move_to_grasp_position(fr, poll=0.0)
    ok = grasping.execute_grasp(fr, FakeCam(), np.eye(4), models=None,
                                root=root, data_set_name="ds", cls="mug",
                                confirm=lambda m: True, poll=0.0)
    assert ok
    actions = [h[0] for h in fr.history]
    # approach -> descend -> close -> lift -> return -> open
    assert actions.count("gripper") == 2
    gripper_events = [h[1] for h in fr.history if h[0] == "gripper"]
    assert gripper_events == ["close", "open"]


@pytest.mark.slow
def test_warm_start_head_reinit():
    import sys
    import types

    torch = pytest.importorskip("torch")
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.utils"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.path.insert(0, "/root/reference")
    from DenseFusion.lib.network import PoseNet as RefPoseNet

    from autoposeestimation_tpu.models import densefusion, torch_import

    torch.manual_seed(0)
    src = RefPoseNet(num_points=50, num_obj=21)  # upstream YCB object count
    variables = torch_import.warm_start_posenet(src.state_dict(), num_obj=3)
    # trunk kept, heads resized
    assert variables["params"]["PoseHead_0"]["Dense_3"]["kernel"].shape[1] == 12
    assert variables["params"]["PoseHead_1"]["Dense_3"]["kernel"].shape[1] == 9
    # forward runs at the new object count
    import jax
    import jax.numpy as jnp

    model = densefusion.PoseNet(num_obj=3, dtype=jnp.float32)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    r, t, conf, emb = model.apply(variables, jnp.zeros((1, 48, 48, 3)),
                                  jnp.zeros((1, 50, 3)),
                                  jnp.zeros((1, 50), jnp.int32),
                                  jnp.asarray([2]))
    assert r.shape == (1, 50, 4)
