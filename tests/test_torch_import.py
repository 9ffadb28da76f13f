"""Golden parity test: our flax PoseNet/PoseRefineNet with imported weights
must reproduce the *actual reference implementation's* outputs (torch CPU).

This is the strongest architecture-parity evidence available: the reference
modules (DenseFusion/lib/network.py) are imported directly from
/root/reference and run on the same inputs.
"""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

# the reference modules import torchvision at module scope but never use it in
# the forward pass; stub it so the import succeeds in this minimal env
import types  # noqa: E402

for name in ("torchvision", "torchvision.transforms", "torchvision.utils"):
    sys.modules.setdefault(name, types.ModuleType(name))

import jax
import jax.numpy as jnp

from autoposeestimation_tpu.models import densefusion, torch_import


@pytest.fixture(scope="module")
def reference_models():
    from DenseFusion.lib.network import PoseNet, PoseRefineNet

    torch.manual_seed(0)
    num_obj, num_points = 3, 100
    est = PoseNet(num_points=num_points, num_obj=num_obj)
    ref = PoseRefineNet(num_points=num_points, num_obj=num_obj)
    est.eval()
    ref.eval()
    return est, ref, num_obj, num_points


def test_posenet_import_parity(reference_models):
    est, _, num_obj, n = reference_models
    rng = np.random.default_rng(0)
    size = 80  # multiple of 8
    img = rng.normal(size=(1, 3, size, size)).astype(np.float32)
    cloud = (rng.normal(size=(1, n, 3)) * 0.1).astype(np.float32)
    choose = rng.integers(0, size * size, (1, 1, n))
    obj = np.asarray([[1]])

    with torch.no_grad():
        t_r, t_t, t_c, t_emb = est(
            torch.from_numpy(img), torch.from_numpy(cloud),
            torch.from_numpy(choose).long(), torch.from_numpy(obj).long())

    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_import.import_posenet(est.state_dict()))
    model = densefusion.PoseNet(num_obj=num_obj, dtype=jnp.float32)
    j_r, j_t, j_c, j_emb = model.apply(
        variables, jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(cloud), jnp.asarray(choose[:, 0]), jnp.asarray([1]))

    np.testing.assert_allclose(np.asarray(j_r), t_r.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_t), t_t.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_c), t_c.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_emb),
                               t_emb.numpy().transpose(0, 2, 1), atol=2e-4)


def test_refinenet_import_parity(reference_models):
    _, ref, num_obj, n = reference_models
    rng = np.random.default_rng(1)
    cloud = (rng.normal(size=(1, n, 3)) * 0.1).astype(np.float32)
    emb = rng.normal(size=(1, 32, n)).astype(np.float32)

    with torch.no_grad():
        t_r, t_t = ref(torch.from_numpy(cloud), torch.from_numpy(emb),
                       torch.from_numpy(np.asarray([[2]])).long())

    variables = jax.tree_util.tree_map(
        jnp.asarray, torch_import.import_refinenet(ref.state_dict()))
    model = densefusion.PoseRefineNet(num_obj=num_obj, dtype=jnp.float32)
    j_r, j_t = model.apply(variables, jnp.asarray(cloud),
                           jnp.asarray(emb.transpose(0, 2, 1)),
                           jnp.asarray([2]))
    np.testing.assert_allclose(np.asarray(j_r), t_r.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_t), t_t.numpy(), atol=2e-4)


def test_pth_roundtrip(tmp_path, reference_models):
    est, _, num_obj, _ = reference_models
    path = str(tmp_path / "pose_model.pth")
    torch.save(est.state_dict(), path)
    state = torch_import.load_pth(path)
    variables = torch_import.import_posenet(state)
    leaves = jax.tree_util.tree_leaves(variables)
    assert len(leaves) > 50


def test_warm_start_refinenet_head_reinit(reference_models):
    """warm_start_refinenet: trunk imported, final per-object heads re-init
    when object counts differ (reference train.py:126-132)."""
    _, ref, num_obj, num_points = reference_models
    state = ref.state_dict()
    new_obj = num_obj + 2
    variables = torch_import.warm_start_refinenet(state, new_obj)
    p = variables["params"]
    assert p["RefineHead_0"]["Dense_2"]["kernel"].shape[1] == 4 * new_obj
    assert p["RefineHead_1"]["Dense_2"]["kernel"].shape[1] == 3 * new_obj
    # trunk weights must be the imported ones, bit-equal
    imported = torch_import.import_refinenet(state)
    np.testing.assert_array_equal(
        p["PoseRefineNetFeat_0"]["Dense_0"]["kernel"],
        imported["params"]["PoseRefineNetFeat_0"]["Dense_0"]["kernel"])
    # and the result must run through our module
    model = densefusion.PoseRefineNet(num_obj=new_obj, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    dr, dt = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(rng.normal(size=(1, num_points, 3)), jnp.float32),
        jnp.asarray(rng.normal(size=(1, num_points, 32)), jnp.float32),
        jnp.asarray([new_obj - 1]))
    assert dr.shape == (1, 4) and dt.shape == (1, 3)
    assert np.isfinite(np.asarray(dr)).all()
