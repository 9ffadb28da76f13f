"""KNN ops: XLA vs Pallas(interpret) vs the native C++ golden."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.ops import knn, native


def assert_nn_equivalent(q, r, got_idx, gold_idx, gold_d2, atol=1e-4):
    """Chosen neighbors must be as near as the golden ones (near-ties between
    the f32 ||a||^2+||b||^2-2ab expansion and the C++ (a-b)^2 form may flip)."""
    got_d2 = np.sum((q.reshape(len(got_idx), 3) - r[np.asarray(got_idx)]) ** 2, axis=-1)
    np.testing.assert_allclose(got_d2, gold_d2, atol=atol)


@pytest.fixture(scope="module")
def clouds():
    rng = np.random.default_rng(0)
    q = rng.normal(size=(500, 3)).astype(np.float32)
    r = rng.normal(size=(1200, 3)).astype(np.float32)
    return q, r


def test_xla_vs_native(clouds):
    q, r = clouds
    gi, gd = native.knn_search(q, r, k=1)
    xi, xd = knn.nn_xla(jnp.asarray(q), jnp.asarray(r))
    assert_nn_equivalent(q, r, xi, gi[:, 0], gd[:, 0])
    np.testing.assert_allclose(np.asarray(xd), gd[:, 0], atol=1e-4)


def test_pallas_interpret_vs_native(clouds):
    q, r = clouds
    gi, gd = native.knn_search(q, r, k=1)
    pi, pd = knn.nn_pallas(jnp.asarray(q), jnp.asarray(r), interpret=True)
    assert_nn_equivalent(q, r, pi, gi[:, 0], gd[:, 0])
    np.testing.assert_allclose(np.asarray(pd), gd[:, 0], atol=1e-4)


def test_masked_ref(clouds):
    q, r = clouds
    valid = np.random.default_rng(1).random(len(r)) > 0.4
    gi, gd = native.knn_search(q, r, k=1, ref_valid=valid)
    xi, xd = knn.nn_xla(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid))
    assert_nn_equivalent(q, r, xi, gi[:, 0], gd[:, 0])
    assert np.all(valid[np.asarray(xi)])
    pi, pd = knn.nn_pallas(jnp.asarray(q), jnp.asarray(r), jnp.asarray(valid),
                           interpret=True)
    assert_nn_equivalent(q, r, pi, gi[:, 0], gd[:, 0])
    assert np.all(valid[np.asarray(pi)])


def test_knn_k_vs_native(clouds):
    q, r = clouds
    k = 7
    gi, gd = native.knn_search(q, r, k=k)
    xi, xd = knn.knn_k(jnp.asarray(q), jnp.asarray(r), k)
    # sorted distances must match; indices may swap on near-ties
    np.testing.assert_allclose(np.asarray(xd) ** 2, gd, atol=1e-4)
    assert np.mean(np.asarray(xi) == gi) > 0.99


def test_min_dists(clouds):
    q, r = clouds
    _, gd = native.knn_search(q, r, k=1)
    md = knn.min_dists_xla(jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(md), np.sqrt(gd[:, 0]), atol=1e-4)


def test_nn_jittable(clouds):
    q, r = clouds
    f = jax.jit(lambda a, b: knn.nn_xla(a, b))
    i1, _ = f(jnp.asarray(q), jnp.asarray(r))
    gi, gd = native.knn_search(q, r, k=1)
    assert_nn_equivalent(q, r, i1, gi[:, 0], gd[:, 0])
