"""CCA under jit vs cv2.connectedComponents, plus the three selection rules."""
import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.ops import cca


def partitions_equal(labels_a, labels_b, mask):
    """Same partition regardless of label numbering."""
    a = labels_a[mask]
    b = labels_b[mask]
    pairs = set(zip(a.tolist(), b.tolist()))
    return len(pairs) == len(set(x for x, _ in pairs)) == len(set(y for _, y in pairs))


def random_blobs(seed, shape=(96, 128), n_blobs=6):
    rng = np.random.default_rng(seed)
    mask = np.zeros(shape, bool)
    for _ in range(n_blobs):
        r, c = rng.integers(0, shape[0] - 20), rng.integers(0, shape[1] - 20)
        h, w = rng.integers(3, 20), rng.integers(3, 20)
        mask[r:r + h, c:c + w] = True
    return mask


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("connectivity", [4, 8])
def test_cca_matches_cv2_partition(seed, connectivity):
    mask = random_blobs(seed)
    _, want = cv2.connectedComponents(mask.astype(np.uint8), connectivity=connectivity)
    got = np.asarray(cca.connected_components(jnp.asarray(mask), connectivity))
    assert partitions_equal(got, want, mask)
    assert np.all(got[~mask] == mask.size)


def test_cca_snake():
    # a winding path exercises multi-sweep convergence
    mask = np.zeros((40, 40), bool)
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    mask[10, :30] = True
    mask[10:30, 0] = True
    got = np.asarray(cca.connected_components(jnp.asarray(mask), 8))
    _, want = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    assert partitions_equal(got, want, mask)


def test_cca_diagonal_connectivity():
    mask = np.zeros((8, 8), bool)
    mask[np.arange(8), np.arange(8)] = True  # diagonal line
    got8 = np.asarray(cca.connected_components(jnp.asarray(mask), 8))
    assert len(np.unique(got8[mask])) == 1
    got4 = np.asarray(cca.connected_components(jnp.asarray(mask), 4))
    assert len(np.unique(got4[mask])) == 8


def test_best_component_mean_rule():
    mask = np.zeros((32, 32), bool)
    score = np.zeros((32, 32), np.float32)
    mask[2:8, 2:8] = True          # 36 px, mean 10
    score[2:8, 2:8] = 10.0
    mask[20:30, 20:30] = True      # 100 px, mean 50
    score[20:30, 20:30] = 50.0
    comp, found = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score),
                                          min_size=5, rule="mean")
    assert bool(found)
    comp = np.asarray(comp)
    assert comp[25, 25] and not comp[4, 4]


def test_best_component_min_size_gate():
    mask = np.zeros((32, 32), bool)
    score = np.zeros((32, 32), np.float32)
    mask[2:4, 2:4] = True          # only 4 px — below min_size
    score[2:4, 2:4] = 100.0
    mask[20:30, 20:30] = True
    score[20:30, 20:30] = 1.0
    comp, found = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score),
                                          min_size=50, rule="mean")
    assert bool(found)
    comp = np.asarray(comp)
    assert comp[25, 25] and not comp[2, 2]


def test_best_component_area_and_sum_rules():
    mask = np.zeros((32, 32), bool)
    score = np.zeros((32, 32), np.float32)
    mask[2:12, 2:12] = True        # 100 px, score 1 → sum 100
    score[2:12, 2:12] = 1.0
    mask[20:26, 20:26] = True      # 36 px, score 10 → sum 360
    score[20:26, 20:26] = 10.0
    by_area, _ = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score), 0, "area")
    by_sum, _ = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score), 0, "sum")
    assert np.asarray(by_area)[5, 5] and not np.asarray(by_area)[22, 22]
    assert np.asarray(by_sum)[22, 22] and not np.asarray(by_sum)[5, 5]


def test_best_component_empty_mask():
    mask = jnp.zeros((16, 16), bool)
    comp, found = cca.best_component_mask(mask, jnp.zeros((16, 16)), 0, "mean")
    assert not bool(found)
    assert not np.asarray(comp).any()


def test_compact_labels():
    mask = random_blobs(7)
    labels = cca.connected_components(jnp.asarray(mask), 8)
    compact, k = cca.compact_labels(labels, jnp.asarray(mask), 64)
    n_cv, want = cv2.connectedComponents(mask.astype(np.uint8), connectivity=8)
    assert int(k) == n_cv - 1  # cv2 counts background
    got = np.asarray(compact)
    assert got[~mask].max() == -1
    assert partitions_equal(got, want, mask)


def test_best_component_scale_matches_fullres():
    """scale=4 pooled CCA must select the same component as full-res CCA
    whenever components are separated by more than the pooling cell."""
    rng = np.random.default_rng(3)
    for trial in range(10):
        mask = np.zeros((96, 128), bool)
        score = np.zeros((96, 128), np.float32)
        # 3 well-separated rectangles with distinct scores
        boxes = [(8, 8, 30, 40), (60, 20, 80, 50), (30, 80, 70, 120)]
        for bi, (r0, c0, r1, c1) in enumerate(boxes):
            mask[r0:r1, c0:c1] = True
            score[r0:r1, c0:c1] = 0.3 + 0.2 * bi + rng.uniform(0, 0.05)
        exact, f1 = cca.best_component_mask(
            jnp.asarray(mask), jnp.asarray(score), rule="mean_float")
        pooled, f2 = cca.best_component_mask(
            jnp.asarray(mask), jnp.asarray(score), rule="mean_float",
            scale=4)
        assert bool(f1) and bool(f2)
        np.testing.assert_array_equal(np.asarray(exact), np.asarray(pooled))


@pytest.mark.parametrize("scale", [1, 4, 8])
def test_adjacent_components_separation_vs_scale(scale):
    """Task: establish WHERE pooled CCA matches exact cv2-style component
    selection as two same-class components approach each other
    (/root/reference/pipeline/utils.py:444-467 semantics).

    Guarantee proven here: separation >= 2*scale px keeps the components
    distinct at pooling `scale` and selection matches scale=1 exactly for
    every alignment phase. Below that, components MAY merge (worst-case
    alignment merges at separation <= 2*scale - 1); at scale=1 selection is
    always exact. This bound is what justifies the serving default
    (pipeline/predict.py cca_scale): tabletop objects of the same class
    closer than 2*scale px merge into one mask."""
    for phase in range(scale):  # alignment of the gap vs the pooling grid
        for sep in (2 * scale, 2 * scale + 3, 31):
            mask = np.zeros((64, 160), bool)
            score = np.zeros((64, 160), np.float32)
            c_end = 40 + phase
            mask[10:30, 8:c_end] = True          # component A (bigger)
            score[10:30, 8:c_end] = 0.80
            mask[10:30, c_end + sep:c_end + sep + 20] = True   # component B
            score[10:30, c_end + sep:c_end + sep + 20] = 0.85  # higher mean
            exact, f1 = cca.best_component_mask(
                jnp.asarray(mask), jnp.asarray(score), rule="mean_float")
            pooled, f2 = cca.best_component_mask(
                jnp.asarray(mask), jnp.asarray(score), rule="mean_float",
                scale=scale)
            assert bool(f1) and bool(f2)
            np.testing.assert_array_equal(np.asarray(exact),
                                          np.asarray(pooled))


@pytest.mark.parametrize("scale", [4, 8])
def test_pooled_stats_are_fullres_exact(scale):
    """r2-advisor medium: pooled cell means unweighted by pixel count could
    flip close selections. The count-weighted pooled stats must now pick the
    same winner as full-res whenever components don't merge — even when mean
    scores differ by less than the pooling quantization and the components
    have ragged, partially-filled border cells."""
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:96, 0:192]
    for trial in range(8):
        mask = np.zeros((96, 192), bool)
        score = np.zeros((96, 192), np.float32)
        # two connected ellipses, far apart, grid-misaligned (ragged cells),
        # with nearly identical mean scores
        for (rr, cc), base in (((25, 40), 0.800), ((62, 140), 0.802)):
            ry = rng.uniform(5, 11)
            rx = rng.uniform(5, 11)
            cy = rr + rng.uniform(-1, 1)
            cx = cc + rng.uniform(-1, 1)
            blob = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0
            mask |= blob
            score = np.where(
                blob, base + rng.normal(0, 0.003, mask.shape).astype(
                    np.float32), score)
        for rule in ("mean_float", "mean", "area", "sum"):
            exact, f1 = cca.best_component_mask(
                jnp.asarray(mask), jnp.asarray(score), rule=rule)
            pooled, f2 = cca.best_component_mask(
                jnp.asarray(mask), jnp.asarray(score), rule=rule, scale=scale)
            assert bool(f1) == bool(f2)
            np.testing.assert_array_equal(np.asarray(exact),
                                          np.asarray(pooled))


def test_pooled_merge_below_bound_is_superset():
    """Below the 2*scale separation bound components may merge — the failure
    mode is a UNION mask (both objects), never a wrong-object selection with
    a missing winner."""
    mask = np.zeros((64, 128), bool)
    score = np.zeros((64, 128), np.float32)
    mask[10:30, 8:40] = True
    score[10:30, 8:40] = 0.9
    mask[10:30, 43:70] = True   # 3 px gap < 2*8
    score[10:30, 43:70] = 0.5
    exact, _ = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score),
                                       rule="mean_float")
    pooled, f = cca.best_component_mask(jnp.asarray(mask), jnp.asarray(score),
                                        rule="mean_float", scale=8)
    assert bool(f)
    got = np.asarray(pooled)
    # winner is included; any extra pixels are the merged neighbor (subset of
    # the class mask), not background
    assert (np.asarray(exact) & ~got).sum() == 0
    assert (got & ~mask).sum() == 0


def test_convergence_flag():
    """with_flag: a fixed sweep budget too small for the component geometry
    must report converged=False (the cheap neighborhood check is exact);
    ample budgets and the while_loop path report True."""
    # spiral-ish snake: needs several sweeps
    mask = np.zeros((40, 40), bool)
    mask[0, :] = True
    mask[:, -1] = True
    mask[-1, :] = True
    mask[10, :30] = True
    mask[10:30, 0] = True
    m = jnp.asarray(mask)

    lbl1, conv1 = cca.connected_components(m, 8, fixed_sweeps=1,
                                           with_flag=True)
    assert not bool(conv1)
    lbl9, conv9 = cca.connected_components(m, 8, fixed_sweeps=9,
                                           with_flag=True)
    assert bool(conv9)
    lblw, convw = cca.connected_components(m, 8, with_flag=True)
    assert bool(convw)
    np.testing.assert_array_equal(np.asarray(lbl9), np.asarray(lblw))

    # convex blob: one sweep suffices
    blob = np.zeros((32, 32), bool)
    blob[8:20, 8:24] = True
    _, cb = cca.connected_components(jnp.asarray(blob), 8, fixed_sweeps=1,
                                     with_flag=True)
    assert bool(cb)

    # flag threads through best_component_mask (pooled serving config)
    score = jnp.where(m, 0.7, 0.0)
    comp, found, conv = cca.best_component_mask(
        m, score, rule="mean_float", scale=2, fixed_sweeps=2, with_flag=True)
    assert conv.shape == ()
