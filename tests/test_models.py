"""Model stack: shapes, init, forward, and structural invariants."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autoposeestimation_tpu.models import unet, pspnet, densefusion, common


@pytest.mark.slow
def test_unet_shapes_multiclass():
    model = unet.UNet(classes=5, dtype=jnp.float32)
    x = jnp.zeros((2, 96, 128, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    logits, _ = model.apply(params, x, train=True,
                            mutable=["batch_stats"])
    assert logits.shape == (2, 96, 128, 5)
    assert logits.dtype == jnp.float32


def test_unet_7channel_binary():
    model = unet.UNet(classes=2, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 7))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 64, 64, 2)


def test_unet_out_stride_relowering():
    """out_stride=4 (the round-5 serving relowering of the below-ceiling
    full/half-res decoder blocks) must (a) keep an IDENTICAL param tree to
    the exact build — trained weights are stride-interchangeable — and
    (b) emit logits on the ceil(/4) lattice, including the ceil-mode odd-dim
    chain (50 -> 25 -> 13) where the skip subsampling must land on the
    encoder's ceil dims exactly."""
    exact = unet.UNet(classes=4, dtype=jnp.float32)
    low = unet.UNet(classes=4, dtype=jnp.float32, out_stride=4)
    x = jnp.zeros((1, 64, 96, 3))
    v_exact = exact.init(jax.random.PRNGKey(0), x)
    v_low = low.init(jax.random.PRNGKey(0), x)
    shapes = lambda v: jax.tree_util.tree_map(lambda a: a.shape, v)
    assert shapes(v_exact) == shapes(v_low)
    y = low.apply(v_exact, x)          # exact weights in the relowered build
    assert y.shape == (1, 16, 24, 4)
    y_odd = low.apply(low.init(jax.random.PRNGKey(1),
                               jnp.zeros((1, 100, 50, 3))),
                      jnp.zeros((1, 100, 50, 3)))
    assert y_odd.shape == (1, 25, 13, 4)


def test_unet_non_div32_dims():
    # 120 -> /8 = 15 (odd): the ceil-mode encoder overshoots on the 2x
    # upsample and the decoder must crop back to the skip (regression: the
    # round-5 attribution smoke at 120x160 crashed in the concat)
    model = unet.UNet(classes=3, dtype=jnp.float32)
    x = jnp.zeros((1, 120, 160, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (1, 120, 160, 3)


@pytest.mark.slow
def test_pspnet_prelu_init_matches_torch_default():
    # torch nn.PReLU() initializes the shared slope to 0.25; flax's
    # nn.PReLU default is 0.01 — the model must override it so a fresh
    # (non-imported) PSPNet matches the reference's init distribution.
    model = pspnet.PSPNet(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 80, 3)))
    flat = jax.tree_util.tree_leaves_with_path(params["params"])
    slopes = [np.asarray(v) for path, v in flat
              if any(getattr(p, "key", "") == "negative_slope"
                     for p in path)]
    assert len(slopes) >= 3  # PSPUpsample blocks + final stages
    for s in slopes:
        np.testing.assert_allclose(s, 0.25)


def test_pspnet_output_is_logsoftmax_embedding():
    model = pspnet.PSPNet(dtype=jnp.float32)
    x = jnp.zeros((1, 80, 80, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    emb = model.apply(params, x)
    assert emb.shape == (1, 80, 80, 32)
    # log-softmax: logsumexp over channels == 0
    lse = np.asarray(jax.scipy.special.logsumexp(emb, axis=-1))
    np.testing.assert_allclose(lse, 0.0, atol=1e-4)


@pytest.mark.slow
def test_posenet_shapes_and_object_select():
    num_obj, n = 4, 100
    model = densefusion.PoseNet(num_obj=num_obj, dtype=jnp.float32)
    img = jnp.zeros((2, 48, 48, 3))
    cloud = jnp.zeros((2, n, 3))
    choose = jnp.zeros((2, n), jnp.int32)
    obj = jnp.asarray([1, 3])
    params = model.init(jax.random.PRNGKey(0), img, cloud, choose, obj)
    r, t, c, emb = model.apply(params, img, cloud, choose, obj)
    assert r.shape == (2, n, 4)
    assert t.shape == (2, n, 3)
    assert c.shape == (2, n, 1)
    assert emb.shape == (2, n, 32)
    assert np.all(np.asarray(c) >= 0) and np.all(np.asarray(c) <= 1)


def test_posenet_object_heads_differ():
    """Different object ids must route through different head slices."""
    num_obj, n = 3, 50
    model = densefusion.PoseNet(num_obj=num_obj, dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3))
    cloud = jax.random.normal(jax.random.PRNGKey(2), (1, n, 3))
    choose = jnp.arange(n, dtype=jnp.int32)[None]
    params = model.init(jax.random.PRNGKey(0), img, cloud, choose,
                        jnp.asarray([0]))
    r0, *_ = model.apply(params, img, cloud, choose, jnp.asarray([0]))
    r1, *_ = model.apply(params, img, cloud, choose, jnp.asarray([1]))
    assert not np.allclose(np.asarray(r0), np.asarray(r1))


def test_refinenet_shapes():
    model = densefusion.PoseRefineNet(num_obj=4, dtype=jnp.float32)
    cloud = jnp.zeros((2, 100, 3))
    emb = jnp.zeros((2, 100, 32))
    obj = jnp.asarray([0, 2])
    params = model.init(jax.random.PRNGKey(0), cloud, emb, obj)
    r, t = model.apply(params, cloud, emb, obj)
    assert r.shape == (2, 4)
    assert t.shape == (2, 3)


def test_gather_embeddings():
    emb_map = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    choose = jnp.asarray([[0, 5], [15, 1]], jnp.int32)
    out = np.asarray(densefusion.gather_embeddings(emb_map, choose))
    flat = np.asarray(emb_map).reshape(2, 16, 3)
    np.testing.assert_array_equal(out[0, 0], flat[0, 0])
    np.testing.assert_array_equal(out[0, 1], flat[0, 5])
    np.testing.assert_array_equal(out[1, 0], flat[1, 15])


def test_adaptive_avg_pool_matches_torch_semantics():
    import torch

    x = np.random.default_rng(0).normal(size=(1, 11, 13, 5)).astype(np.float32)
    for s in (1, 2, 3, 6):
        want = torch.nn.functional.adaptive_avg_pool2d(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), s).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(common.adaptive_avg_pool(jnp.asarray(x), s))
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("align", [True, False])
def test_resize_bilinear_matches_torch(align):
    import torch

    x = np.random.default_rng(1).normal(size=(1, 10, 14, 3)).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(20, 28),
        mode="bilinear", align_corners=align).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(common.resize_bilinear(jnp.asarray(x), (20, 28),
                                            align_corners=align))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_normalize_imagenet():
    img = jnp.full((4, 4, 3), 255.0)
    out = np.asarray(common.normalize_imagenet(img))
    want = (1.0 - np.asarray(common.IMAGENET_MEAN)) / np.asarray(common.IMAGENET_STD)
    np.testing.assert_allclose(out[0, 0], want, atol=1e-6)


@pytest.mark.slow
def test_unet_remat_matches_plain():
    """remat=True must be numerically identical (forward and gradient)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    plain = unet.UNet(classes=3, dtype=jnp.float32)
    remat = unet.UNet(classes=3, dtype=jnp.float32, remat=True)
    variables = plain.init(jax.random.PRNGKey(1), x)
    y1 = plain.apply(variables, x)
    y2 = remat.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    def loss(m, v):
        out, _ = m.apply(v, x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g1 = jax.grad(lambda v: loss(plain, v))(variables)
    g2 = jax.grad(lambda v: loss(remat, v))(variables)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_pspnet_emb_stride_weight_interchange():
    """emb_stride changes only decoder resolution: the parameter tree must
    be identical across strides (trained / torch-imported weights are
    stride-interchangeable), and stride-8 embeddings must approximate the
    full-res embeddings on smooth inputs."""
    import numpy as np
    from autoposeestimation_tpu.models import densefusion as dfn

    rng = np.random.default_rng(0)
    crop, n = 32, 40
    net1 = dfn.PoseNet(num_obj=2, dtype=jnp.float32, emb_stride=1)
    net8 = dfn.PoseNet(num_obj=2, dtype=jnp.float32, emb_stride=8)
    # smooth image: a low-frequency ramp
    yy, xx = np.mgrid[0:crop, 0:crop] / crop
    img = jnp.asarray(np.stack([yy, xx, yy * xx], -1)[None], jnp.float32)
    cloud = jnp.asarray(rng.normal(size=(1, n, 3)) * 0.05, jnp.float32)
    choose = jnp.asarray(rng.integers(0, crop * crop, (1, n)), jnp.int32)
    obj = jnp.zeros((1,), jnp.int32)
    v1 = net1.init(jax.random.PRNGKey(0), img, cloud, choose, obj)
    v8 = net8.init(jax.random.PRNGKey(0), img, cloud, choose, obj)
    s1 = jax.tree_util.tree_structure(v1)
    s8 = jax.tree_util.tree_structure(v8)
    assert s1 == s8
    for a, b in zip(jax.tree_util.tree_leaves(v1),
                    jax.tree_util.tree_leaves(v8)):
        assert a.shape == b.shape

    # same weights, both strides run; outputs finite and same shapes
    out1 = net1.apply(v1, img, cloud, choose, obj)
    out8 = net8.apply(v1, img, cloud, choose, obj)
    for a, b in zip(out1, out8):
        assert a.shape == b.shape
        assert np.isfinite(np.asarray(a)).all()


def test_pspnet_resize_late_placement():
    """resize_late moves the reduced-stride decoder's 2x resizes to the
    LAST stages (pspnet.PSPNet.resize_late): the parameter tree must be
    identical (weights interchange with every other stride/placement), the
    final map resolution must match the early placement at the same stride,
    and at strides 1 and 8 (all resizes / no resizes) the two placements
    must be the SAME graph bit-for-bit."""
    import numpy as np
    from autoposeestimation_tpu.models.pspnet import PSPNet

    crop = 32
    yy, xx = np.mgrid[0:crop, 0:crop] / crop
    img = jnp.asarray(np.stack([yy, xx, yy * xx], -1)[None], jnp.float32)

    nets = {}
    for stride in (1, 2, 4, 8):
        for late in (False, True):
            nets[(stride, late)] = PSPNet(dtype=jnp.float32,
                                          emb_stride=stride,
                                          resize_late=late)
    v0 = nets[(1, False)].init(jax.random.PRNGKey(0), img)
    struct0 = jax.tree_util.tree_structure(v0)
    for key, net in nets.items():
        v = net.init(jax.random.PRNGKey(0), img)
        assert jax.tree_util.tree_structure(v) == struct0, key
        for a, b in zip(jax.tree_util.tree_leaves(v),
                        jax.tree_util.tree_leaves(v0)):
            assert a.shape == b.shape

    # shared weights: same output resolution per stride; identical graphs
    # where the placement cannot differ
    for stride in (1, 2, 4, 8):
        early = np.asarray(nets[(stride, False)].apply(v0, img))
        late = np.asarray(nets[(stride, True)].apply(v0, img))
        assert early.shape == late.shape == (
            1, crop // stride, crop // stride, 32)
        assert np.isfinite(late).all()
        if stride in (1, 8):
            np.testing.assert_array_equal(early, late)


def test_gather_embeddings_bilinear_exact_on_linear_field():
    """Bilinear gather of a stride-s map must exactly reproduce a linear
    field at every full-res pixel center away from the clamped border."""
    import numpy as np
    from autoposeestimation_tpu.models.densefusion import (
        gather_embeddings_bilinear)

    crop, s = 64, 8
    hc = crop // s
    yy, xx = np.mgrid[0:hc, 0:hc].astype(np.float32)
    # emb value = full-res row/col of the coarse pixel center
    emb = np.stack([(yy + 0.5) * s - 0.5, (xx + 0.5) * s - 0.5], -1)[None]
    rows, cols = np.mgrid[s:crop - s, s:crop - s]
    choose = (rows * crop + cols).reshape(1, -1)
    got = np.asarray(gather_embeddings_bilinear(
        jnp.asarray(emb), jnp.asarray(choose), crop))
    np.testing.assert_allclose(got[0, :, 0], rows.reshape(-1), atol=1e-4)
    np.testing.assert_allclose(got[0, :, 1], cols.reshape(-1), atol=1e-4)


def test_dilated_s2b_exact_and_param_compatible():
    """The space-to-batch lowering of the dilated blocks is mathematically
    exact: same param tree as the dilated form, and with SHARED weights the
    full PSPNet output matches to float32 conv-reassociation tolerance."""
    from autoposeestimation_tpu.models import resnet

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 8)), jnp.float32)

    # single block, dilation 4 (layer4's tail form)
    blk_d = resnet.BasicBlockPlain(8, dilation=4, dtype=jnp.float32)
    blk_s = resnet.BasicBlockPlain(8, dilation=4, dtype=jnp.float32, s2b=True)
    v = blk_d.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(blk_s.init(jax.random.PRNGKey(1), x)))
    np.testing.assert_allclose(np.asarray(blk_d.apply(v, x)),
                               np.asarray(blk_s.apply(v, x)),
                               rtol=1e-5, atol=1e-5)

    # whole PSPNet, shared weights across the flag
    img = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    net_d = pspnet.PSPNet(dtype=jnp.float32)
    net_s = pspnet.PSPNet(dtype=jnp.float32, dil_s2b=True)
    vv = net_d.init(jax.random.PRNGKey(0), img)
    np.testing.assert_allclose(np.asarray(net_d.apply(vv, img)),
                               np.asarray(net_s.apply(vv, img)),
                               rtol=1e-4, atol=1e-4)

    # non-divisible lattice falls back to the dilated form (no crash)
    x_odd = jnp.asarray(rng.normal(size=(1, 18, 18, 8)), jnp.float32)
    blk3 = resnet.BasicBlockPlain(8, dilation=4, dtype=jnp.float32, s2b=True)
    v3 = blk3.init(jax.random.PRNGKey(0), x_odd)
    assert np.isfinite(np.asarray(blk3.apply(v3, x_odd))).all()
