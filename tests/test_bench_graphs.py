"""The bench/FLOPs shared-graph contract.

`scripts/bench_prefix.py` (chip timings) and `utils/flops.py` (CPU FLOP
counts) must consume the SAME step functions — these tests pin that the
shared builders in utils/serving_stages.py and utils/train_stages.py trace
end-to-end, so a refactor of the serving or train path that breaks either
consumer fails here instead of at bench time on the chip.
"""
import jax
import jax.numpy as jnp

from autoposeestimation_tpu.utils import serving_stages, train_stages


def test_serving_prefixes_trace():
    steps, models = serving_stages.build_prefixes(
        num_classes=3, num_points=64, crop=64, h=96, w=128, refine_iters=1,
        emb_stride=8)
    assert set(serving_stages.PREFIX_ORDER) == set(steps)
    for name in serving_stages.PREFIX_ORDER:
        carry, out = jax.eval_shape(steps[name], jnp.uint8(0),
                                    jnp.uint32(0))
        assert carry.shape == ()
    # the full prefix ends in the per-class translation vector
    assert out.shape == (3, 3)


def test_train_stages_trace():
    steps, carries = train_stages.build_stages(num_obj=2, bs=2, n=64, m=32,
                                               crop=64)
    assert set(train_stages.TRAIN_STAGE_ORDER) == set(steps)
    for name in train_stages.TRAIN_STAGE_ORDER:
        carry, out = jax.eval_shape(steps[name], carries[name],
                                    jnp.uint32(0))
        # step carries must round-trip (scan requires matching treedefs)
        lhs = jax.tree_util.tree_structure(carry)
        rhs = jax.tree_util.tree_structure(
            jax.eval_shape(lambda x: x, carries[name]))
        assert lhs == rhs, name
