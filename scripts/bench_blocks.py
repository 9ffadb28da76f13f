"""Per-block PSPNet + estimator-step attribution on the real chip.

bench_prefix.py attributes the train step at stage granularity (PSPNet fwd,
PoseNet fwd, sym loss fwd/bwd, full step); round-3's conclusion ("conv-bound,
parts run ~37 TF/s vs ~55 practical") was stage-level. This script answers
WHICH blocks sit below the practical conv ceiling: it times every stage of
the dilated ResNet18 + PSP decoder separately — forward AND forward+backward
— computes each block's analytic FLOPs, and prints achieved TF/s next to a
same-shape dense-conv control so dilation/layout effects are attributable
per block.

Method: every timing is one jitted lax.scan with a data dependence between
iterations ending in a host readback (the only method the tunnel reports
honestly — CLAUDE.md). FLOPs are analytic (2*N*H*W*Cin*Cout*k*k), not the
TPU plugin's inflated cost_analysis.

Reference analog of the network under test:
/root/reference/DenseFusion/lib/extractors.py:78-124 (dilated resnet18),
lib/pspnet.py (PSP decoder).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BS, CROP = 8, 320
PEAK_TFS = 197.0  # v5e bf16


def scan_time(step, carry0, iters=12, trials=3):
    @jax.jit
    def loop(c0):
        c, outs = jax.lax.scan(step, c0, jnp.arange(iters, dtype=jnp.uint32))
        return outs

    _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        _ = np.asarray(jax.tree_util.tree_leaves(loop(carry0))[0])
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[trials // 2]


def conv_flops(n, h, w, cin, cout, k=3):
    return 2.0 * n * h * w * cin * cout * k * k


def emit(name, seconds, flops, extra=None):
    d = {"metric": name, "ms": round(seconds * 1000, 3),
         "tflops": round(flops / 1e12, 4),
         "tf_per_s": round(flops / seconds / 1e12, 1),
         "pct_peak": round(flops / seconds / 1e12 / PEAK_TFS * 100, 1)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def bench_module(name, module, in_shape, flops, bwd=True):
    """Time module fwd and fwd+bwd (grad wrt params+input) scan-serialized."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=in_shape), jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), x0)

    def fwd(c, i):
        y = module.apply(variables, x0 + c)
        return (y.sum() * 0).astype(jnp.float32), y.reshape(-1)[0]

    t = scan_time(fwd, jnp.float32(0))
    emit(f"{name}_fwd", t, flops)
    if not bwd:
        return

    def fwdbwd(c, i):
        def f(v, xx):
            return (module.apply(v, xx) ** 2).sum()

        g = jax.grad(f, argnums=(0, 1))(variables, x0 + c)
        # keep EVERY grad leaf live: reducing only leaves[0] lets XLA DCE
        # most of the backward for multi-submodule nets (the shallowest
        # param's wgrad needs no dgrad chain) — bogusly free bwd timings
        tot = sum(jnp.sum(l.astype(jnp.float32))
                  for l in jax.tree_util.tree_leaves(g))
        return (tot * 0).astype(jnp.float32), tot

    # fwd+bwd of a conv stack is ~3x fwd FLOPs (dgrad + wgrad)
    t = scan_time(fwdbwd, jnp.float32(0))
    emit(f"{name}_fwd_bwd", t, 3.0 * flops)


def main():
    import flax.linen as nn

    from autoposeestimation_tpu.models import pspnet, resnet

    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024))
    _ = np.asarray(x @ x)
    print(json.dumps({"metric": "probe_matmul_1k",
                      "ms": round((time.perf_counter() - t0) * 1000, 1)}),
          flush=True)

    h8 = CROP // 4  # 80 after stem+pool
    h16 = CROP // 8  # 40 after layer2

    # dense-conv controls at the two lattice sizes (what a plain 3x3 conv
    # achieves at these shapes — the per-shape practical ceiling)
    for cname, (hh, cc) in (("control_80x80_c128", (h8, 128)),
                            ("control_40x40_c512", (h16, 512))):
        mod = nn.Conv(cc, (3, 3), padding=1, use_bias=False,
                      dtype=jnp.bfloat16)
        bench_module(cname, mod, (BS, hh, hh, cc),
                     conv_flops(BS, hh, hh, cc, cc))

    # dilated control: same shape as layer4's tail conv
    class DilConv(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(512, (3, 3), padding=4, kernel_dilation=(4, 4),
                           use_bias=False, dtype=jnp.bfloat16)(x)

    bench_module("control_40x40_c512_dil4", DilConv(), (BS, h16, h16, 512),
                 conv_flops(BS, h16, h16, 512, 512))

    # space-to-batch lowering of the same dilated conv (exact rewrite —
    # resnet._space_to_batch): is dense-on-subgrids faster than dilated?
    class DilConvS2B(nn.Module):
        @nn.compact
        def __call__(self, x):
            from autoposeestimation_tpu.models import resnet as rn
            b = x.shape[0]
            xs = rn._space_to_batch(x, 4)
            y = nn.Conv(512, (3, 3), padding=1, use_bias=False,
                        dtype=jnp.bfloat16)(xs)
            return rn._batch_to_space(y, 4, b)

    bench_module("control_40x40_c512_dil4_s2b", DilConvS2B(),
                 (BS, h16, h16, 512), conv_flops(BS, h16, h16, 512, 512))

    # ---- the real stages -------------------------------------------------
    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                        dtype=jnp.bfloat16)(x.astype(jnp.bfloat16))
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=((1, 1), (1, 1)))

    bench_module("stem_320", Stem(), (BS, CROP, CROP, 3),
                 conv_flops(BS, CROP // 2, CROP // 2, 3, 64, 7))

    class Layer(nn.Module):
        width: int
        first_stride: int = 1
        dil: int = 1
        s2b: bool = False

        @nn.compact
        def __call__(self, x):
            for b in range(2):
                x = resnet.BasicBlockPlain(
                    self.width, stride=self.first_stride if b == 0 else 1,
                    dilation=1 if b == 0 else self.dil,
                    dtype=jnp.bfloat16, s2b=self.s2b)(x)
            return x

    # (name, module, input shape, conv FLOPs)
    def layer_flops(h_in, h_out, cin, w):
        f = conv_flops(BS, h_out, h_out, cin, w) \
            + conv_flops(BS, h_out, h_out, w, w) * 3
        if cin != w:
            f += conv_flops(BS, h_out, h_out, cin, w, 1)
        return f

    stages = [
        ("layer1_80x80_c64", Layer(64), (BS, h8, h8, 64),
         layer_flops(h8, h8, 64, 64)),
        ("layer2_40x40_c128", Layer(128, first_stride=2), (BS, h8, h8, 64),
         layer_flops(h8, h16, 64, 128)),
        ("layer3_40x40_c256_dil2", Layer(256, dil=2), (BS, h16, h16, 128),
         layer_flops(h16, h16, 128, 256)),
        ("layer4_40x40_c512_dil4", Layer(512, dil=4), (BS, h16, h16, 256),
         layer_flops(h16, h16, 256, 512)),
        ("layer3_40x40_c256_dil2_s2b", Layer(256, dil=2, s2b=True),
         (BS, h16, h16, 128), layer_flops(h16, h16, 128, 256)),
        ("layer4_40x40_c512_dil4_s2b", Layer(512, dil=4, s2b=True),
         (BS, h16, h16, 256), layer_flops(h16, h16, 256, 512)),
    ]
    for name, mod, shp, fl in stages:
        bench_module(name, mod, shp, fl)

    # PSP pyramid + bottleneck at (40, 40, 512)
    bench_module("psp_module", pspnet.PSPModule(1024, dtype=jnp.bfloat16),
                 (BS, h16, h16, 512),
                 conv_flops(BS, h16, h16, 512 * 5, 1024, 1)
                 + 4 * conv_flops(BS, 3, 3, 512, 512, 1))

    # decoder stage 1 (the largest decoder conv): upsample 40->80 + 3x3
    bench_module("dec1_80x80_1024to256",
                 pspnet.PSPUpsample(256, dtype=jnp.bfloat16),
                 (BS, h16, h16, 1024),
                 conv_flops(BS, h8, h8, 1024, 256))
    bench_module("dec2_160x160_256to64",
                 pspnet.PSPUpsample(64, dtype=jnp.bfloat16),
                 (BS, h8, h8, 256),
                 conv_flops(BS, CROP // 2, CROP // 2, 256, 64))
    bench_module("dec3_320x320_64to64",
                 pspnet.PSPUpsample(64, dtype=jnp.bfloat16),
                 (BS, CROP // 2, CROP // 2, 64),
                 conv_flops(BS, CROP, CROP, 64, 64))

    # whole PSPNet for cross-check against the parts
    psp_total = (conv_flops(BS, CROP // 2, CROP // 2, 3, 64, 7)
                 + layer_flops(h8, h8, 64, 64)
                 + layer_flops(h8, h16, 64, 128)
                 + layer_flops(h16, h16, 128, 256)
                 + layer_flops(h16, h16, 256, 512)
                 + conv_flops(BS, h16, h16, 512 * 5, 1024, 1)
                 + conv_flops(BS, h8, h8, 1024, 256)
                 + conv_flops(BS, CROP // 2, CROP // 2, 256, 64)
                 + conv_flops(BS, CROP, CROP, 64, 64)
                 + conv_flops(BS, CROP, CROP, 64, 32, 1))
    bench_module("pspnet_full_stride1", pspnet.PSPNet(dtype=jnp.bfloat16),
                 (BS, CROP, CROP, 3), psp_total)
    bench_module("pspnet_full_stride1_s2b",
                 pspnet.PSPNet(dtype=jnp.bfloat16, dil_s2b=True),
                 (BS, CROP, CROP, 3), psp_total)


if __name__ == "__main__":
    main()
