"""PSPNet color-embedding network used inside DenseFusion's PoseNet.

Parity with /root/reference/DenseFusion/lib/pspnet.py and lib/extractors.py:
BN-free dilated ResNet18 (stride 8, 512ch) -> PSP pyramid pooling over sizes
(1, 2, 3, 6) with 1x1 convs + bilinear upsample -> 1x1 bottleneck to 1024 +
ReLU -> three (2x bilinear upsample + conv3x3 + PReLU) stages 1024->256->64->64
with dropout -> final 1x1 conv to 32 + log_softmax over channels.

Input spatial size must be a multiple of 8 (the reference's 40-px-quantized
crops always are). Output spatial size == input spatial size, 32 channels.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .common import adaptive_avg_pool, resize_bilinear
from .resnet import DilatedResNetNoBN

Dtype = Any


class PSPModule(nn.Module):
    out_features: int = 1024
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        feats = x.shape[-1]
        priors = []
        for s in self.sizes:
            p = adaptive_avg_pool(x, s)
            p = nn.Conv(feats, (1, 1), use_bias=False, dtype=self.dtype)(p)
            # F.upsample(..., mode='bilinear') defaults to align_corners=False
            # in the torch versions the reference ran (>= 0.4)
            priors.append(resize_bilinear(p, (h, w), align_corners=False)
                          .astype(self.dtype))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = nn.Conv(self.out_features, (1, 1), dtype=self.dtype)(y)
        return nn.relu(y)


class PSPUpsample(nn.Module):
    features: int
    dtype: Dtype = jnp.bfloat16
    do_resize: bool = True

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[-3], x.shape[-2]
        if self.do_resize:
            x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        x = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(
            x.astype(self.dtype))
        # PReLU with a single shared slope, computed in the stage dtype
        # (flax casts the f32 slope param to the input dtype; the previous
        # .astype(f32) wrapper round-tripped the full-res map through f32 —
        # pure HBM traffic in bf16 mode). Init 0.25 = torch nn.PReLU()
        # (flax's default is 0.01 — an init-parity bug fixed here;
        # checkpoint/torch-import compatibility is unaffected, the param
        # name and shape are unchanged).
        return nn.PReLU(negative_slope_init=0.25)(x)


class PSPNet(nn.Module):
    """Returns per-pixel 32-d log-softmax embeddings
    (B, H/emb_stride, W/emb_stride, 32).

    emb_stride in {1, 2, 4, 8}: output stride of the embedding map. The
    decoder convs run at reduced resolution (the parameter tree — and
    therefore any trained or torch-imported weights — is IDENTICAL for
    every stride; only the per-stage 2x resizes are skipped). At stride 8
    the three upsample convs shrink from 80^2/160^2/320^2 to 40^2 lattices,
    cutting the serving graph's largest FLOP block ~2x; consumers
    bilinearly interpolate the ~1000 chosen pixels (densefusion.
    gather_embeddings_bilinear). Round-4 ADD-gated evidence
    (artifacts/stride_sweep_round4*.json, 5-class trained demo): stride 8
    holds every NON-symmetric class within 2 mm ADD of stride 1, but
    SYMMETRIC classes regress ~16 mm at any stride > 2 regardless of
    resize placement — their orientation needs the decoder convs ON the
    fine lattice (early placement), not a fine map interpolated from
    coarse convs. pipeline/predict.get_prediction_models auto-selects
    8-or-2 from the dataset's symmetry flags. Training and the
    torch-parity paths stay at the reference-exact stride 1 (this module's
    default)."""

    embed_dim: int = 32
    dtype: Dtype = jnp.bfloat16
    emb_stride: int = 1
    # place the reduced-stride decoder's 2x resizes at the LAST stages
    # instead of the first. The early placement (the original reduced-stride
    # layout, matching the reference's stage order) pays the dominant
    # 1024->256 conv at the UPSAMPLED lattice — at stride 4 that is ~16.3
    # GMAC of the stride-1 path's 22.9 vs ~4.3 when the single resize sits
    # at the last stage. Same parameter tree either way (conv shapes do not
    # depend on lattice size); at strides 1 and 8 the two placements are the
    # identical graph. Like emb_stride itself, flipped only behind the
    # trained-demo ADD gate (scripts/train_multi_demo.py --serve-strides).
    resize_late: bool = False
    # lower the dilated layer-3/4 blocks via space-to-batch (exact same
    # math and params, dense-conv MXU lowering — see resnet.BasicBlockPlain)
    dil_s2b: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.emb_stride in (1, 2, 4, 8)
        n_resize = {1: 3, 2: 2, 4: 1, 8: 0}[self.emb_stride]
        if self.resize_late:
            do_resize = [i >= 3 - n_resize for i in range(3)]
        else:
            do_resize = [n_resize > i for i in range(3)]
        f = DilatedResNetNoBN(dtype=self.dtype,
                              dil_s2b=self.dil_s2b)(x.astype(self.dtype))
        p = PSPModule(1024, dtype=self.dtype)(f)
        p = nn.Dropout(0.3, deterministic=not train)(p)
        p = PSPUpsample(256, dtype=self.dtype, do_resize=do_resize[0])(p)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, do_resize=do_resize[1])(p)
        p = nn.Dropout(0.15, deterministic=not train)(p)
        p = PSPUpsample(64, dtype=self.dtype, do_resize=do_resize[2])(p)
        logits = nn.Conv(self.embed_dim, (1, 1), dtype=jnp.float32)(
            p.astype(jnp.float32))
        return nn.log_softmax(logits, axis=-1)
