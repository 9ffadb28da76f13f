"""Segmentation training (multi-class U-Net) — TPU rebuild of
/root/reference/segmentation/__init__.py:27-248.

Reproduced contract: jaccard loss restricted to present classes + mIoU metric
(background excluded), Adam or SGD-nesterov, per-epoch train/valid loops,
best-valid-mIoU checkpoint carrying configs + curves, JSON log rewritten each
epoch. The nn.DataParallel block (lines 69-83) becomes mesh data parallelism:
pass a Mesh and batches shard over 'data' with replicated params.

Also hosts the learned background-subtraction trainer
(/root/reference/background_subtraction/__init__.py:25-267): binary 7-channel
U-Net, SGD-nesterov + ReduceLROnPlateau(max, patience 5), IoU and IoU-after-CCA
metrics, random-prediction sanity baseline.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, asdict
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import losses, unet
from ..ops import cca as cca_ops
from ..utils.timing import JsonCurveLog
from . import checkpoints


@dataclass
class SegConfig:
    """Defaults = the hardcoded TUI config (/root/reference/main.py:404-417)."""

    model_name: str = "Unet"
    encoder_name: str = "resnet34"
    activation: str = "softmax"
    in_channels: int = 3
    classes: int = 2
    epochs: int = 500
    batch_size: int = 4
    lr: float = 1e-4
    optimizer: str = "adam"         # 'adam' | 'sgd' (nesterov)
    momentum: float = 0.9
    use_imagenet_stats: bool = True
    # mesh data parallelism: 'auto' (engage when >1 device — the reference's
    # automatic nn.DataParallel parity), 'on', 'off'
    data_parallel: str = "auto"


def build_model(cfg: SegConfig, dtype=jnp.bfloat16):
    """Model registry {Unet, PSPNet, LinkNet} over the resnet34 encoder
    (reference segmentation/__init__.py:12-14)."""
    if cfg.encoder_name != "resnet34":
        raise NotImplementedError(
            f"encoder {cfg.encoder_name} — resnet34 is the registry encoder")
    if cfg.model_name == "Unet":
        return unet.UNet(classes=cfg.classes, dtype=dtype)
    from ..models import seg_variants

    if cfg.model_name == "LinkNet":
        return seg_variants.LinkNet(classes=cfg.classes, dtype=dtype)
    if cfg.model_name == "PSPNet":
        return seg_variants.PSPNetSeg(classes=cfg.classes, dtype=dtype)
    raise NotImplementedError(cfg.model_name)


def make_tx(cfg: SegConfig) -> optax.GradientTransformation:
    if cfg.optimizer == "adam":
        return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)
    return optax.inject_hyperparams(
        functools.partial(optax.sgd, momentum=cfg.momentum, nesterov=True)
    )(learning_rate=cfg.lr)


@functools.partial(jax.jit, static_argnames=("model", "tx", "num_classes"),
                   donate_argnames=("variables", "opt_state"))
def train_step(variables, opt_state, batch, model, tx, num_classes: int):
    """One step: jaccard loss, BN batch_stats update, confusion-matrix chunk."""

    def loss_fn(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            batch["image"], train=True, mutable=["batch_stats"])
        loss = losses.jaccard_loss(batch["label"], out)
        return loss, (out, mutated["batch_stats"])

    (loss, (logits, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables["params"])
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    pred = jnp.argmax(logits, axis=-1)
    conf = losses.confusion_matrix(pred, batch["label"], num_classes)
    return ({"params": params, "batch_stats": new_stats}, opt_state,
            {"loss": loss, "conf": conf})


@functools.partial(jax.jit, static_argnames=("model", "num_classes",
                                             "with_cca"))
def eval_step(variables, batch, model, num_classes: int,
              with_cca: bool = False):
    logits = model.apply(variables, batch["image"])
    loss = losses.jaccard_loss(batch["label"], logits)
    pred = jnp.argmax(logits, axis=-1)
    conf = losses.confusion_matrix(pred, batch["label"], num_classes)
    out = {"loss": loss, "conf": conf}
    if with_cca:
        # IoU after keeping the best sum-of-prob component per sample
        # (background_subtraction/utils.py:199-301)
        probs = jax.nn.softmax(logits, axis=-1)
        maxprob = jnp.max(probs, axis=-1)

        def one(m, s):
            comp, _ = cca_ops.best_component_mask(m, s, 0.0, "sum")
            return comp

        comp = jax.vmap(one)(pred > 0, maxprob)
        cca_pred = jnp.where(comp, pred, 0)
        out["conf_cca"] = losses.confusion_matrix(cca_pred, batch["label"],
                                                  num_classes)
    return out


class ReduceLROnPlateau:
    """torch-equivalent scheduler in 'max' mode (patience epochs without
    improvement -> lr *= factor) — background_subtraction/__init__.py:95-99."""

    def __init__(self, lr: float, factor: float = 0.1, patience: int = 5,
                 mode: str = "max"):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.mode = mode
        self.best = -np.inf if mode == "max" else np.inf
        self.bad = 0

    def step(self, metric: float) -> float:
        better = (metric > self.best) if self.mode == "max" else (
            metric < self.best)
        if better:
            self.best = metric
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.lr *= self.factor
                self.bad = 0
        return self.lr


def dump_prediction_images(variables, model, batch, path: str,
                           num_classes: int) -> None:
    """Per-epoch (input | ground truth | prediction) panel dump — the
    reference's logs/images grids (segmentation/__init__.py:180-195)."""
    from ..utils import io as io_utils

    logits = model.apply(variables, batch["image"][:4])
    pred = np.asarray(jnp.argmax(logits, axis=-1))
    label = np.asarray(batch["label"][:4])
    img = np.asarray(batch["image"][:4])
    # un-normalize roughly for display; map classes onto a gray ramp
    disp = np.clip((img[..., :3] * 0.25 + 0.45) * 255, 0, 255).astype(np.uint8)
    scale = 255 // max(num_classes - 1, 1)
    rows = []
    for i in range(len(disp)):
        gt_panel = np.repeat((label[i] * scale).astype(np.uint8)[..., None],
                             3, axis=-1)
        pr_panel = np.repeat((pred[i] * scale).astype(np.uint8)[..., None],
                             3, axis=-1)
        rows.append(np.concatenate([disp[i], gt_panel, pr_panel], axis=1))
    io_utils.write_png(path, np.concatenate(rows, axis=0))


def segmentation_training(train_loader: Callable[[], Iterable],
                          valid_loader: Callable[[], Iterable],
                          cfg: SegConfig,
                          out_dir: str,
                          ckpt_name: str = "Unet_resnet34.ckpt",
                          log_dir: Optional[str] = None,
                          plateau: Optional[ReduceLROnPlateau] = None,
                          with_cca_metric: bool = False,
                          dtype=jnp.bfloat16,
                          seed: int = 0,
                          sample_shape=(480, 480),
                          image_dump_dir: Optional[str] = None,
                          epoch_callback=None) -> Dict[str, Any]:
    """The train loop. Returns {'variables', 'best_iou', 'log'}."""
    model = build_model(cfg, dtype=dtype)
    tx = make_tx(cfg)
    variables = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1,) + tuple(sample_shape) + (cfg.in_channels,)))
    variables = dict(variables)
    variables.setdefault("batch_stats", {})
    opt_state = tx.init(variables["params"])

    from ..parallel import mesh as mesh_lib
    mesh = mesh_lib.auto_mesh(getattr(cfg, "data_parallel", "auto"))
    if mesh is not None:
        variables = mesh_lib.replicate_params(mesh, variables)
        opt_state = mesh_lib.replicate_params(mesh, opt_state)

    os.makedirs(out_dir, exist_ok=True)
    log = JsonCurveLog(os.path.join(log_dir or out_dir, "logs.json"),
                       config=asdict(cfg))
    best_iou = -1.0
    best_variables = variables

    for epoch in range(cfg.epochs):
        t0 = time.time()
        train_losses = []
        conf = jnp.zeros((cfg.classes, cfg.classes), jnp.int32)
        for batch in train_loader():
            if mesh is not None:
                batch = mesh_lib.shard_batch_data(mesh, batch)
            variables, opt_state, m = train_step(
                variables, opt_state, batch, model, tx, cfg.classes)
            train_losses.append(float(m["loss"]))
            conf = conf + m["conf"]
        _, train_iou = losses.iou_from_confusion(conf)

        valid_losses = []
        vconf = jnp.zeros((cfg.classes, cfg.classes), jnp.int32)
        vconf_cca = jnp.zeros((cfg.classes, cfg.classes), jnp.int32)
        first_valid_batch = None
        for batch in valid_loader():
            if mesh is not None:
                batch = mesh_lib.shard_batch_data(mesh, batch)
            if first_valid_batch is None:
                first_valid_batch = batch
            m = eval_step(variables, batch, model, cfg.classes,
                          with_cca_metric)
            valid_losses.append(float(m["loss"]))
            vconf = vconf + m["conf"]
            if with_cca_metric:
                vconf_cca = vconf_cca + m["conf_cca"]
        if image_dump_dir and first_valid_batch is not None:
            dump_prediction_images(
                variables, model, first_valid_batch,
                os.path.join(image_dump_dir, f"epoch_{epoch:04d}.png"),
                cfg.classes)
        _, valid_iou = losses.iou_from_confusion(vconf)
        valid_iou = float(valid_iou)

        entry = {
            "train_loss": float(np.mean(train_losses or [0.0])),
            "valid_loss": float(np.mean(valid_losses or [0.0])),
            "train_iou": float(train_iou),
            "valid_iou": valid_iou,
            "epoch_seconds": time.time() - t0,
            "lr": float(cfg.lr),
        }
        if with_cca_metric:
            _, cca_iou = losses.iou_from_confusion(vconf_cca)
            entry["valid_iou_cca"] = float(cca_iou)
        log.append(**entry)

        if valid_iou > best_iou:
            best_iou = valid_iou
            # deep copy: train_step donates its input buffers, so an alias
            # would be invalidated by the next epoch's first step
            best_variables = jax.tree_util.tree_map(jnp.copy, variables)
            checkpoints.save_checkpoint(
                os.path.join(out_dir, ckpt_name), variables,
                meta={"epoch": epoch, "valid_iou": valid_iou,
                      "config": asdict(cfg)})

        if plateau is not None:
            new_lr = plateau.step(valid_iou)
            if new_lr != cfg.lr:
                cfg.lr = new_lr
                opt_state.hyperparams["learning_rate"] = jnp.asarray(
                    new_lr, jnp.float32)
        if epoch_callback is not None:
            epoch_callback(variables, epoch, valid_iou)

    return {"variables": best_variables, "best_iou": best_iou, "log": log.data}


def random_prediction_iou(valid_loader: Callable[[], Iterable],
                          num_classes: int, seed: int = 0) -> float:
    """The reference's random-baseline sanity check
    (background_subtraction/__init__.py:110-131): mIoU of uniform random
    predictions over the validation set."""
    rng = np.random.default_rng(seed)
    conf = jnp.zeros((num_classes, num_classes), jnp.int32)
    for batch in valid_loader():
        pred = rng.integers(0, num_classes, batch["label"].shape)
        conf = conf + losses.confusion_matrix(
            jnp.asarray(pred), jnp.asarray(batch["label"]), num_classes)
    _, miou = losses.iou_from_confusion(conf)
    return float(miou)
