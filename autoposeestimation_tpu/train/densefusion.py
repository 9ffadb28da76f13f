"""DenseFusion two-phase trainer: TPU-native rebuild of
/root/reference/DenseFusion/tools/train.py.

Differences by design:
  * the reference trains bs=1 with manual gradient accumulation every 8
    samples (train.py:231-238) because its PoseNet hardcodes bs=1; our
    networks are batched, so a true batch of 8 runs as one jitted step
    (identical expected gradient, 8x fewer optimizer steps of glue),
  * the margin-triggered phase machine (decay at best-test < 0.016, refiner
    phase at < 0.010 or epoch >= 400, train.py:396-420) lives on the host;
    the jitted step functions are pure,
  * refiner-phase gradients accumulate across the `iteration` rebased refine
    steps like the per-iteration dis.backward() in the reference
    (train.py:218-223): the jitted step sums the per-iteration distances and
    differentiates once,
  * data parallelism: steps are jit-compiled against a Mesh; batches shard
    over 'data', parameters replicate (or tensor-shard, parallel/mesh.py).

Checkpoint contract: best-test-distance checkpoints saved as
DenseFusion/trained_models/<ds>/pose_model.npz / pose_refine_model.npz
(reference: .pth at train.py:367-379), plus the losses.json curve log.
"""
from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import densefusion, losses
from ..utils.timing import JsonCurveLog
from . import checkpoints


@dataclass
class DFConfig:
    """Hyperparameters (defaults = reference train.py:34-49)."""

    batch_size: int = 8
    lr: float = 1e-4
    lr_rate: float = 0.3
    w: float = 0.015
    w_rate: float = 0.3
    decay_margin: float = 0.016
    refine_margin: float = 0.010
    noise_trans: float = 0.03
    iteration: int = 2
    nepoch: int = 500
    refine_epoch_margin: int = 400
    start_epoch: int = 1
    num_points: int = 1000
    # 500 matches the reference's loss everywhere it trains: myDataset
    # num_pt_mesh_small=500 (datasets/myDataset/dataset.py:85), and the
    # refine-phase bump to num_pt_mesh_large is commented out in
    # tools/train.py:416 — so the (M, M) symmetric matching (the dominant
    # train-step op) runs at 500x500, 4x cheaper than the former 1000 default
    num_points_mesh: int = 500
    with_sym: bool = True
    # bf16 distance matmuls in the symmetric-loss TRAIN kernel (~3x on the
    # dominant training op; ~3% moment noise — eval/checkpoint selection
    # stays exact f32). ops/pallas_addloss._cross_dtype documents the
    # cancellation caveat near convergence. Default ON since the round-5
    # promotion gate (artifacts/gate_symbf16_round5.json): a 120-epoch twin
    # of the 5-object demo matched the exact run's best test ADD within
    # 0.06 mm and every class's n=36 held-out served ADD within 2.7 mm,
    # with margin-fired transitions and clean grad norms — for a measured
    # 79.7 -> 70.4 ms estimator step (-12%).
    sym_bf16: bool = True
    # space-to-batch lowering of the PSPNet's dilated layer-3/4 blocks
    # (mathematically exact, param-compatible — models/resnet.
    # BasicBlockPlain); flip only behind an on-chip A/B win (bench_blocks)
    dil_s2b: bool = False
    # mesh data parallelism: 'auto' (engage when >1 device — parity with the
    # reference's always-DataParallel PSPNet, DenseFusion/lib/network.py:33),
    # 'on', 'off'
    data_parallel: str = "auto"
    # global-norm gradient clip (see make_optimizer; <=0 disables)
    grad_clip: float = 10.0


def make_optimizer(lr: float,
                   clip: float = 10.0) -> optax.GradientTransformation:
    """Adam behind a global-norm gradient clip (deviation from the
    reference's bare Adam, train.py:90-101: healthy DenseFusion grad norms
    sit at 1-6, and a single pathological spike inflates Adam's second
    moment enough to stall training for dozens of epochs afterwards — the
    round-4 multi-object run lost ~60 epochs to exactly that. The clip is a
    no-op on healthy steps; clip<=0 restores the bare reference optimizer)."""
    adam = optax.inject_hyperparams(optax.adam)(learning_rate=lr)
    if clip and clip > 0:
        return optax.chain(optax.clip_by_global_norm(clip), adam)
    return adam


def set_lr(opt_state, lr: float):
    states = ((opt_state,) if hasattr(opt_state, "hyperparams")
              else tuple(opt_state))
    for s in states:
        if hasattr(s, "hyperparams"):
            s.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state


@functools.partial(jax.jit, static_argnames=("posenet", "tx", "with_sym",
                                             "sym_bf16"),
                   donate_argnames=("pose_vars", "opt_state"))
def estimator_step(pose_vars, opt_state, batch, w, posenet, tx,
                   with_sym: bool = True, sym_bf16: bool = False):
    """One estimator phase step. batch: img (B,S,S,3) normalized, cloud
    (B,N,3), choose (B,N), target (B,M,3), model_points (B,M,3), obj_idx (B,),
    is_sym (B,). Returns (vars, opt_state, metrics)."""

    def loss_fn(params):
        variables = {**pose_vars, "params": params}
        pred_r, pred_t, pred_c, _ = posenet.apply(
            variables, batch["img"], batch["cloud"], batch["choose"],
            batch["obj_idx"], train=True,
            rngs={"dropout": batch["dropout_rng"]})
        out = losses.pose_loss(
            pred_r, pred_t, pred_c, batch["target"], batch["model_points"],
            batch["cloud"], batch["is_sym"], w=w, with_sym=with_sym,
            sym_bf16=sym_bf16)
        return out.loss, out.dis

    (loss, dis), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        pose_vars["params"])
    updates, opt_state = tx.update(grads, opt_state, pose_vars["params"])
    params = optax.apply_updates(pose_vars["params"], updates)
    new_vars = {**pose_vars, "params": params}
    return new_vars, opt_state, {"loss": loss, "dis": jnp.mean(dis),
                                 "gnorm": optax.global_norm(grads)}


@functools.partial(jax.jit, static_argnames=("posenet", "refiner", "tx",
                                             "iteration", "with_sym"),
                   donate_argnames=("refine_vars", "opt_state"))
def refiner_step(pose_vars, refine_vars, opt_state, batch, w, posenet,
                 refiner, tx, iteration: int = 2, with_sym: bool = True):
    """One refiner phase step: frozen estimator forward, then `iteration`
    rebased refine iterations with summed distance loss."""
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, batch["img"], batch["cloud"], batch["choose"],
        batch["obj_idx"], train=False)
    est = losses.pose_loss(
        pred_r, pred_t, pred_c, batch["target"], batch["model_points"],
        batch["cloud"], batch["is_sym"], w=w, with_sym=with_sym)

    def loss_fn(params):
        variables = {**refine_vars, "params": params}
        new_points, new_target = est.new_points, est.new_target
        total = 0.0
        last_dis = None
        for _ in range(iteration):
            dr, dt = refiner.apply(variables, new_points, emb,
                                   batch["obj_idx"])
            mean_dis, dis, new_points, new_target = losses.refine_loss(
                dr, dt, new_target, batch["model_points"], new_points,
                batch["is_sym"], with_sym=with_sym)
            total = total + mean_dis
            last_dis = dis
        return total, last_dis

    (_, dis), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        refine_vars["params"])
    updates, opt_state = tx.update(grads, opt_state, refine_vars["params"])
    params = optax.apply_updates(refine_vars["params"], updates)
    new_vars = {**refine_vars, "params": params}
    return new_vars, opt_state, {"dis": jnp.mean(dis)}


@functools.partial(jax.jit, static_argnames=("posenet", "refiner",
                                             "refine_start", "iteration",
                                             "with_sym"))
def eval_step(pose_vars, refine_vars, batch, w, posenet, refiner,
              refine_start: bool = False, iteration: int = 2,
              with_sym: bool = True):
    """Per-sample test distances (the reference's per-epoch test loop /
    experiments/eval.py semantics: refine iterations rebase each time)."""
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, batch["img"], batch["cloud"], batch["choose"],
        batch["obj_idx"], train=False)
    est = losses.pose_loss(
        pred_r, pred_t, pred_c, batch["target"], batch["model_points"],
        batch["cloud"], batch["is_sym"], w=w, with_sym=with_sym)
    dis = est.dis
    if refine_start:
        new_points, new_target = est.new_points, est.new_target
        for _ in range(iteration):
            dr, dt = refiner.apply(refine_vars, new_points, emb,
                                   batch["obj_idx"])
            _, dis, new_points, new_target = losses.refine_loss(
                dr, dt, new_target, batch["model_points"], new_points,
                batch["is_sym"], with_sym=with_sym)
    return dis


@functools.partial(jax.jit, static_argnames=("posenet", "refiner",
                                             "refine_start", "iteration",
                                             "with_sym"))
def eval_step_full(pose_vars, refine_vars, batch, w, posenet, refiner,
                   refine_start: bool = False, iteration: int = 2,
                   with_sym: bool = True):
    """eval_step plus the composed predicted pose (quat, trans). ADD-S on
    (near-)symmetric objects absorbs translation error, so grasp-relevant
    evaluation also needs the raw predicted pose to compare against the
    batch's target_t/target_r."""
    pred_r, pred_t, pred_c, emb = posenet.apply(
        pose_vars, batch["img"], batch["cloud"], batch["choose"],
        batch["obj_idx"], train=False)
    est = losses.pose_loss(
        pred_r, pred_t, pred_c, batch["target"], batch["model_points"],
        batch["cloud"], batch["is_sym"], w=w, with_sym=with_sym)
    dis = est.dis
    quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c,
                                              batch["cloud"])
    if refine_start:
        new_points, new_target = est.new_points, est.new_target
        for _ in range(iteration):
            dr, dt = refiner.apply(refine_vars, new_points, emb,
                                   batch["obj_idx"])
            _, dis, new_points, new_target = losses.refine_loss(
                dr, dt, new_target, batch["model_points"], new_points,
                batch["is_sym"], with_sym=with_sym)
            quat, trans = losses.compose_refined(dr, dt, quat, trans)
    return dis, quat, trans


@dataclass
class TrainerState:
    """Host-side two-phase state machine."""

    cfg: DFConfig
    posenet: Any
    refiner: Any
    pose_vars: Any
    refine_vars: Any
    tx: Any
    opt_state: Any
    refine_tx: Any = None
    refine_opt_state: Any = None
    decay_start: bool = False
    refine_start: bool = False
    best_test: float = float("inf")
    lr: float = 1e-4
    w: float = 0.015

    def maybe_transition(self, epoch: int) -> None:
        """train.py:396-420 phase machine."""
        cfg = self.cfg
        if self.best_test < cfg.decay_margin and not self.decay_start:
            self.decay_start = True
            self.lr *= cfg.lr_rate
            self.w *= cfg.w_rate
            self.opt_state = set_lr(self.opt_state, self.lr)
        if ((self.best_test < cfg.refine_margin
             or epoch >= cfg.refine_epoch_margin) and not self.refine_start):
            self.refine_start = True
            self.refine_tx = make_optimizer(
                self.lr, getattr(cfg, 'grad_clip', 10.0))
            self.refine_opt_state = self.refine_tx.init(
                self.refine_vars["params"])


def create_trainer(num_obj: int, cfg: Optional[DFConfig] = None,
                   crop: int = 320, dtype=jnp.bfloat16,
                   seed: int = 0) -> TrainerState:
    cfg = cfg or DFConfig()
    posenet = densefusion.PoseNet(num_obj=num_obj, dtype=dtype,
                                  dil_s2b=cfg.dil_s2b)
    refiner = densefusion.PoseRefineNet(num_obj=num_obj, dtype=dtype)
    k0, k1 = jax.random.split(jax.random.PRNGKey(seed))
    n, m = cfg.num_points, cfg.num_points_mesh
    pose_vars = posenet.init(
        k0, jnp.zeros((1, crop, crop, 3)), jnp.zeros((1, n, 3)),
        jnp.zeros((1, n), jnp.int32), jnp.zeros((1,), jnp.int32))
    refine_vars = refiner.init(
        k1, jnp.zeros((1, n, 3)), jnp.zeros((1, n, 32)),
        jnp.zeros((1,), jnp.int32))
    tx = make_optimizer(cfg.lr, getattr(cfg, 'grad_clip', 10.0))
    opt_state = tx.init(pose_vars["params"])
    return TrainerState(cfg, posenet, refiner, pose_vars, refine_vars,
                        tx, opt_state, lr=cfg.lr, w=cfg.w)


def train(state: TrainerState, train_batches: Iterable, test_batches,
          out_dir: str, log_dir: Optional[str] = None,
          epochs: Optional[int] = None,
          epoch_callback=None, save_resume: bool = True,
          image_dump_dir: Optional[str] = None,
          image_batches=None, image_every: int = 1) -> TrainerState:
    """The full two-phase loop over batch iterables (each yields batch dicts).

    `train_batches`/`test_batches` are callables returning fresh iterators
    per epoch (our data loaders). Artifacts: pose_model.npz /
    pose_refine_model.npz on best test distance + losses.json curves, plus a
    per-epoch `trainer_resume.npz` snapshot (vars + optimizer + phase state)
    that `resume_trainer` restores exactly (reference --start_epoch
    semantics, train.py:48, extended to reproduce the uninterrupted run).
    """
    cfg = state.cfg
    os.makedirs(out_dir, exist_ok=True)
    log = JsonCurveLog(os.path.join(log_dir or out_dir, "losses.json"))

    from ..parallel import mesh as mesh_lib
    mesh = mesh_lib.auto_mesh(getattr(cfg, "data_parallel", "auto"))
    if mesh is not None:
        state.pose_vars = mesh_lib.replicate_params(mesh, state.pose_vars)
        state.refine_vars = mesh_lib.replicate_params(mesh, state.refine_vars)
        state.opt_state = mesh_lib.replicate_params(mesh, state.opt_state)
        if state.refine_opt_state is not None:
            state.refine_opt_state = mesh_lib.replicate_params(
                mesh, state.refine_opt_state)

    for epoch in range(cfg.start_epoch, (epochs or cfg.nepoch)):
        t0 = time.time()
        # per-epoch derived stream so a resumed run replays the identical
        # dropout/noise sequence the uninterrupted run would have used
        rng = jax.random.fold_in(jax.random.PRNGKey(1234), epoch)
        epoch_losses, epoch_dis, epoch_gnorms = [], [], []
        for batch in train_batches():
            rng, sub = jax.random.split(rng)
            batch = dict(batch)
            batch["dropout_rng"] = sub
            if mesh is not None:
                batch = mesh_lib.shard_batch_data(mesh, batch)
            if state.refine_start:
                state.refine_vars, state.refine_opt_state, metrics = \
                    refiner_step(state.pose_vars, state.refine_vars,
                                 state.refine_opt_state, batch, state.w,
                                 state.posenet, state.refiner,
                                 state.refine_tx, cfg.iteration,
                                 cfg.with_sym)
                epoch_losses.append(0.0)
            else:
                state.pose_vars, state.opt_state, metrics = estimator_step(
                    state.pose_vars, state.opt_state, batch, state.w,
                    state.posenet, state.tx, cfg.with_sym,
                    getattr(cfg, "sym_bf16", False))
                epoch_losses.append(float(metrics["loss"]))
                epoch_gnorms.append(float(metrics["gnorm"]))
            epoch_dis.append(float(metrics["dis"]))

        test_dis, test_terr = [], []
        for batch in test_batches():
            if mesh is not None:
                batch = mesh_lib.shard_batch_data(mesh, batch)
            if "target_t" in batch:
                dis, _, trans = eval_step_full(
                    state.pose_vars, state.refine_vars, batch, state.w,
                    state.posenet, state.refiner, state.refine_start,
                    cfg.iteration, cfg.with_sym)
                test_terr.extend(np.linalg.norm(
                    np.asarray(trans) - np.asarray(batch["target_t"]),
                    axis=1).tolist())
            else:
                dis = eval_step(state.pose_vars, state.refine_vars, batch,
                                state.w, state.posenet, state.refiner,
                                state.refine_start, cfg.iteration,
                                cfg.with_sym)
            test_dis.extend(np.asarray(dis).tolist())
        test_mean = float(np.mean(test_dis)) if test_dis else float("inf")

        log.append(losses=float(np.mean(epoch_losses or [0.0])),
                   train_dists=float(np.mean(epoch_dis or [0.0])),
                   grad_norm_max=float(np.max(epoch_gnorms or [0.0])),
                   test_dists=test_mean,
                   test_t_errs=float(np.mean(test_terr)) if test_terr
                   else float("nan"),
                   epoch_seconds=time.time() - t0)

        if test_mean <= state.best_test:
            state.best_test = test_mean
            if state.refine_start:
                checkpoints.save_checkpoint(
                    os.path.join(out_dir, "pose_refine_model"),
                    state.refine_vars, meta={"epoch": epoch,
                                             "test_dis": test_mean})
            else:
                checkpoints.save_checkpoint(
                    os.path.join(out_dir, "pose_model"),
                    state.pose_vars, meta={"epoch": epoch,
                                           "test_dis": test_mean})

        state.maybe_transition(epoch)
        if save_resume:
            save_trainer_snapshot(state, out_dir, next_epoch=epoch + 1)
        if (image_dump_dir and image_batches is not None
                and epoch % max(image_every, 1) == 0):
            os.makedirs(image_dump_dir, exist_ok=True)
            dump_pose_images(state, image_batches, os.path.join(
                image_dump_dir, f"test_images_epoch_{epoch}.png"))
            plot_loss_curves(log, os.path.join(image_dump_dir, "losses.png"))
        if epoch_callback is not None:
            epoch_callback(state, epoch, test_mean)
    return state


def dump_pose_images(state: TrainerState, batches, path: str,
                     max_panels: int = 8) -> None:
    """(target reprojection | prediction reprojection) panel dump per epoch —
    the reference's test_images_epoch_<N>.png grids
    (/root/reference/DenseFusion/tools/train.py:256-317). `batches` yields
    test batches with return_raw extras (raw_img + intr)."""
    from ..pipeline.visualize import pointcloud2image
    from ..utils import io as io_utils
    from ..utils import transforms as T

    panels = []
    for batch in batches():
        pred_r, pred_t, pred_c, emb = state.posenet.apply(
            state.pose_vars, batch["img"], batch["cloud"], batch["choose"],
            batch["obj_idx"], train=False)
        quat, trans = losses.estimator_prediction(pred_r, pred_t, pred_c,
                                                  batch["cloud"])
        if state.refine_start and state.refine_vars is not None:
            new_points = losses.rebase_points(quat, trans, batch["cloud"])
            for _ in range(state.cfg.iteration):
                dr, dt = state.refiner.apply(state.refine_vars, new_points,
                                             emb, batch["obj_idx"])
                quat, trans = losses.compose_refined(dr, dt, quat, trans)
                new_points = losses.rebase_points(quat, trans, batch["cloud"])
        rot = np.asarray(T.quat_to_mat(quat))
        trans_np = np.asarray(trans)
        n = len(np.asarray(batch["obj_idx"]))
        for i in range(n):
            if len(panels) >= max_panels:
                break
            raw = np.asarray(batch["raw_img"][i])
            fx, fy, ppx, ppy = np.asarray(batch["intr"][i]).tolist()
            intr = {"fx": fx, "fy": fy, "ppx": ppx, "ppy": ppy}
            mp = np.asarray(batch["model_points"][i])
            pred_pts = mp @ rot[i].T + trans_np[i]
            img_t = pointcloud2image(raw, np.asarray(batch["target"][i]), 3,
                                     intr, color=(0, 255, 0))
            img_p = pointcloud2image(raw, pred_pts, 3, intr,
                                     color=(255, 0, 0))
            panels.append(np.concatenate([img_t, img_p], axis=1))
        if len(panels) >= max_panels:
            break
    if panels:
        io_utils.write_png(path, np.concatenate(panels, axis=0)
                           .astype(np.uint8))


def plot_loss_curves(log: JsonCurveLog, path: str) -> None:
    """losses.png curve panel (reference train.py:329-353)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    curves = log.data["curves"]
    fig, axs = plt.subplots(2, 2, constrained_layout=True, figsize=(12, 8))
    for ax, (key, title, ylabel) in zip(axs.flat, [
            ("losses", "Training estimator loss", "Loss"),
            ("train_dists", "Training Avg. distance", "Avg. distance [m]"),
            ("test_dists", "Test Avg. distance", "Avg. distance [m]"),
            ("epoch_seconds", "Epoch wall time", "seconds")]):
        ax.plot(curves.get(key, []))
        ax.set_title(title)
        ax.set_xlabel("Epochs")
        ax.set_ylabel(ylabel)
    fig.savefig(path)
    plt.close(fig)


def save_trainer_snapshot(state: TrainerState, out_dir: str,
                          next_epoch: int) -> None:
    """Full mid-run snapshot: variables, optimizer states, phase machine."""
    opt = {"est": state.opt_state}
    if state.refine_opt_state is not None:
        opt["refine"] = state.refine_opt_state
    checkpoints.save_checkpoint(
        os.path.join(out_dir, "trainer_resume"),
        {"pose_vars": state.pose_vars, "refine_vars": state.refine_vars},
        meta={"epoch": next_epoch, "best_test": state.best_test,
              "decay_start": state.decay_start,
              "refine_start": state.refine_start,
              "lr": state.lr, "w": state.w},
        opt_state=opt)


def resume_trainer(state: TrainerState, out_dir: str) -> TrainerState:
    """Restore the `trainer_resume` snapshot written by train() so
    cfg.start_epoch > 1 continues exactly where an interrupted run stopped
    (the reference reloads bare state_dicts for --start_epoch, train.py:48;
    we also restore optimizer + phase state so the next step is identical)."""
    import json as _json

    path = os.path.join(out_dir, "trainer_resume")
    with open(path + ".npz.meta.json") as f:
        meta = _json.load(f)
    state.decay_start = bool(meta["decay_start"])
    state.refine_start = bool(meta["refine_start"])
    state.best_test = float(meta["best_test"])
    state.lr = float(meta["lr"])
    state.w = float(meta["w"])
    state.opt_state = set_lr(state.opt_state, state.lr)
    if state.refine_start and state.refine_opt_state is None:
        state.refine_tx = make_optimizer(
            state.lr, getattr(state.cfg, 'grad_clip', 10.0))
        state.refine_opt_state = state.refine_tx.init(
            state.refine_vars["params"])
    like_opt = {"est": state.opt_state}
    if state.refine_opt_state is not None:
        like_opt["refine"] = state.refine_opt_state
    out = checkpoints.load_checkpoint(
        path, {"pose_vars": state.pose_vars,
               "refine_vars": state.refine_vars}, like_opt)
    state.pose_vars = jax.tree_util.tree_map(
        jnp.asarray, out["variables"]["pose_vars"])
    state.refine_vars = jax.tree_util.tree_map(
        jnp.asarray, out["variables"]["refine_vars"])
    state.opt_state = out["opt_state"]["est"]
    if state.refine_opt_state is not None:
        state.refine_opt_state = out["opt_state"]["refine"]
    state.cfg.start_epoch = int(meta["epoch"])
    return state


def warm_start(state: TrainerState, posenet_path: str,
               refinenet_path: Optional[str] = None) -> TrainerState:
    """load_pretrained parity (/root/reference/DenseFusion/tools/train.py:
    109-134): import upstream torch .pth weights (or our .npz checkpoints)
    with final per-object head re-init when the object count differs, and
    reset the optimizer."""
    from ..models import torch_import as ti

    num_obj = state.posenet.num_obj

    def load(path, kind):
        if path.endswith(".pth"):
            sd = ti.load_pth(path)
            fn = (ti.warm_start_posenet if kind == "pose"
                  else ti.warm_start_refinenet)
            v = fn(sd, num_obj)
        else:
            like = state.pose_vars if kind == "pose" else state.refine_vars
            v = checkpoints.load_checkpoint(path, like)["variables"]
        return jax.tree_util.tree_map(jnp.asarray, v)

    state.pose_vars = load(posenet_path, "pose")
    state.opt_state = state.tx.init(state.pose_vars["params"])
    if refinenet_path:
        state.refine_vars = load(refinenet_path, "refine")
        if state.refine_tx is not None:
            state.refine_opt_state = state.refine_tx.init(
                state.refine_vars["params"])
    return state
