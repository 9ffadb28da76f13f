"""Legacy vanilla-SegNet training loop + file logger.

Parity with /root/reference/DenseFusion/vanilla_segmentation/train.py and the
`setup_logger` file logger (/root/reference/DenseFusion/lib/utils.py:1-14):
Adam(lr 1e-4), per-batch CE-loss log lines into per-epoch
`epoch_<N>_log.txt` / `epoch_<N>_test_log.txt` files, periodic
`model_current` saves, best-test-CE checkpoints named
`model_<epoch>_<cost>`, and `resume_model` (which also clears old logs,
train.py:52-56). The TPU-native differences: batched jitted train/eval steps
instead of per-sample CUDA calls, .npz checkpoints instead of .pth.
"""
from __future__ import annotations

import functools
import logging
import os
import time
from typing import Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import segnet as segnet_mod
from . import checkpoints


def setup_logger(logger_name: str, log_file: str,
                 level=logging.INFO) -> logging.Logger:
    """File+stream logger, reference lib/utils.py:1-14 semantics (mode='w')."""
    logger = logging.getLogger(logger_name)
    logger.handlers.clear()
    formatter = logging.Formatter("%(asctime)s : %(message)s")
    fh = logging.FileHandler(log_file, mode="w")
    fh.setFormatter(formatter)
    logger.setLevel(level)
    logger.addHandler(fh)
    logger.propagate = False
    return logger


@functools.partial(jax.jit, static_argnames=("model", "tx"),
                   donate_argnames=("variables", "opt_state"))
def _train_step(variables, opt_state, batch, model, tx):
    def loss_fn(params):
        logits, updated = model.apply(
            {**variables, "params": params}, batch["image"], train=True,
            mutable=["batch_stats"])
        return segnet_mod.cross_entropy_loss(batch["label"], logits), updated

    (loss, updated), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    updates, opt_state = tx.update(grads, opt_state, variables["params"])
    params = optax.apply_updates(variables["params"], updates)
    return ({**variables, "params": params, **updated}, opt_state, loss)


@functools.partial(jax.jit, static_argnames=("model",))
def _eval_step(variables, batch, model):
    logits = model.apply(variables, batch["image"], train=False)
    return segnet_mod.cross_entropy_loss(batch["label"], logits)


def train_vanilla_segnet(train_batches: Callable[[], Iterable],
                         test_batches: Callable[[], Iterable],
                         n_classes: int,
                         n_epochs: int = 600,
                         lr: float = 1e-4,
                         log_dir: str = "logs",
                         model_save_path: str = "trained_models",
                         resume_model: str = "",
                         save_every: int = 1000,
                         dtype=jnp.float32,
                         seed: int = 0,
                         sample_shape=(480, 640)):
    """Returns {'variables', 'best_val_cost', 'epochs_run'}."""
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(model_save_path, exist_ok=True)
    model = segnet_mod.SegNet(classes=n_classes, dtype=dtype)
    variables = dict(model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1,) + tuple(sample_shape) + (3,), jnp.float32)))
    tx = optax.adam(lr)

    if resume_model:
        out = checkpoints.load_checkpoint(
            os.path.join(model_save_path, resume_model), variables)
        variables = out["variables"]
        for f in os.listdir(log_dir):  # reference clears old logs on resume
            os.remove(os.path.join(log_dir, f))

    opt_state = tx.init(variables["params"])
    best_val_cost = np.inf
    st_time = time.time()

    def stamp():
        return time.strftime("%Hh %Mm %Ss", time.gmtime(time.time() - st_time))

    for epoch in range(1, n_epochs):
        logger = setup_logger(
            f"epoch{epoch}", os.path.join(log_dir, f"epoch_{epoch}_log.txt"))
        logger.info(f"Train time {stamp()}, Training started")
        train_all_cost = 0.0
        train_time = 0
        for batch in train_batches():
            variables, opt_state, loss = _train_step(
                variables, opt_state, batch, model, tx)
            loss = float(loss)
            train_all_cost += loss
            logger.info(f"Train time {stamp()} Batch {train_time} "
                        f"CEloss {loss}")
            if train_time != 0 and train_time % save_every == 0:
                checkpoints.save_checkpoint(
                    os.path.join(model_save_path, "model_current"), variables)
            train_time += 1
        train_all_cost /= max(train_time, 1)
        logger.info(f"Train Finish Avg CEloss: {train_all_cost}")

        logger = setup_logger(
            f"epoch{epoch}_test",
            os.path.join(log_dir, f"epoch_{epoch}_test_log.txt"))
        logger.info(f"Test time {stamp()}, Testing started")
        test_all_cost = 0.0
        test_time = 0
        for batch in test_batches():
            loss = float(_eval_step(variables, batch, model))
            test_all_cost += loss
            test_time += 1
            logger.info(f"Test time {stamp()} Batch {test_time} "
                        f"CEloss {loss}")
        test_all_cost /= max(test_time, 1)
        logger.info(f"Test Finish Avg CEloss: {test_all_cost}")

        if test_all_cost <= best_val_cost:
            best_val_cost = test_all_cost
            checkpoints.save_checkpoint(
                os.path.join(model_save_path,
                             f"model_{epoch}_{test_all_cost}"), variables)

    return {"variables": variables, "best_val_cost": best_val_cost,
            "epochs_run": n_epochs - 1}
