"""Logging, seeding and checkpoint-manager utilities.

TPU-native equivalents of reference utils/misc.py: ``get_logger``
(:115-131), ``seed_all`` (:109-112, minus torch), ``BlackHole`` (:13-19),
``CheckpointManager`` (:22-106) and the small argparse helpers
(:140-154).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import numpy as np


class BlackHole:
    """Accepts any attribute access/call and does nothing."""

    def __setattr__(self, name, value):
        pass

    def __call__(self, *args, **kwargs):
        return self

    def __getattr__(self, name):
        return self


def seed_all(seed: int) -> None:
    """Seed python + numpy RNGs (reference seeds torch too; JAX RNG keys
    are explicit so there is no global device RNG to seed)."""
    import random

    random.seed(seed)
    np.random.seed(seed)


def get_logger(name: str, log_dir: Optional[str] = None) -> logging.Logger:
    """Stream+file logger with the reference's format string."""
    logger = logging.getLogger(name)
    logger.setLevel(logging.DEBUG)
    logger.handlers.clear()
    formatter = logging.Formatter(
        "[%(asctime)s::%(name)s::%(levelname)s] %(message)s"
    )
    stream_handler = logging.StreamHandler()
    stream_handler.setLevel(logging.DEBUG)
    stream_handler.setFormatter(formatter)
    logger.addHandler(stream_handler)
    if log_dir is not None:
        file_handler = logging.FileHandler(
            os.path.join(log_dir, "log.txt"))
        file_handler.setLevel(logging.INFO)
        file_handler.setFormatter(formatter)
        logger.addHandler(file_handler)
    return logger


def get_new_log_dir(root: str = "./logs", postfix: str = "",
                    prefix: str = "") -> str:
    log_dir = os.path.join(
        root, prefix + time.strftime("%Y_%m_%d__%H_%M_%S", time.localtime())
        + postfix,
    )
    os.makedirs(log_dir, exist_ok=True)
    return log_dir


def int_tuple(argstr: str):
    return tuple(map(int, argstr.split(",")))


def str_tuple(argstr: str):
    return tuple(argstr.split(","))


def int_list(argstr: str):
    return list(map(int, argstr.split(",")))


def str_list(argstr: str):
    return list(argstr.split(","))


class CheckpointManager:
    """Score-indexed checkpoint directory (reference utils/misc.py:22-106).

    Keeps the best-``max_to_keep`` checkpoints by score; delegates the
    actual (de)serialisation to pdgn_tpu.train.checkpoint.
    """

    def __init__(self, save_dir: str, max_to_keep: int = 5,
                 logger=BlackHole()):
        self.save_dir = save_dir
        self.max_to_keep = max_to_keep
        self.logger = logger
        os.makedirs(save_dir, exist_ok=True)
        self.ckpts = []  # list of dicts {score, file, iteration}
        for f in os.listdir(save_dir):
            if f[:4] != "ckpt":
                continue
            _, score, it = f.split("_")
            self.ckpts.append(
                {"score": float(score), "file": f, "iteration": int(it)}
            )

    def get_worst_ckpt_idx(self):
        idx = -1
        worst = float("-inf")
        for i, ckpt in enumerate(self.ckpts):
            if ckpt["score"] >= worst:
                idx = i
                worst = ckpt["score"]
        return idx if idx >= 0 else None

    def get_best_ckpt_idx(self):
        idx = -1
        best = float("inf")
        for i, ckpt in enumerate(self.ckpts):
            if ckpt["score"] <= best:
                idx = i
                best = ckpt["score"]
        return idx if idx >= 0 else None

    def get_latest_ckpt_idx(self):
        idx = -1
        latest_it = -1
        for i, ckpt in enumerate(self.ckpts):
            if ckpt["iteration"] > latest_it:
                idx = i
                latest_it = ckpt["iteration"]
        return idx if idx >= 0 else None

    def save(self, state, score: float, step: Optional[int] = None) -> bool:
        from pdgn_tpu.train.checkpoint import save_state

        if step is None:
            step = int(time.time())
        fname = "ckpt_%.6f_%d" % (float(score), step)

        if len(self.ckpts) >= self.max_to_keep:
            idx = self.get_worst_ckpt_idx()
            if idx is not None and self.ckpts[idx]["score"] <= score:
                return False
            if idx is not None:
                old = self.ckpts.pop(idx)
                try:
                    os.remove(os.path.join(self.save_dir, old["file"]))
                except OSError:
                    pass

        save_state(os.path.join(self.save_dir, fname), state)
        self.ckpts.append({"score": float(score), "file": fname,
                           "iteration": step})
        return True

    def load_best(self):
        from pdgn_tpu.train.checkpoint import load_state

        idx = self.get_best_ckpt_idx()
        if idx is None:
            raise IOError("No checkpoints found.")
        return load_state(os.path.join(self.save_dir, self.ckpts[idx]["file"]))

    def load_latest(self):
        from pdgn_tpu.train.checkpoint import load_state

        idx = self.get_latest_ckpt_idx()
        if idx is None:
            raise IOError("No checkpoints found.")
        return load_state(os.path.join(self.save_dir, self.ckpts[idx]["file"]))


def log_hyperparams(writer, args) -> None:
    """Record experiment hyperparameters with a summary writer.

    Equivalent of reference ``utils/misc.py:156-162`` (``log_hyperparams``
    — unused by the reference trainer itself). Accepts any writer exposing
    tensorboardX/torch-style ``add_hparams`` (e.g. ``tensorboardX
    .SummaryWriter``); values that are not strings are ``repr``'d, like
    the reference. Falls back to a plain-text summary via ``add_text``
    when ``add_hparams`` is unavailable.
    """
    vars_args = {k: v if isinstance(v, str) else repr(v)
                 for k, v in vars(args).items()}
    if hasattr(writer, "add_hparams"):
        writer.add_hparams(vars_args, {})
        return
    text = "\n".join(f"{k}: {v}" for k, v in sorted(vars_args.items()))
    writer.add_text("hyperparams", text)
