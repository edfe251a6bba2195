"""Utility-layer tests: checkpoint manager, loggers, split helpers."""

import logging
import os

import numpy as np
import pytest

from pdgn_tpu.data import (
    Subset,
    get_data_iterator,
    get_train_val_test_datasets,
    random_split,
    split_sizes,
)
from pdgn_tpu.utils import (
    BlackHole,
    CheckpointManager,
    get_logger,
    int_list,
    int_tuple,
    seed_all,
    str_list,
    str_tuple,
)


def test_blackhole_swallows_everything():
    bh = BlackHole()
    bh.anything = 5
    assert bh.foo.bar(1, 2, x=3) is bh


def test_seed_all_reproducible():
    seed_all(123)
    a = np.random.rand(5)
    seed_all(123)
    b = np.random.rand(5)
    np.testing.assert_array_equal(a, b)


def test_get_logger_writes_file(tmp_path):
    logger = get_logger("t", str(tmp_path))
    logger.info("hello world")
    for h in logger.handlers:
        h.flush()
    assert "hello world" in open(tmp_path / "log.txt").read()
    logging.getLogger("t").handlers.clear()


def test_arg_parsers():
    assert int_tuple("1,2,3") == (1, 2, 3)
    assert str_tuple("a,b") == ("a", "b")
    assert int_list("4,5") == [4, 5]
    assert str_list("x,y") == ["x", "y"]


def test_checkpoint_manager_keeps_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path), max_to_keep=2)
    state = {"w": np.arange(4, dtype=np.float32)}
    assert mgr.save(state, score=3.0, step=1)
    assert mgr.save({"w": np.ones(4, np.float32)}, score=1.0, step=2)
    # worse than both kept scores -> rejected
    assert not mgr.save(state, score=9.0, step=3)
    # better -> replaces the worst
    assert mgr.save({"w": np.zeros(4, np.float32)}, score=0.5, step=4)
    assert len(mgr.ckpts) == 2
    best = mgr.load_best()
    np.testing.assert_array_equal(best["w"], np.zeros(4))
    latest = mgr.load_latest()
    np.testing.assert_array_equal(latest["w"], np.zeros(4))

    # a fresh manager re-scans the directory
    mgr2 = CheckpointManager(str(tmp_path), max_to_keep=2)
    assert len(mgr2.ckpts) == 2


def test_split_helpers():
    assert split_sizes(100, 0.8, 0.1) == (80, 10, 10)
    ds = list(range(20))
    tr, va, te = get_train_val_test_datasets(ds, 0.7, 0.2, seed=0)
    assert (len(tr), len(va), len(te)) == (14, 4, 2)
    all_items = sorted([tr[i] for i in range(len(tr))]
                       + [va[i] for i in range(len(va))]
                       + [te[i] for i in range(len(te))])
    assert all_items == ds
    # deterministic
    tr2, _, _ = get_train_val_test_datasets(ds, 0.7, 0.2, seed=0)
    assert [tr[i] for i in range(len(tr))] == [tr2[i] for i in range(len(tr2))]


def test_subset_and_random_split():
    ds = list(range(10))
    s = Subset(ds, [3, 1, 4])
    assert len(s) == 3 and s[0] == 3 and s[2] == 4
    a, b = random_split(ds, [6, 4], seed=1)
    assert len(a) == 6 and len(b) == 4


def test_infinite_iterator():
    it = get_data_iterator([1, 2])
    assert [next(it) for _ in range(5)] == [1, 2, 1, 2, 1]


def test_log_hyperparams_both_writer_styles():
    """Reference utils/misc.py:156-162 equivalent: hparams via
    add_hparams when available, else a text summary."""
    from pdgn_tpu.utils import log_hyperparams

    import argparse

    args = argparse.Namespace(batch_size=50, network="PDGNet_v2",
                              choice=None)

    class TextWriter:
        def __init__(self):
            self.texts = []

        def add_text(self, tag, text):
            self.texts.append((tag, text))

    class HParamWriter(TextWriter):
        def add_hparams(self, hparams, metrics):
            self.hparams = hparams

    w = TextWriter()
    log_hyperparams(w, args)
    assert "batch_size: 50" in w.texts[0][1]

    w2 = HParamWriter()
    log_hyperparams(w2, args)
    assert w2.hparams["network"] == "PDGNet_v2"
    assert w2.hparams["choice"] == "None"   # non-strings repr'd
