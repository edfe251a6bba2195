"""CLI flag-surface tests (reference main.py parity)."""

import pytest

from pdgn_tpu.cli import check_args, parse_args


def test_parse_args_defaults():
    args = parse_args(["--model_dir", "m", "--network", "PDGNet_v2"])
    assert args.batch_size == 50
    assert args.num_point == 2048
    assert args.num_k == 20
    assert args.learning_rate == 1e-4
    assert args.max_epoch == 300
    assert args.noise_dim == 128
    assert args.snapshot == 20
    assert args.normalize == "shape_bbox"
    assert args.seed == 9999
    assert args.dataset == "shapenet15k"
    assert args.softmax == "True"


def test_parse_args_requires_model_dir_and_network(capsys):
    with pytest.raises(SystemExit):
        parse_args(["--network", "PDGNet_v2"])
    with pytest.raises(SystemExit):
        parse_args(["--model_dir", "m"])


def test_parse_args_creates_checkpoint_dirs(tmp_path):
    ck = tmp_path / "ck"
    parse_args(["--model_dir", "mm", "--network", "PDGNet",
                "--checkpoint_dir", str(ck)])
    assert (ck / "mm").is_dir()


def test_normalize_choices(tmp_path):
    with pytest.raises(SystemExit):
        parse_args(["--model_dir", "m", "--network", "PDGNet_v2",
                    "--checkpoint_dir", str(tmp_path),
                    "--normalize", "bogus"])


def test_compute_dtype_flag():
    args = parse_args(["--model_dir", "m", "--network", "PDGNet_v2",
                       "--compute_dtype", "bfloat16"])
    assert args.compute_dtype == "bfloat16"
    args = parse_args(["--model_dir", "m", "--network", "PDGNet_v2"])
    assert args.compute_dtype is None


def test_sample_phase_dispatch(tmp_path, monkeypatch):
    """--phase sample wires num_samples + save_dir into trainer.generate."""
    import numpy as np

    import pdgn_tpu.cli as cli

    calls = {}

    class FakeTrainer:
        def __init__(self, cfg):
            calls["cfg"] = cfg

        def build_model(self):
            pass

        def generate(self, n, batch_size=None, out_path=None):
            calls["n"] = n
            calls["out_path"] = out_path
            return np.zeros((n, 4, 3), np.float32)

    monkeypatch.setattr("pdgn_tpu.train.PDGNTrainer", FakeTrainer)
    cli.main(["--network", "PDGNet_v2", "--phase", "sample",
              "--dataset", "synthetic", "--model_dir", "m",
              "--checkpoint_dir", str(tmp_path / "ckpt"),
              "--save_dir", str(tmp_path / "out"),
              "--num_samples", "7"])
    assert calls["n"] == 7
    assert calls["out_path"].endswith("samples_m_7.npy")
    assert calls["cfg"].phase == "sample"
