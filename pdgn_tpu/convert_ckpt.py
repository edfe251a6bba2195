"""Torch ``.pth`` -> flax msgpack checkpoint converter.

Imports the reference's published checkpoints (e.g. ``600_chair_G.pth`` /
``600_chair_D.pth``, reference README.md:50-58) into this framework's
two-bundle msgpack format (pdgn_tpu.train.checkpoint). Handles:

* the ``module.`` DataParallel prefix (reference models/PDGNet_v2.py:333-382
  loads state dicts saved from ``nn.DataParallel`` wrappers);
* torch->flax weight layout: ``nn.Linear (out, in)`` -> Dense ``(in, out)``,
  ``Conv1d/Conv2d 1x1`` -> Dense, the window conv ``(4F, 2C, 1, W)`` ->
  HWIO ``(1, W, 2C, 4F)``, and the merge conv ``(2F, 2C, 1, 2k)`` -> the
  flattened ``(2k*2C, 2F)`` slot-major Dense of the decomposed merge GEMM;
* BatchNorm naming (``weight/bias/running_mean/running_var`` ->
  ``scale/bias`` params + ``mean/var`` batch stats; ``num_batches_tracked``
  is dropped);
* the window-conv *block channel order*: this framework emits the window
  conv's output channels in block order (generator._block_channel_perm), so
  the four BN tensors that follow it are permuted on import;
* Adam moments: torch ``exp_avg``/``exp_avg_sq`` (indexed by parameter
  order) -> optax ``ScaleByAdamState.mu/nu`` with the same per-tensor
  layout transforms, so optimizer state survives the conversion.

CLI::

    python -m pdgn_tpu.convert_ckpt --ckpt-g 600_chair_G.pth \
        --ckpt-d 600_chair_D.pth --out-dir converted/

writes ``<epoch>_<category>_{G,D}.msgpack`` loadable by
``pdgn_tpu.train.checkpoint.load`` (and by the CLI's
``--pretrain_model_G/_D`` resume path).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Tuple

import numpy as np

from pdgn_tpu.models.generator import _block_channel_perm

_BUFFER_SUFFIXES = ("running_mean", "running_var", "num_batches_tracked")


# ---------------------------------------------------------------- transforms
def _t_linear(w):
    return np.ascontiguousarray(w.T)


def _t_conv1d(w):
    return np.ascontiguousarray(w[:, :, 0].T)


def _t_conv1x1(w):
    return np.ascontiguousarray(w[:, :, 0, 0].T)


def _t_window(w):
    # torch (out, in, 1, W) -> flax HWIO (1, W, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _t_merge(w):
    # torch (2F, 2C, 1, 2k) -> (2k*2C, 2F) slot-major (generator._merge_gemm)
    two_f, two_c, _, two_k = w.shape
    return np.ascontiguousarray(
        np.transpose(w[:, :, 0, :], (2, 1, 0)).reshape(two_k * two_c, two_f))


_WEIGHT_T = {
    "linear": _t_linear,
    "conv1d": _t_conv1d,
    "conv1x1": _t_conv1x1,
    "window": _t_window,
    "merge": _t_merge,
}


# ------------------------------------------------------------------ mappings
def generator_rules() -> List[Tuple[str, str, str]]:
    """(torch_prefix, kind, flax_dotted_prefix) for the v2 generator.

    Torch module names from reference models/PDGNet_v2.py:820-877 (and the
    bilateral blocks at :672-818); flax names from pdgn_tpu.models.generator.
    """
    rules: List[Tuple[str, str, str]] = [
        ("fc1.0", "linear", "fc1.dense"),
        ("fc1.1", "bn", "fc1_bn.bn"),
    ]
    for i in range(1, 5):
        b = f"bilateral{i}"
        # stage 1 wraps the edge conv in Sequential(edge_conv, BN, LeakyReLU)
        uc = f"{b}.upsample_cov.0" if i == 1 else f"{b}.upsample_cov"
        ours = f"{b}.upsample_cov"
        rules += [
            (f"{uc}.conv2.conv", "merge", f"{ours}.TorchDense_0.dense"),
            (f"{uc}.conv2.bn", "bn", f"{ours}.BatchNorm_0.bn"),
            (f"{uc}.inte_conv_hk.0", "window", f"{ours}._WindowConv_0.conv"),
            (f"{uc}.inte_conv_hk.1", "bn_block",
             f"{ours}._WindowConv_0.BatchNorm_0.bn"),
        ]
        if i == 1:
            rules.append((f"{b}.upsample_cov.1", "bn", f"{b}.bn_uc.bn"))
        else:
            rules += [
                (f"{uc}.conv_fea.0", "conv1x1", f"{ours}.conv_fea.dense"),
                (f"{uc}.conv_fea.1", "bn", f"{ours}.bn_fea.bn"),
                (f"{uc}.conv_xyz.0", "conv1x1", f"{ours}.conv_xyz.dense"),
                (f"{uc}.conv_xyz.1", "bn", f"{ours}.bn_xyz.bn"),
                (f"{uc}.conv_all.0", "conv1x1", f"{ours}.conv_all1.dense"),
                (f"{uc}.conv_all.1", "bn", f"{ours}.bn_all1.bn"),
                (f"{uc}.conv_all.3", "conv1x1", f"{ours}.conv_all2.dense"),
                (f"{uc}.conv_all.4", "bn", f"{ours}.bn_all2.bn"),
                (f"{b}.bn_uc", "bn", f"{b}.bn_uc.bn"),
            ]
        gb = f"{b}._GlobalBranch_0"
        rules += [
            (f"{b}.fc.0", "linear", f"{gb}.fc1.dense"),
            (f"{b}.fc.1", "bn", f"{gb}.bn_fc1.bn"),
            (f"{b}.fc.3", "linear", f"{gb}.fc2.dense"),
            (f"{b}.fc.4", "bn", f"{gb}.bn_fc2.bn"),
        ]
        if i < 4:
            rules += [
                (f"{b}.g_fc.0", "linear", f"{gb}.g_fc.dense"),
                (f"{b}.g_fc.1", "bn", f"{gb}.bn_g.bn"),
            ]
    for i in range(1, 5):
        for j, t in enumerate((0, 2, 4)):
            rules.append((f"mlp{i}.{t}", "conv1d",
                          f"mlp{i}.TorchDense_{j}.dense"))
    return rules


def discriminator_rules(sd: Dict[str, np.ndarray]) -> List[Tuple[str, str, str]]:
    """Rules for one discriminator, derived from its torch keys.

    The reference packs the point convs into a ``fc1`` Sequential
    (Conv1d at 0,3,6,... + BN at 1,4,7,...) and the head Linears into
    ``mlp`` (reference models/PDGNet_v2.py:884-1006); ours are
    ``conv{i}`` DenseBR blocks and ``fc{j}``/``fc_out`` TorchDenses.
    """
    conv_idx = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("fc1.") and k.endswith(".weight")
                       and sd[k].ndim == 3})
    lin_idx = sorted({int(k.split(".")[1]) for k in sd
                      if k.startswith("mlp.") and k.endswith(".weight")})
    rules: List[Tuple[str, str, str]] = []
    for n, t in enumerate(conv_idx, 1):
        rules.append((f"fc1.{t}", "conv1d", f"conv{n}.TorchDense_0.dense"))
        rules.append((f"fc1.{t + 1}", "bn", f"conv{n}.BatchNorm_0.bn"))
    names = [f"fc{j}" for j in range(1, len(lin_idx))] + ["fc_out"]
    for t, name in zip(lin_idx, names):
        rules.append((f"mlp.{t}", "linear", f"{name}.dense"))
    return rules


# ---------------------------------------------------------------- conversion
def _strip_module(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def _nest(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for k, v in flat.items():
        node = out
        parts = k.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


class _Mapper:
    """Expands (prefix, kind, flax_prefix) rules into per-tensor transforms."""

    def __init__(self, rules):
        self.params: Dict[str, Tuple[str, object]] = {}
        self.stats: Dict[str, Tuple[str, object]] = {}
        for prefix, kind, flax_prefix in rules:
            if kind in _WEIGHT_T:
                t = _WEIGHT_T[kind]
                self.params[f"{prefix}.weight"] = (f"{flax_prefix}.kernel", t)
                self.params[f"{prefix}.bias"] = (f"{flax_prefix}.bias", None)
            elif kind in ("bn", "bn_block"):
                perm = None
                if kind == "bn_block":
                    def perm(v):
                        return v[np.asarray(_block_channel_perm(v.shape[0]))]
                self.params[f"{prefix}.weight"] = (f"{flax_prefix}.scale", perm)
                self.params[f"{prefix}.bias"] = (f"{flax_prefix}.bias", perm)
                self.stats[f"{prefix}.running_mean"] = (f"{flax_prefix}.mean",
                                                        perm)
                self.stats[f"{prefix}.running_var"] = (f"{flax_prefix}.var",
                                                       perm)
            else:
                raise ValueError(kind)

    def convert_model(self, sd: Dict[str, np.ndarray]) -> Dict:
        params, stats = {}, {}
        seen = set()
        for k, v in sd.items():
            if k.endswith("num_batches_tracked"):
                continue
            v = np.asarray(v, dtype=np.float32)
            if k in self.params:
                path, t = self.params[k]
                params[path] = t(v) if t else v
            elif k in self.stats:
                path, t = self.stats[k]
                stats[path] = t(v) if t else v
            else:
                raise KeyError(f"unmapped torch key: {k}")
            seen.add(k)
        missing = (set(self.params) | set(self.stats)) - seen
        if missing:
            raise KeyError(f"torch checkpoint lacks keys: {sorted(missing)[:5]}")
        return {"params": _nest(params), "batch_stats": _nest(stats)}

    def convert_adam(self, sd: Dict[str, np.ndarray], opt_sd: Dict) -> Dict:
        """Torch Adam state -> optax chain(scale_by_adam, scale) state dict."""
        torch_params = [k for k in sd
                        if not k.endswith(_BUFFER_SUFFIXES)]
        state = opt_sd["state"]
        order: List[int] = []
        for group in opt_sd["param_groups"]:
            order.extend(group["params"])
        if len(order) != len(torch_params):
            raise ValueError("optimizer/param count mismatch: "
                             f"{len(order)} vs {len(torch_params)}")
        mu, nu = {}, {}
        count = 0
        for pid, key in zip(order, torch_params):
            path, t = self.params[key]
            s = state.get(pid, {})
            if not s:   # param never stepped
                ea = np.zeros_like(np.asarray(sd[key], np.float32))
                eas = np.zeros_like(ea)
                step = 0
            else:
                ea = np.asarray(s["exp_avg"], np.float32)
                eas = np.asarray(s["exp_avg_sq"], np.float32)
                step = int(np.asarray(s["step"]))
            mu[path] = t(ea) if t else ea
            nu[path] = t(eas) if t else eas
            count = max(count, step)
        return {
            "0": {"count": np.int32(count), "mu": _nest(mu), "nu": _nest(nu)},
            "1": {},
        }


def convert_generator(sd, opt_sd=None):
    m = _Mapper(generator_rules())
    model = m.convert_model(_strip_module(sd))
    opt = m.convert_adam(_strip_module(sd), opt_sd) if opt_sd else None
    return model, opt


def convert_discriminator(sd, opt_sd=None):
    sd = _strip_module(sd)
    m = _Mapper(discriminator_rules(sd))
    model = m.convert_model(sd)
    opt = m.convert_adam(sd, opt_sd) if opt_sd else None
    return model, opt


def _to_numpy_tree(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, dict):
        return {k: _to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy_tree(v) for v in obj)
    return obj


def convert_files(ckpt_g: str, ckpt_d: str, out_dir: str,
                  category: str = "chair") -> Tuple[str, str]:
    """Convert a reference G/D checkpoint pair to msgpack bundles."""
    import torch

    from pdgn_tpu.train.checkpoint import save_state

    raw_g = _to_numpy_tree(torch.load(ckpt_g, map_location="cpu",
                                      weights_only=False))
    raw_d = _to_numpy_tree(torch.load(ckpt_d, map_location="cpu",
                                      weights_only=False))

    g_model, g_opt = convert_generator(raw_g["G_model"],
                                       raw_g.get("G_optimizer"))
    epoch = int(raw_g.get("G_epoch", 0))
    bundle_g = {"G_model": g_model, "G_optimizer": g_opt, "G_epoch": epoch}

    bundle_d = {"D_epoch": int(raw_d.get("D_epoch", epoch))}
    for i in range(1, 5):
        model, opt = convert_discriminator(
            raw_d[f"D_model{i}"], raw_d.get(f"D_optimizer{i}"))
        bundle_d[f"D_model{i}"] = model
        bundle_d[f"D_optimizer{i}"] = opt

    os.makedirs(out_dir, exist_ok=True)
    path_g = os.path.join(out_dir, f"{epoch}_{category}_G.msgpack")
    path_d = os.path.join(out_dir, f"{epoch}_{category}_D.msgpack")
    save_state(path_g, bundle_g)
    save_state(path_d, bundle_d)
    return path_g, path_d


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Convert reference .pth checkpoints to pdgn_tpu msgpack")
    ap.add_argument("--ckpt_g", required=True)
    ap.add_argument("--ckpt_d", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--category", default="chair")
    args = ap.parse_args(argv)
    pg, pd = convert_files(args.ckpt_g, args.ckpt_d, args.out_dir,
                           args.category)
    print(pg)
    print(pd)


if __name__ == "__main__":
    main()
