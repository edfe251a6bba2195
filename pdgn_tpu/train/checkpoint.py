"""Two-bundle G/D checkpointing.

Mirrors the reference scheme (models/PDGNet_v2.py:384-408): per snapshot a
``<epoch>_<category>_G`` bundle {G_model, G_optimizer, G_epoch} and a
``<epoch>_<category>_D`` bundle {D_model1..4, D_optimizer1..4, D_epoch}.
Serialisation is flax msgpack (single file per bundle, like ``.pth``);
model entries hold both params and BN running statistics.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import flax.serialization

from pdgn_tpu.train.train_step import GANState, NetState


def _to_bytes(tree) -> bytes:
    return flax.serialization.msgpack_serialize(
        flax.serialization.to_state_dict(tree)
    )


def save_state(path: str, tree) -> None:
    """Serialise any pytree to a single msgpack file."""
    with open(path, "wb") as f:
        f.write(_to_bytes(tree))


def load_state(path: str, target=None):
    """Restore a pytree (into ``target``'s structure when given)."""
    with open(path, "rb") as f:
        raw = flax.serialization.msgpack_restore(f.read())
    if target is None:
        return raw
    return flax.serialization.from_state_dict(target, raw)


def _g_bundle(state: GANState, epoch: int):
    return {
        "G_model": {"params": state.g.params,
                    "batch_stats": state.g.batch_stats},
        "G_optimizer": state.g.opt_state,
        "G_epoch": epoch,
    }


def _d_bundle(state: GANState, epoch: int):
    out = {}
    for i, d in enumerate(state.d, 1):
        out[f"D_model{i}"] = {"params": d.params, "batch_stats": d.batch_stats}
        out[f"D_optimizer{i}"] = d.opt_state
    out["D_epoch"] = epoch
    return out


def save(checkpoint_dir: str, state: GANState, epoch: int,
         category: str) -> Tuple[str, str]:
    """Write the G and D bundles; returns their paths."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    save_name = f"{epoch}_{category}"
    path_g = os.path.join(checkpoint_dir, save_name + "_G.msgpack")
    path_d = os.path.join(checkpoint_dir, save_name + "_D.msgpack")
    save_state(path_g, _g_bundle(state, epoch))
    save_state(path_d, _d_bundle(state, epoch))
    return path_g, path_d


def load(
    path_g: str,
    path_d: str,
    template: GANState,
) -> Tuple[GANState, int]:
    """Restore both bundles into a state shaped like ``template``.

    Like the reference loader (models/PDGNet_v2.py:333-382), both files are
    required; returns ``(state, G_epoch)``.
    """
    raw_g = load_state(path_g)
    raw_d = load_state(path_d)

    def restore(target, raw):
        return flax.serialization.from_state_dict(target, raw)

    g = NetState(
        params=restore(template.g.params, raw_g["G_model"]["params"]),
        batch_stats=restore(template.g.batch_stats,
                            raw_g["G_model"]["batch_stats"]),
        opt_state=restore(template.g.opt_state, raw_g["G_optimizer"]),
    )
    ds = []
    for i, d in enumerate(template.d, 1):
        ds.append(
            NetState(
                params=restore(d.params, raw_d[f"D_model{i}"]["params"]),
                batch_stats=restore(d.batch_stats,
                                    raw_d[f"D_model{i}"]["batch_stats"]),
                opt_state=restore(d.opt_state, raw_d[f"D_optimizer{i}"]),
            )
        )
    state = GANState(g=g, d=tuple(ds), step=template.step)
    return state, int(raw_g["G_epoch"])
