"""Trained-checkpoint parity run (end-to-end converter evidence).

Closes the quality-parity loop as far as this environment allows: no
shapenet hdf5 or published ``600_chair_*.pth`` exists here, so this script
*creates* a trained reference checkpoint — it trains the reference's own
torch modules (models/PDGNet_v2.py:820-1023) on CPU for a few epochs on
the synthetic dataset, mirroring the reference train step
(models/PDGNet_v2.py:157-269: 4 LSGAN D-updates + 1 G-update with the
1.2/1.2/1.2/1.0 + 0.1*shape-preserving loss, Adam(lr, 0.5/0.999), noise
sigma 0.2). The CUDA knnquery/grouping inside the shape loss is replaced
by an equivalent pure-torch 20-NN gather (same semantics as
lib/pointops/src/knnquery: centers = coarser cloud, self NOT excluded).

It then saves the reference's two-bundle ``.pth`` schema
(models/PDGNet_v2.py:384-408), converts with ``pdgn_tpu.convert_ckpt``,
and compares:

1. the full pdgn_tpu metric suite (MMD/COV/1-NNA CD+EMD + JSD) of
   torch-generated vs pdgn_tpu-generated samples from the SAME converted
   checkpoint and the SAME test noise (z ~ N(0,1), seed 9999) against the
   same reference set;
2. the reference's own CPU metric code (distChamfer + lgan_mmd_cov + knn
   + jsd_between_point_cloud_sets; evaluation/evaluation_metrics.py) vs
   pdgn_tpu's on IDENTICAL inputs (the pdgn_tpu-generated set).

Results are recorded in PERF.md ("Trained-checkpoint parity"). Run on a
CPU host (uses the reference tree at /root/reference):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/torch_parity_run.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"
sys.path.insert(0, REPO)


def load_reference_modules():
    import torch  # noqa: F401

    sys.path.insert(0, REF)
    for name in ("pointops_cuda", "structural_loss_cuda", "emd_cuda",
                 "evaluation.StructuralLosses",
                 "evaluation.StructuralLosses.match_cost",
                 "evaluation.StructuralLosses.nn_distance"):
        m = types.ModuleType(name)
        m.match_cost = lambda *a: None
        m.nn_distance = lambda *a: None
        sys.modules.setdefault(name, m)
    from models import PDGNet_v2 as ref_models
    from chamfer_loss import ChamferLoss  # via datasets_4point sys.path hack

    return ref_models, ChamferLoss


def group20(xyz_src, centers):
    """Pure-torch Gen_QueryAndGroupXYZ(nsample=20) equivalent.

    xyz_src (B,N,3), centers (B,M,3) -> grouped (B*M, 3, 20); 20-NN by
    squared distance, self included (reference knnquery semantics).
    """
    import torch

    d = torch.cdist(centers, xyz_src)                      # (B, M, N)
    idx = d.topk(20, largest=False).indices                # (B, M, 20)
    B, M, _ = idx.shape
    g = torch.gather(
        xyz_src.unsqueeze(1).expand(B, M, xyz_src.shape[1], 3), 2,
        idx.unsqueeze(-1).expand(B, M, 20, 3))             # (B, M, 20, 3)
    return g.reshape(B * M, 20, 3).transpose(1, 2).contiguous()


def mean_cov(points):
    """Reference compute_mean_covariance (models/PDGNet_v2.py:127-134)."""
    import torch

    mu = points.mean(dim=-1, keepdim=True)                 # (BM, 3, 1)
    cen = points - mu
    cov = torch.bmm(cen, cen.transpose(1, 2)) / points.shape[-1]
    return mu, cov


def local_pair_loss(chamfer, pt1, pt2):
    """Reference get_local_pair (models/PDGNet_v2.py:136-155)."""
    B, _, M = pt1.shape
    centers = pt1.transpose(1, 2).contiguous()
    g1 = group20(pt1.transpose(1, 2).contiguous(), centers)
    g2 = group20(pt2.transpose(1, 2).contiguous(), centers)
    mu1, var1 = mean_cov(g1)
    mu2, var2 = mean_cov(g2)
    mu1 = mu1.view(B, -1, 3)
    mu2 = mu2.view(B, -1, 3)
    var1 = var1.view(B, -1, 9)
    var2 = var2.view(B, -1, 9)
    return chamfer(mu1, mu2) / float(M), chamfer(var1, var2) / float(M)


def train_reference_cpu(epochs, size, batch_size, lr, seed, ckpt_dir):
    import torch
    import torch.nn as nn
    import torch.optim as optim

    from pdgn_tpu.data.shapenet import SyntheticShapes, batch_iterator

    ref, ChamferLoss = load_reference_modules()
    torch.manual_seed(seed)
    np.random.seed(seed)
    torch.set_num_threads(os.cpu_count() or 1)

    G = ref.PointGenerator(num_point=2048, num_k=20, softmax=True)
    Ds = [ref.PointDiscriminator_1(), ref.PointDiscriminator_2(),
          ref.PointDiscriminator_3(), ref.PointDiscriminator_4()]
    optG = optim.Adam(G.parameters(), lr=lr, betas=(0.5, 0.999))
    optDs = [optim.Adam(D.parameters(), lr=lr, betas=(0.5, 0.999))
             for D in Ds]
    loss_fn = nn.MSELoss()
    chamfer = ChamferLoss()

    dset = SyntheticShapes(size=size, num_points=2048, seed=0)
    ones = torch.ones(batch_size, 1)
    zeros = torch.zeros(batch_size, 1)

    step = 0
    for epoch in range(1, epochs + 1):
        for p1, p2, p3, p4, _ in batch_iterator(
                dset, batch_size, shuffle=True, seed=seed + epoch):
            reals = [torch.from_numpy(p).transpose(2, 1).contiguous()
                     for p in (p1, p2, p3, p4)]
            z = torch.from_numpy(
                np.random.normal(0, 0.2, (batch_size, 128)).astype(np.float32))
            fakes = G(z)
            for D, optD, real, fake in zip(Ds, optDs, reals, fakes):
                optD.zero_grad()
                lossD = (loss_fn(D(real), ones)
                         + loss_fn(D(fake.detach()), zeros)) / 2.0
                lossD.backward()
                optD.step()

            optG.zero_grad()
            z = torch.from_numpy(
                np.random.normal(0, 0.2, (batch_size, 128)).astype(np.float32))
            gens = G(z)
            sim = sum(sum(local_pair_loss(chamfer, gens[i], gens[j]))
                      for i in range(4) for j in range(i + 1, 4))
            g_adv = [loss_fn(D(g), ones) for D, g in zip(Ds, gens)]
            lossG = (1.2 * g_adv[0] + 1.2 * g_adv[1] + 1.2 * g_adv[2]
                     + g_adv[3]) + 0.1 * sim
            lossG.backward()
            optG.step()
            step += 1
            print(f"epoch {epoch} step {step}: lossG={float(lossG):.4f} "
                  f"similar={float(sim):.4f}", flush=True)

    os.makedirs(ckpt_dir, exist_ok=True)
    path_g = os.path.join(ckpt_dir, f"{epochs}_synthetic_G.pth")
    path_d = os.path.join(ckpt_dir, f"{epochs}_synthetic_D.pth")
    torch.save({"G_model": G.state_dict(),
                "G_optimizer": optG.state_dict(),
                "G_epoch": epochs}, path_g)
    bundle_d = {"D_epoch": epochs}
    for i, (D, optD) in enumerate(zip(Ds, optDs), 1):
        bundle_d[f"D_model{i}"] = D.state_dict()
        bundle_d[f"D_optimizer{i}"] = optD.state_dict()
    torch.save(bundle_d, path_d)
    return G, path_g, path_d


def load_trained_reference(path_g):
    """Rebuild the torch generator from a saved parity checkpoint.

    Lets an interrupted run resume at the convert/sample/metric phases
    without repeating the CPU training (~40 min at epochs=6).
    """
    import torch

    ref, _ = load_reference_modules()
    G = ref.PointGenerator(num_point=2048, num_k=20, softmax=True)
    G.load_state_dict(torch.load(path_g, weights_only=False)["G_model"])
    G.eval()
    return G


def sample_both(G_torch, msgpack_g, n_samples, batch_size):
    """Same z through the torch model and the converted flax model."""
    import torch

    import jax.numpy as jnp
    from flax.serialization import msgpack_restore

    from pdgn_tpu.models.generator import PointGenerator

    rng = np.random.RandomState(9999)
    z = rng.randn(n_samples, 128).astype(np.float32)

    outs_t = []
    with torch.no_grad():
        for s in range(0, n_samples, batch_size):
            zb = torch.from_numpy(z[s:s + batch_size])
            outs_t.append(G_torch(zb)[3].transpose(2, 1).numpy())
    gen_torch = np.concatenate(outs_t)                     # (S, 2048, 3)

    with open(msgpack_g, "rb") as f:
        bundle = msgpack_restore(f.read())
    variables = {"params": bundle["G_model"]["params"],
                 "batch_stats": bundle["G_model"]["batch_stats"]}
    model = PointGenerator()
    outs_j = []
    for s in range(0, n_samples, batch_size):
        outs, _ = model.apply(variables, jnp.asarray(z[s:s + batch_size]),
                              mutable=["batch_stats"])
        outs_j.append(np.asarray(outs[3]))
    gen_jax = np.concatenate(outs_j)
    return gen_torch, gen_jax


def reference_cd_metrics(gen, ref_set):
    """Reference's own metric code on CPU: CD-based MMD/COV/1-NNA + JSD.

    Uses the reference's distChamfer / lgan_mmd_cov / knn /
    jsd_between_point_cloud_sets verbatim (evaluation_metrics.py);
    the EMD path needs CUDA and is covered by pdgn_tpu's float64-oracle
    tests instead.
    """
    import torch

    sys.path.insert(0, REF)
    from evaluation.evaluation_metrics import (
        distChamfer, jsd_between_point_cloud_sets, knn, lgan_mmd_cov)

    tg = torch.from_numpy(gen)
    tr = torch.from_numpy(ref_set)

    def cd_matrix(a, b):
        rows = []
        for i in range(a.shape[0]):
            dl, dr = distChamfer(a[i:i + 1].expand(b.shape[0], -1, -1), b)
            rows.append((dl.mean(dim=1) + dr.mean(dim=1)).unsqueeze(0))
        return torch.cat(rows, dim=0)

    M_sr = cd_matrix(tg, tr)
    res = {f"{k}-CD": float(v) for k, v in lgan_mmd_cov(M_sr.t()).items()}
    M_rr = cd_matrix(tr, tr)
    M_ss = cd_matrix(tg, tg)
    # reference quirk preserved: knn gets the (N_s, N_r) matrix where the
    # (N_r, N_s) block is expected (evaluation_metrics.py:191)
    one_nn = knn(M_rr, M_sr, M_ss, 1, sqrt=False)
    res["1-NN-CD-acc"] = float(one_nn["acc"])
    res["jsd"] = float(jsd_between_point_cloud_sets(gen, ref_set))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=2020)
    ap.add_argument("--n_eval", type=int, default=16)
    ap.add_argument("--out", default="/tmp/torch_parity")
    ap.add_argument("--resume", action="store_true",
                    help="skip training; load {epochs}_synthetic_*.pth "
                         "already present in --out")
    ap.add_argument("--skip_emd", action="store_true",
                    help="CD+JSD metrics only — the pairwise approxmatch "
                         "EMD dominates the suite's CPU cost at large "
                         "--n_eval (EMD agreement is pinned by the n=16 "
                         "run and the float64-oracle tests)")
    args = ap.parse_args()

    from pdgn_tpu.convert_ckpt import convert_files
    from pdgn_tpu.data.shapenet import SyntheticShapes
    from pdgn_tpu.eval import compute_all_metrics, jsd_between_point_cloud_sets
    from pdgn_tpu.train.trainer import normalize_point_clouds

    path_g = os.path.join(args.out, f"{args.epochs}_synthetic_G.pth")
    path_d = os.path.join(args.out, f"{args.epochs}_synthetic_D.pth")
    if args.resume and os.path.exists(path_g):
        print("== resuming from saved torch checkpoint ==", flush=True)
        G = load_trained_reference(path_g)
    else:
        print("== training reference torch modules on CPU ==", flush=True)
        G, path_g, path_d = train_reference_cpu(
            args.epochs, args.size, args.batch_size, args.lr, args.seed,
            args.out)

    print("== converting checkpoint ==", flush=True)
    mp_g, _ = convert_files(path_g, path_d, args.out, category="synthetic")

    print("== sampling both frameworks (same z) ==", flush=True)
    gen_torch, gen_jax = sample_both(G, mp_g, args.n_eval, args.batch_size)
    gen_torch = normalize_point_clouds(gen_torch, "shape_bbox", None)
    gen_jax = normalize_point_clouds(gen_jax, "shape_bbox", None)
    ref_set = SyntheticShapes(size=args.n_eval, num_points=2048,
                              seed=7).full_clouds()

    print("== pdgn_tpu metric suite on both gen sets ==", flush=True)
    res_t = compute_all_metrics(gen_torch, ref_set, args.batch_size,
                                with_emd=not args.skip_emd)
    res_t["jsd"] = jsd_between_point_cloud_sets(gen_torch, ref_set)
    res_j = compute_all_metrics(gen_jax, ref_set, args.batch_size,
                                with_emd=not args.skip_emd)
    res_j["jsd"] = jsd_between_point_cloud_sets(gen_jax, ref_set)

    print("== reference metric code (CD+JSD) on the jax gen set ==",
          flush=True)
    res_ref_code = reference_cd_metrics(gen_jax, ref_set)

    report = {
        "torch_gen_vs_ref (pdgn_tpu metrics)":
            {k: float(v) for k, v in res_t.items()},
        "jax_gen_vs_ref (pdgn_tpu metrics)":
            {k: float(v) for k, v in res_j.items()},
        "jax_gen_vs_ref (reference metric code, CD+JSD)": res_ref_code,
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=2)

    print("\n== metric-code agreement on identical inputs ==")
    for k, v in res_ref_code.items():
        ours = res_j.get(k)
        if ours is not None and abs(float(ours)) > 1e-12:
            rel = abs(float(v) - float(ours)) / abs(float(ours))
            print(f"  {k}: ref={v:.6f} ours={float(ours):.6f} "
                  f"rel={rel:.2e}")


if __name__ == "__main__":
    main()
