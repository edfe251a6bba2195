"""Command-line interface.

Mirrors the reference CLI (main.py:12-42): same flags, same phases, same
directory layout (checkpoint/<model_dir>/<network>/..., results/GEN_Ours_*),
same random-seed-per-train-run behaviour, and the train-phase backup of the
entry script into the checkpoint dir (main.py:97-99).

The reference's ``--phase cls`` dispatches to an undefined method
(``extract_feature``, main.py:108-109 — dead code); here it exits with an
explicit message instead of an AttributeError.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys

import numpy as np


def parse_args(argv=None) -> argparse.Namespace:
    desc = "PDGN-TPU: progressive point-cloud GAN (JAX/TPU)"
    parser = argparse.ArgumentParser(description=desc)
    parser.add_argument('--phase', type=str, default='train',
                        help='train, test, or sample (bulk generation)')
    parser.add_argument('--num_samples', type=int, default=128,
                        help='clouds to generate in --phase sample')
    parser.add_argument('--workers', type=int, default=4,
                        help='(accepted for parity; host loader is threaded)')
    parser.add_argument('--gpu', type=int, default=0,
                        help='(accepted for parity; devices come from JAX)')
    parser.add_argument('--batch_size', type=int, default=50)
    parser.add_argument('--num_point', type=int, default=2048)
    parser.add_argument('--num_k', type=int, default=20,
                        help='number of the knn graph point')
    parser.add_argument('--learning_rate', type=float, default=0.0001)
    parser.add_argument('--max_epoch', type=int, default=300)
    parser.add_argument('--noise_dim', type=int, default=128)
    parser.add_argument('--optimizer', default='adam')
    parser.add_argument('--debug', type=bool, default=True)
    parser.add_argument('--data_root',
                        default='/opt/data/private/shapenet/shapenet.hdf5')
    parser.add_argument('--log_info', default='log_info.txt')
    parser.add_argument('--model_dir', help='model dir [must input]')
    parser.add_argument('--checkpoint_dir', default='checkpoint')
    parser.add_argument('--snapshot', type=int, default=20)
    parser.add_argument('--choice', default=None, help='choice class')
    parser.add_argument('--network', default=None,
                        help='PDGNet or PDGNet_v2')
    parser.add_argument('--savename', default=None)
    parser.add_argument('--pretrain_model_G', default=None)
    parser.add_argument('--pretrain_model_D', default=None)
    parser.add_argument('--softmax', default='True')
    parser.add_argument('--dataset', default='shapenet15k',
                        help='[shapenet15k, modelnet10, modelnet40, synthetic]')
    parser.add_argument('--normalize', type=str, default='shape_bbox',
                        choices=[None, 'shape_unit', 'shape_bbox'])
    parser.add_argument('--seed', type=int, default=9999)
    parser.add_argument('--save_dir', type=str, default='./results')
    parser.add_argument('--device', type=str, default='tpu',
                        help='(accepted for parity)')
    parser.add_argument('--max_steps_per_epoch', type=int, default=None,
                        help='debug cap on batches per epoch')
    parser.add_argument('--synthetic_size', type=int, default=64)
    parser.add_argument('--base_points', type=int, default=128,
                        help='generator stage-1 points (128 = reference; '
                             'smaller shrinks every stage — smoke tests)')
    parser.add_argument('--profile_dir', type=str, default=None,
                        help='write a jax.profiler trace of steps 2..4')
    parser.add_argument('--compute_dtype', type=str, default=None,
                        choices=[None, 'float32', 'bfloat16'],
                        help='training compute dtype for the large '
                             'activations (params/BN stats/coordinate '
                             'heads stay fp32). bfloat16 roughly matches '
                             'the TF32 regime the reference trains in on '
                             'Ampere GPUs; default fp32')
    parser.add_argument('--d_compute_dtype', type=str, default=None,
                        choices=[None, 'float32', 'bfloat16'],
                        help='discriminator conv-stack dtype. Stays fp32 '
                             'even under --compute_dtype bfloat16: bf16 '
                             'discriminators measured as collapsing LSGAN '
                             'training (see PERF.md)')
    parser.add_argument('--exact_knn', type=str, default=None,
                        choices=[None, '0', '1'],
                        help='fp32-exact kNN graph construction. Default '
                             'per phase: test/eval exact, train/sample '
                             'fast bf16 keys (see PERF.md divergence '
                             'table); PDGN_EXACT_KNN env overrides the '
                             'per-phase default but not this flag')
    return check_args(parser.parse_args(argv))


def check_folder(d: str) -> str:
    os.makedirs(d, exist_ok=True)
    return d


def check_args(args: argparse.Namespace) -> argparse.Namespace:
    if args.model_dir is None:
        print('please create model dir')
        sys.exit(1)
    if args.network is None:
        print('please select model!!!')
        sys.exit(1)
    check_folder(args.checkpoint_dir)
    check_folder(os.path.join(args.checkpoint_dir, args.model_dir))
    assert args.max_epoch >= 1
    assert args.batch_size >= 1
    return args


def main(argv=None) -> None:
    args = parse_args(argv)

    # persistent XLA compile cache: the full train step takes minutes to
    # compile on TPU; cache it across runs. JAX_COMPILATION_CACHE_DIR (or
    # PDGN_JAX_CACHE) overrides; PDGN_JAX_CACHE=0 disables.
    cache_dir = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.environ.get("PDGN_JAX_CACHE", "/tmp/pdgn_tpu_jax_cache"))
    if cache_dir and cache_dir != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # random seed per train run, like the reference (main.py:79-82);
    # the test phase re-seeds deterministically inside the trainer.
    args.manualSeed = random.randint(1, 10000)
    print("Random Seed: ", args.manualSeed)
    random.seed(args.manualSeed)
    np.random.seed(args.manualSeed)

    from pdgn_tpu.train import ExperimentConfig, PDGNTrainer

    print(f'****************network: {args.network}****************')
    if args.network not in ('PDGNet', 'PDGNet_v2'):
        print('select model error!!!')
        sys.exit(1)

    cfg = ExperimentConfig(
        network=args.network,
        phase=args.phase,
        batch_size=args.batch_size,
        num_point=args.num_point,
        num_k=args.num_k,
        learning_rate=args.learning_rate,
        max_epoch=args.max_epoch,
        noise_dim=args.noise_dim,
        data_root=args.data_root,
        log_info=args.log_info,
        model_dir=args.model_dir,
        checkpoint_dir=args.checkpoint_dir,
        snapshot=args.snapshot,
        choice=args.choice,
        pretrain_model_G=args.pretrain_model_G,
        pretrain_model_D=args.pretrain_model_D,
        softmax=(args.softmax == 'True'),
        dataset=args.dataset,
        normalize=args.normalize,
        seed=args.seed,
        save_dir=args.save_dir,
        synthetic_size=args.synthetic_size,
        base_points=args.base_points,
        max_steps_per_epoch=args.max_steps_per_epoch,
        profile_dir=args.profile_dir,
        compute_dtype=args.compute_dtype,
        d_compute_dtype=args.d_compute_dtype,
        exact_knn=(None if args.exact_knn is None
                   else args.exact_knn == '1'),
    )
    trainer = PDGNTrainer(cfg)
    trainer.build_model()

    if args.phase == 'train':
        # back up the entry script + model source into the checkpoint dir
        # (reference main.py:97-99 shells out to cp; same effect, no shell)
        dst = os.path.join(args.checkpoint_dir, args.model_dir)
        import pdgn_tpu.models.generator as _gen_mod

        for src in (os.path.abspath(sys.argv[0]), _gen_mod.__file__):
            try:
                shutil.copy(src, dst)
            except (OSError, shutil.SameFileError):
                pass
        trainer.train()
        print(" [*] Training finished!")
    elif args.phase == 'test':
        trainer.test()
        print(" [*] Test finished!")
    elif args.phase == 'sample':
        out = os.path.join(args.save_dir,
                           f"samples_{args.model_dir}_{args.num_samples}.npy")
        clouds = trainer.generate(args.num_samples, out_path=out)
        print(f" [*] Wrote {clouds.shape} to {out}")
        print(" [*] Sampling finished!")
    elif args.phase == 'cls':
        print(" [!] phase 'cls' maps to extract_feature(), which the "
              "reference never defines (dead phase, main.py:108-109); "
              "nothing to run.")
        sys.exit(1)


if __name__ == '__main__':
    main()
