"""Data-parallel semantics on the 8-device virtual CPU mesh.

Covers SURVEY.md §7's distributed test requirements: psum-synced batch
norm equals concatenated-batch batch norm, sharded == single-device train
steps, and sharded evaluation equals single-device evaluation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdgn_tpu.parallel import (
    DATA_AXIS,
    batch_norm,
    batch_sharding,
    make_mesh,
    per_replica_batch_norm,
    replicate,
    shard_batch,
)
from jax.sharding import PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, jax.devices()
    return make_mesh()


def test_mesh_batch_divisibility():
    m = make_mesh(batch_size=6)
    assert m.devices.size in (1, 2, 3, 6)
    assert 6 % m.devices.size == 0
    m8 = make_mesh(batch_size=16)
    assert m8.devices.size == 8


def test_sync_bn_equals_global_bn(mesh, rng):
    """psum-synced BN across shards == BN over the concatenated batch."""
    x = rng.randn(16, 10, 4).astype(np.float32)
    scale = rng.rand(4).astype(np.float32) + 0.5
    bias = rng.randn(4).astype(np.float32)

    want = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))

    def shard_fn(xs):
        return batch_norm(xs, jnp.asarray(scale), jnp.asarray(bias),
                          axis_name=DATA_AXIS)

    got = jax.jit(
        jax.shard_map(shard_fn, mesh=mesh, in_specs=P(DATA_AXIS),
                      out_specs=P(DATA_AXIS))
    )(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_per_replica_bn_differs_from_synced(mesh, rng):
    """Local-stats BN (the reference DataParallel behaviour) differs."""
    x = rng.randn(16, 10, 4).astype(np.float32) + np.arange(16)[:, None, None]
    scale = np.ones(4, np.float32)
    bias = np.zeros(4, np.float32)

    synced = batch_norm(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias))

    got = jax.jit(
        jax.shard_map(
            lambda xs: per_replica_batch_norm(
                xs, jnp.asarray(scale), jnp.asarray(bias)),
            mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(DATA_AXIS),
        )
    )(jnp.asarray(x))
    assert not np.allclose(np.asarray(got), np.asarray(synced), atol=1e-3)


def test_sharded_train_step_matches_single_device(mesh, rng):
    """The jitted GAN step gives identical results with a sharded batch."""
    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    sizes = (32, 64, 128, 256)
    batch = 8
    gen = PointGenerator(num_point=sizes[-1], num_k=20, base_points=16)
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                       num_points=sizes)
    step = jax.jit(make_train_step(gen, discs, cfg))
    reals = tuple(
        jnp.asarray(rng.randn(batch, n, 3).astype(np.float32)) for n in sizes
    )
    key = jax.random.PRNGKey(1)

    _, m_single = step(state, reals, key)

    with mesh:
        state_r = replicate(mesh, state)
        reals_s = shard_batch(mesh, reals)
        _, m_sharded = step(state_r, reals_s, key)

    for k in m_single:
        np.testing.assert_allclose(
            float(m_single[k]), float(m_sharded[k]), rtol=2e-4,
            err_msg=k,
        )


def test_sharded_eval_matches_single_device(mesh, rng):
    from pdgn_tpu.eval import pairwise_cd_emd

    sample = rng.randn(8, 32, 3).astype(np.float32)
    ref = rng.randn(8, 32, 3).astype(np.float32)
    cd1, emd1 = pairwise_cd_emd(sample, ref, tile=4)
    with mesh:
        sample_s = shard_batch(mesh, jnp.asarray(sample))
        ref_s = shard_batch(mesh, jnp.asarray(ref))
        cd2, emd2 = pairwise_cd_emd(sample_s, ref_s, tile=4)
    np.testing.assert_allclose(cd1, cd2, atol=1e-5)
    np.testing.assert_allclose(emd1, emd2, rtol=1e-4)


def test_padded_masked_step_matches_unpadded(mesh, rng):
    """Padding the batch to the device count with masked statistics must
    reproduce the unpadded step exactly: losses AND the updated state."""
    import jax.numpy as jnp

    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.parallel import batch_sharding, replicate
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    sizes = (32, 64, 128, 256)
    batch = 6                      # pads to 8 on the 8-device mesh
    n_dev = mesh.devices.size
    padded = -(-batch // n_dev) * n_dev
    gen = PointGenerator(num_point=sizes[-1], num_k=20, base_points=16)
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()
    reals = tuple(rng.randn(batch, n, 3).astype(np.float32) for n in sizes)
    key = jax.random.PRNGKey(3)

    # unpadded single-device run
    state0 = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                        num_points=sizes)
    step = jax.jit(make_train_step(gen, discs, cfg))
    _, m_ref = step(state0, tuple(jnp.asarray(r) for r in reals), key)

    # padded masked run over the full mesh
    pad = padded - batch
    mask = jnp.concatenate([jnp.ones((batch,), jnp.float32),
                            jnp.zeros((pad,), jnp.float32)])
    reals_p = tuple(
        jnp.concatenate([jnp.asarray(r),
                         jnp.zeros((pad,) + r.shape[1:], jnp.float32)])
        for r in reals)
    state1 = init_state(gen, discs, cfg, jax.random.PRNGKey(0), padded,
                        num_points=sizes)
    with mesh:
        state1 = replicate(mesh, state1)
        sh = batch_sharding(mesh)
        reals_p = tuple(jax.device_put(r, sh) for r in reals_p)
        mask_s = jax.device_put(mask, sh)
        _, m_pad = step(state1, reals_p, key, mask_s)

    # threefry counters are laid out row-major, so the first B rows of
    # the padded (B', 128) noise equal the unpadded (B, 128) draw — with
    # masked statistics the real rows see identical compute and the
    # padded metrics must match the unpadded ones
    for k in m_ref:
        np.testing.assert_allclose(float(m_pad[k]), float(m_ref[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)

    # and a FULL mask must equal the unmasked step (masked-stat formulas
    # reduce exactly to the plain ones)
    state2 = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                        num_points=sizes)
    _, m_full = step(state2, tuple(jnp.asarray(r) for r in reals), key,
                     jnp.ones((batch,), jnp.float32))
    for k in m_ref:
        np.testing.assert_allclose(float(m_full[k]), float(m_ref[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)


@pytest.mark.slow
def test_multihost_two_process_train_step_matches_single(tmp_path):
    """Two gloo-connected CPU processes (2 virtual devices each) run one
    GAN train step over the 4-device global mesh via initialize_distributed
    + local_batch_slice; metrics must equal the single-process 4-device
    run of the same global batch."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.update({
        "PALLAS_AXON_POOL_IPS": "",
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/pdgn_tpu_jax_cache",
    })
    env2 = dict(env)
    env.update({"XLA_FLAGS": "--xla_force_host_platform_device_count=2"})
    env2.update({"XLA_FLAGS": "--xla_force_host_platform_device_count=4"})

    out0 = tmp_path / "dist.json"
    out1 = tmp_path / "single.json"
    # unique port per run: a fixed port collides with the coordinator of
    # an earlier (killed/overlapping) run and strands worker 0
    port = str(29600 + os.getpid() % 300)
    # worker output goes to FILES: XLA emits tens of kB of AOT-cache
    # warnings, which deadlocks a subprocess.PIPE that is only drained
    # after wait()
    logfiles = [tmp_path / f"worker{i}.log" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--process-id", str(i), "--port", port,
             "--out", str(out0)],
            env=env, stdout=open(logfiles[i], "w"),
            stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    # the two workers compile the same program concurrently on
    # this one-core host (~10 min each when the cache is cold); if one
    # dies, kill the other instead of waiting out its collective
    rc = []
    for i, p in enumerate(procs):
        try:
            rc.append(p.wait(timeout=2700))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            rc.append(f"timeout (proc {i})")
    logs = "\n".join(f.read_text()[-2000:] for f in logfiles)
    assert rc == [0, 0], (rc, logs)

    single_log = tmp_path / "single.log"
    with open(single_log, "w") as lf:
        single = subprocess.run(
            [sys.executable, worker, "--out", str(out1)],
            env=env2, stdout=lf, stderr=subprocess.STDOUT, timeout=1800)
    assert single.returncode == 0, single_log.read_text()[-2000:]

    import json

    dist = json.loads(out0.read_text())
    ref = json.loads(out1.read_text())
    assert set(dist) == set(ref)
    for k in ref:
        np.testing.assert_allclose(dist[k], ref[k], rtol=2e-4, atol=2e-4,
                                   err_msg=k)


def test_mesh_distributed_eval_matches_single_device(mesh, rng):
    """The row-block shard_map path must reproduce the single-device
    matrices bit-for-tolerance, including ragged sample counts that need
    block padding."""
    from pdgn_tpu.eval import pairwise_cd_emd

    # 13 samples: not a multiple of tile * n_devices -> exercises padding
    sample = rng.randn(13, 32, 3).astype(np.float32)
    ref = rng.randn(9, 32, 3).astype(np.float32)
    cd1, emd1 = pairwise_cd_emd(sample, ref, tile=2)
    cd2, emd2 = pairwise_cd_emd(sample, ref, tile=2, mesh=mesh)
    assert cd2.shape == (13, 9)
    np.testing.assert_allclose(cd1, cd2, atol=1e-5)
    np.testing.assert_allclose(emd1, emd2, rtol=1e-4, atol=1e-5)


def test_sharded_generation_matches_single_device(mesh, rng):
    """make_batched_sampler(mesh=...) == the unsharded scan: bulk
    generation is embarrassingly parallel (batch sharded over the data
    axis, params replicated; only the BN batch-stat reductions cross
    chips and XLA keeps them global, like the single-device trace)."""
    from pdgn_tpu.models import PointGenerator
    from pdgn_tpu.train import TrainConfig, make_batched_sampler

    gen = PointGenerator(num_point=256, num_k=20, base_points=16)
    cfg = TrainConfig()
    batch = int(mesh.devices.size)
    variables = gen.init(jax.random.PRNGKey(0), jnp.zeros((batch, 128)))
    keys = jax.random.split(jax.random.PRNGKey(5), 2)

    plain = jax.jit(make_batched_sampler(gen, cfg),
                    static_argnames=("batch_size",))
    single = plain(variables["params"], variables["batch_stats"], keys,
                   batch_size=batch)

    with mesh:
        sharded_fn = jax.jit(make_batched_sampler(gen, cfg, mesh=mesh),
                             static_argnames=("batch_size",))
        state_r = replicate(mesh, variables)
        sharded = sharded_fn(state_r["params"], state_r["batch_stats"],
                             keys, batch_size=batch)

    assert sharded.shape == (2, batch, 256, 3)
    # element equality is chaotic at random init (BN-stat reduction-order
    # shifts flip feature-kNN near-ties), so assert geometric equivalence:
    # each sharded cloud must be Chamfer-close to ITS single-device twin
    # and far from every other cloud
    from pdgn_tpu.losses import chamfer_cd

    s = jnp.asarray(np.asarray(sharded)).reshape(-1, 256, 3)
    u = jnp.asarray(np.asarray(single)).reshape(-1, 256, 3)
    twin = np.array([float(jnp.mean(chamfer_cd(s[i:i+1], u[i:i+1])))
                     for i in range(s.shape[0])])
    other = np.array([float(jnp.mean(chamfer_cd(s[i:i+1], u[i-1:i])))
                      for i in range(1, s.shape[0])])
    assert twin.max() < 1e-3, twin
    # untrained clouds are all similar blobs, so the contrast between
    # twin and non-twin CD is modest — 5x is still clearly discriminative
    assert other.min() > 5 * twin.max(), (twin.max(), other.min())
