"""Worker for the 2-process multi-host test (see test_parallel.py).

Runs ONE GAN train step of the tiny dry-run generator over the *global*
mesh. In distributed mode (``--process-id`` given) each of two processes
contributes its 2 virtual CPU devices and its ``local_batch_slice`` of the
global batch; collectives ride gloo. In single mode one process holds all
4 devices. Both modes must produce identical global metrics — proving the
multi-host helpers compose with the sharded train step unchanged
(SURVEY §2.3 multi-host row; the reference has no multi-host story at all).
"""

import argparse
import json
import sys

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=str, default="29517")
    ap.add_argument("--out", type=str, required=True)
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])

    from pdgn_tpu.parallel.distributed import (
        initialize_distributed,
        local_batch_slice,
    )

    if args.process_id is not None:
        n_dev = initialize_distributed(
            coordinator_address=f"localhost:{args.port}",
            num_processes=2, process_id=args.process_id)
    else:
        n_dev = len(jax.devices())
    assert n_dev == 4, f"expected 4 global devices, got {n_dev}"

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pdgn_tpu.models import (
        PointDiscriminator1, PointDiscriminator2,
        PointDiscriminator3, PointDiscriminator4, PointGenerator,
    )
    from pdgn_tpu.parallel import make_mesh
    from pdgn_tpu.train import TrainConfig, init_state, make_train_step

    mesh = make_mesh(jax.devices())
    batch = 4
    sizes = (32, 64, 128, 256)

    if args.process_id is not None:
        # establish the gloo clique while the processes are still in
        # lock-step: the context's key exchange has a hard ~30 s
        # deadline, and the first collective of the BIG program would
        # otherwise fire whenever each process finishes its (minutes-
        # long, possibly cache-skewed) compile. A tiny all-device psum
        # compiled in seconds creates the clique context up front; the
        # train step reuses it.
        ones = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")),
            np.ones((2, 1), np.float32), (4, 1))
        total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(
            ones)
        assert float(total) == 4.0, float(total)
        print("gloo warm-up ok", args.process_id, flush=True)
    gen = PointGenerator(num_point=sizes[-1], num_k=20, base_points=16)
    discs = (PointDiscriminator1(), PointDiscriminator2(),
             PointDiscriminator3(), PointDiscriminator4())
    cfg = TrainConfig()

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        if args.process_id is None:
            return jax.device_put(x, sh)
        if spec == P():
            local = x
        else:
            local = x[local_batch_slice(batch)]
        return jax.make_array_from_process_local_data(sh, np.asarray(local),
                                                      x.shape)

    with mesh:
        state = init_state(gen, discs, cfg, jax.random.PRNGKey(0), batch,
                           num_points=sizes)
        state = jax.tree.map(lambda x: to_global(np.asarray(x), P()), state)
        rng = np.random.RandomState(0)
        reals = tuple(
            to_global(rng.randn(batch, n, 3).astype(np.float32), P("data"))
            for n in sizes)
        step = jax.jit(make_train_step(gen, discs, cfg))
        key = jax.random.PRNGKey(1)
        # compile WITHOUT executing, then rendezvous on the coordination
        # service (not gloo): compile times can skew by minutes between
        # the processes (e.g. one hits the persistent cache), and gloo
        # data-phase waits are not unbounded
        compiled = step.lower(state, reals, key).compile()
        if args.process_id is not None:
            from jax._src import distributed

            distributed.global_state.client.wait_at_barrier(
                "pdgn_step_compiled", timeout_in_ms=3_000_000)
        _, metrics = compiled(state, reals, key)
        metrics = {k: float(v) for k, v in metrics.items()}

    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    if args.process_id in (None, 0):
        with open(args.out, "w") as f:
            json.dump(metrics, f)
    print("worker done", args.process_id, metrics, flush=True)


if __name__ == "__main__":
    main()
