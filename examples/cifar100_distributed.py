#!/usr/bin/env python
"""Multi-process distributed CIFAR-100 training.

The runnable equivalent of the reference's example-cifar100-distributed
(example-cifar100-distributed/src/main/scala/lamp/example/cifar/cifar100.scala
+ run_cifar_dist{1,2}.sh): the same residual convnet trained by N
cooperating PROCESSES. Where the reference wires rank 0 to own the
optimizer and push params over NCCL each step (lamp-akka control plane +
ncclBoadcast/ncclReduce data plane), the TPU-native version is one SPMD
program: every process runs this script, ``jax.distributed`` handles the
rendez-vous (the NcclUniqueId analogue), a global mesh spans all
processes' devices, and XLA inserts the gradient all-reduces
(docs/design_deltas.md).

Run as the reference's shell scripts do — one command per machine/process:

  # terminal 1 (rank 0 = coordinator)           # terminal 2
  python examples/cifar100_distributed.py \\
      --nranks 2 --rank 0 \\
      --coordinator localhost:9876              ... --rank 1 ...

Or, for a quick same-machine demonstration (2 CPU processes x 2 devices):

  python examples/cifar100_distributed.py --launch-local 2

Data: each rank loads the full dataset and takes every Nth batch
(``every_nth`` — the reference's everyNth rank sharding); without
--train-data synthetic data keeps it runnable anywhere.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-data", default=None)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=64,
                    help="per-rank microbatch")
    ap.add_argument("--learning-rate", type=float, default=1e-3)
    ap.add_argument("--nranks", type=int, default=2)
    ap.add_argument("--rank", type=int, default=None)
    ap.add_argument("--coordinator", default="localhost:9876",
                    help="host:port of rank 0 (the NcclUniqueId analogue)")
    ap.add_argument("--fsdp", action="store_true",
                    help="also shard params/optimizer over the mesh "
                         "(ZeRO-style; beyond the reference's DDP)")
    ap.add_argument("--launch-local", type=int, default=None, metavar="N",
                    help="demo mode: spawn N local CPU worker processes "
                         "(2 devices each) and wait for them")
    ap.add_argument("--seed", type=int, default=0)
    return ap.parse_args(argv)


def launch_local(n, argv):
    """Spawn n worker processes on this machine (CPU backend, 2 virtual
    devices each) — the same-machine analogue of run_cifar_dist{1,2}.sh."""
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        PALLAS_AXON_POOL_IPS="",
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=root + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    keep = [a for a in argv if not a.startswith("--launch-local")]
    if "--launch-local" in argv:
        i = argv.index("--launch-local")
        keep = argv[:i] + argv[i + 2:]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), *keep,
             "--nranks", str(n), "--rank", str(r),
             "--coordinator", f"localhost:{port}"],
            env=env,
        )
        for r in range(n)
    ]
    codes = [p.wait() for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print(f"launch-local: all {n} workers finished")


def main():
    args = parse_args()
    if args.launch_local:
        launch_local(args.launch_local, sys.argv[1:])
        return

    import jax
    import jax.numpy as jnp

    from lamp_tpu import data, nn, optim, parallel, train

    if args.rank is None:
        raise SystemExit("--rank is required (or use --launch-local N)")
    parallel.initialize_multihost(
        coordinator_address=args.coordinator,
        num_processes=args.nranks,
        process_id=args.rank,
    )
    rank = jax.process_index()
    devs = jax.devices()
    if rank == 0:
        print(f"{jax.process_count()} processes, {len(devs)} global devices")

    from examples.cifar100 import load_cifar100_bin, synthetic

    if args.train_data:
        x, y = load_cifar100_bin(args.train_data)
    else:
        if rank == 0:
            print("no --train-data; synthetic data")
        x, y = synthetic(1024, seed=args.seed)

    model = __import__("lamp_tpu").models.resnet_cifar(
        100, key=jax.random.PRNGKey(args.seed), dropout=0.0)
    opt = optim.AdamW(args.learning_rate)

    def loss_fn(m, batch, key, train_mode):
        xx, yy = batch
        out, nm = m.forward(xx, key=key, train=train_mode)
        return (nn.losses.nll_loss(out, yy),
                jnp.asarray(xx.shape[0], jnp.float32), nm)

    mesh = parallel.make_mesh({"dp": len(devs)})
    state = train.TrainState.init(model, opt)
    rules = (parallel.fsdp_rules("dp") if args.fsdp
             else parallel.ShardingRules([]))
    sstate = parallel.shard_train_state(state, mesh, rules)
    step = parallel.make_sharded_train_step(opt, loss_fn, mesh, donate=False)

    # rank-sharded batches: every Nth microbatch to this process
    # (reference everyNth, distributed/package.scala loader contract)
    per_rank = args.batch_size
    n_batches = len(x) // (per_rank * args.nranks) * args.nranks
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("dp"))
    key = jax.random.PRNGKey(args.seed)
    for epoch in range(args.epochs):
        stream = data.from_function(
            n_batches,
            lambda i: (x[i * per_rank:(i + 1) * per_rank],
                       y[i * per_rank:(i + 1) * per_rank]),
        )
        local = stream.every_nth(args.nranks, rank)
        losses = []
        for xb, yb in local:
            # every process contributes its local shard of the GLOBAL batch
            gx = jax.make_array_from_process_local_data(sh, xb)
            gy = jax.make_array_from_process_local_data(sh, yb)
            key, sub = jax.random.split(key)
            sstate, (loss, _) = step(sstate, (gx, gy), sub)
            losses.append(float(loss))
        if rank == 0:
            print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
                  f"({len(losses)} global steps)")


if __name__ == "__main__":
    main()
