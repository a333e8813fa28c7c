#!/usr/bin/env python
"""Multi-host data-parallel HVAE training recipe (pod slices).

No reference counterpart — the reference is strictly single-GPU
(run_slurm.sh requests 1 GPU); this is the TPU-native scale-out path
(SURVEY.md §2 parallelism table): one process per host, a global mesh over
every chip in the slice, per-host input shards assembled into globally
sharded batches, and XLA collectives riding ICI (DCN across slices).

Launch the SAME command on every host of the slice, e.g. on Cloud TPU:

  python examples/multihost_train.py --hps morphomnist --data_dir ... \
      --epochs 10 --global_bs 1024

(jax.distributed.initialize auto-detects coordinator/process ids on Cloud
TPU; pass --coordinator host:port --num_processes N --process_id i
elsewhere.) Also runs single-process for a smoke check:

  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/multihost_train.py --smoke
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hps", default="morphomnist")
    p.add_argument("--data_dir", default="/root/reference/datasets/morphomnist")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--global_bs", type=int, default=256)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny arch + 2 steps (CI / CPU-mesh check)")
    args = p.parse_args()

    from causal_gen_tpu.parallel.distributed import (
        host_shard_indices,
        initialize_multihost,
        make_global_batch,
    )

    # 1. one jax.distributed.initialize per process. Explicit flags only:
    # Cloud TPU auto-detection happens inside initialize() when called with
    # no args, but single-host runs (and test harnesses with a live backend)
    # must not call it at all.
    if args.coordinator or args.num_processes:
        initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    import jax
    import jax.numpy as jnp

    from causal_gen_tpu.config import get_config
    from causal_gen_tpu.data.datasets import setup_datasets
    from causal_gen_tpu.parallel.mesh import make_mesh, replicate
    from causal_gen_tpu.models.hvae import HVAE
    from causal_gen_tpu.train.state import init_train_state
    from causal_gen_tpu.train.vae_trainer import init_model_params, make_train_step

    overrides = dict(bs=args.global_bs, data_dir=args.data_dir)
    if args.smoke:
        overrides.update(
            input_res=16, enc_arch="16b1d2,8b1d2,4b1d4,1b1",
            dec_arch="1b1,4b1,8b1,16b1", widths=(8, 8, 16, 16), z_dim=4,
            bias_max_res=16, epochs=1,
        )
    cfg = get_config(args.hps, **overrides)

    # 2. the SAME global mesh on every host: all chips in the slice
    mesh = make_mesh(axes=("data",))
    if jax.process_index() == 0:
        print(f"processes={jax.process_count()} devices={jax.device_count()} "
              f"mesh={mesh.shape}", flush=True)

    model = HVAE(cfg=cfg)
    params = init_model_params(cfg, model, jax.random.PRNGKey(cfg.seed))
    step = make_train_step(cfg, model, donate=False)

    datasets = None
    if not args.smoke:
        datasets = setup_datasets(cfg)

    with mesh:
        state = replicate(init_train_state(cfg, params), mesh)
        rng = jax.random.PRNGKey(cfg.seed)
        steps = 2 if args.smoke else None
        n = len(datasets["train"]) if datasets else args.global_bs * 2
        order = np.arange(n)
        it = 0
        for epoch in range(1, (1 if args.smoke else args.epochs) + 1):
            # every host computes the SAME global shuffle, then loads only
            # its own contiguous shard of each global batch
            np.random.default_rng(cfg.seed + epoch).shuffle(order)
            t0 = time.time()
            for s in range(n // args.global_bs):
                global_idx = order[s * args.global_bs:(s + 1) * args.global_bs]
                local_idx = host_shard_indices(global_idx)
                if datasets is not None:
                    local = datasets["train"].batch(
                        local_idx, np.random.default_rng(cfg.seed + it),
                    )
                else:  # smoke: synthetic local shard
                    k = len(local_idx)
                    local = {
                        "x": np.zeros((k, cfg.input_res, cfg.input_res,
                                       cfg.input_channels), np.uint8),
                        "pa": np.zeros((k, cfg.context_dim), np.float32),
                    }
                # add the grad-accumulation axis and shard globally
                local = {k2: v[None] for k2, v in local.items()}
                batch = make_global_batch(mesh, local, batch_dim=1)
                state, m = step(state, batch, jax.random.fold_in(rng, it))
                it += 1
                if steps and it >= steps:
                    break
            jax.block_until_ready(m)
            if jax.process_index() == 0:
                print(f"epoch {epoch} | elbo {float(m['elbo']):.4f} | "
                      f"{time.time() - t0:.1f}s", flush=True)
            if steps and it >= steps:
                break
    if jax.process_index() == 0:
        print("multihost run ok", flush=True)


if __name__ == "__main__":
    main()
