"""Data-parallel scaling measurement: rays/s at 1..N chips.

The BASELINE target is >=90% linear rays/s scaling from 1 chip up through
multiple hosts.  This script measures throughput of the sharded whole-epoch
program at increasing mesh sizes; on a multi-chip slice run it as-is, on a
multi-host pod call ``parallel.initialize_distributed()`` first (or set
``--virtual N`` to validate the program on N virtual CPU devices — that
checks the collective program, not real ICI bandwidth).

Prints one JSON line per mesh size:
    {"devices": d, "rays_per_s": r, "efficiency_vs_1": e}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=1024,
                    help="per-device rays per step")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--N_samples", type=int, default=64)
    ap.add_argument("--N_importance", type=int, default=128)
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (program validation)")
    args = ap.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from nerf_pl_tpu.config import Config
    from nerf_pl_tpu.training.optim import get_optimizer
    from nerf_pl_tpu.training.trainer import make_epoch_fn
    from nerf_pl_tpu.parallel.mesh import replicate, shard_rays
    from __graft_entry__ import _flagship_params, _make_rays

    all_devices = jax.devices()
    sizes = []
    d = 1
    while d <= len(all_devices):
        sizes.append(d)
        d *= 2
    if sizes[-1] != len(all_devices):
        sizes.append(len(all_devices))

    base_rate = None
    for nd in sizes:
        mesh = Mesh(np.asarray(all_devices[:nd]), ("rays",))
        cfg = Config(
            N_samples=args.N_samples, N_importance=args.N_importance,
            batch_size=args.batch_size, perturb=1.0, noise_std=1.0,
            use_fused_mlp=not args.virtual,
        )
        opt = get_optimizer("adam", lambda s: 5e-4)
        epoch_fn = make_epoch_fn(cfg, mesh, opt, white_back=True)
        key = jax.random.PRNGKey(0)
        params = replicate(_flagship_params(key), mesh)
        opt_state = replicate(opt.init(jax.device_get(params)), mesh)
        n = nd * args.batch_size * args.steps
        rays = shard_rays(np.asarray(_make_rays(key, n)), mesh)
        rgbs = shard_rays(
            np.asarray(jax.random.uniform(key, (n, 3))), mesh
        )
        # compile + warm
        p, o, losses, _ = epoch_fn(params, opt_state, rays, rgbs, key)
        float(losses[-1])
        t0 = time.perf_counter()
        p, o, losses, _ = epoch_fn(p, o, rays, rgbs, key)
        float(losses[-1])
        dt = time.perf_counter() - t0
        rate = n / dt
        if base_rate is None:
            base_rate = rate / nd
        print(
            json.dumps(
                {
                    "devices": nd,
                    "rays_per_s": round(rate, 1),
                    "efficiency_vs_1": round(rate / (base_rate * nd), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
