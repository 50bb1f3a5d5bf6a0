"""dp=2 sharding-overhead breakdown on UNCONTENDED cores (VERDICT r2 #9).

This host has exactly 2 physical cores, so dp=2 on the virtual CPU mesh is
the one configuration with no core oversubscription.  r2 measured only
67.8% (shard_map) / 75.2% (GSPMD) weak-scaling efficiency there; this probe
decomposes the missing 25-32%:

  single      : plain jit train_step, ONE microbatch, 1 device
                (the perfect-weak-scaling reference time)
  dp2_full    : build_dp_steps on a dp=2 mesh, one microbatch per device
  dp2_nocoll  : same, with jax.lax.pmean/psum monkeypatched to identity
                (isolates the collective cost: full - nocoll)
  residual    : dp2_nocoll - single = partitioning/infeed/runtime overhead

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=2 \
       python results/r3/probe_dp2.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from bench_scaling import make_micro  # noqa: E402


def make_model_and_predict():
    from signnet_basisnet_tpu.models import SignNetGNN
    from signnet_basisnet_tpu.training import make_module_predict
    model = SignNetGNN(n_hid=32, n_out=1, nl_signnet=4, nl_gnn=8, nl_rho=2)
    return model, make_module_predict(model)

REPS = 10


def timeit(fn, state, reps=REPS):
    # fn(state) -> new state; thread it so donated buffers stay live
    state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            state = fn(state)
        jax.block_until_ready(jax.tree.leaves(state)[0])
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main():
    from signnet_basisnet_tpu.data.batcher import stack_microbatches
    from signnet_basisnet_tpu.graph import from_arrays
    from signnet_basisnet_tpu.parallel import build_dp_steps, make_mesh
    from signnet_basisnet_tpu.training import adam, build_steps, create_state

    model, predict = make_model_and_predict()
    tx = adam()
    micro0 = make_micro(0)
    gb0 = from_arrays(micro0)
    make_state = lambda: create_state(model, gb0, tx)  # fresh per phase:
    # the dp steps donate their state argument
    lr = jnp.float32(1e-3)
    rng = jax.random.PRNGKey(0)

    # --- single-device reference (one microbatch = the per-device work)
    train_step, _ = build_steps(predict, tx, donate=False)
    t_single = timeit(lambda s: train_step(s, gb0, lr, rng)[0], make_state())
    print(f"single       {t_single * 1e3:9.2f} ms/step", flush=True)

    # --- dp=2 full
    mesh = make_mesh(2)
    stacked = from_arrays(stack_microbatches([make_micro(i) for i in range(2)]))
    dp_step, _ = build_dp_steps(predict, tx, mesh)
    t_full = timeit(lambda s: dp_step(s, stacked, lr, rng)[0], make_state())
    print(f"dp2_full     {t_full * 1e3:9.2f} ms/step  "
          f"eff={t_single / t_full * 100:.1f}%", flush=True)

    # --- dp=2 with collectives stripped (pmean/psum -> identity)
    orig_pmean, orig_psum = jax.lax.pmean, jax.lax.psum
    jax.lax.pmean = lambda x, axis_name: x
    jax.lax.psum = lambda x, axis_name: x
    try:
        nc_step, _ = build_dp_steps(predict, tx, mesh)
        t_nc = timeit(lambda s: nc_step(s, stacked, lr, rng)[0], make_state())
    finally:
        jax.lax.pmean, jax.lax.psum = orig_pmean, orig_psum
    print(f"dp2_nocoll   {t_nc * 1e3:9.2f} ms/step  "
          f"eff={t_single / t_nc * 100:.1f}%", flush=True)

    print(f"breakdown: collectives {max(t_full - t_nc, 0.0) * 1e3:.2f} ms "
          f"({(t_full - t_nc) / t_full * 100:.1f}% of step); "
          f"partition/runtime residual {max(t_nc - t_single, 0.0) * 1e3:.2f} ms "
          f"({(t_nc - t_single) / t_full * 100:.1f}% of step)")
    print("DP2_PROBE_DONE")


if __name__ == "__main__":
    main()
