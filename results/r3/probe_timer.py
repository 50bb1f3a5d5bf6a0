"""Is block_until_ready() a real completion barrier on the axon tunnel?

The batch-2048 roofline row implies 298 TFLOP/s — above the chip's bf16
peak (197), so the TIMER, not the model, must be wrong there (same
artifact as r2's step "77x faster than its own speed of light").  This
probe times the same 30-step chained train-step loop three ways:

  a) block_until_ready(m['loss'])     (the bench's barrier)
  b) float(jax.device_get(m['loss'])) (a data-dependent value fetch —
                                       cannot return before the value
                                       exists; forces the whole chain)
  c) per-step float(m['loss'])        (full sync every step)

If (b) >> (a), block_until_ready returns early through the tunnel and
every wall-clock number collected with it at this size underestimates.
Run on the TPU: python results/r3/probe_timer.py [batch_graphs]
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench_roofline import build, HIDDEN, N_LAYERS, K, SIGN_INV_LAYERS, \
    PHI_OUT
from signnet_basisnet_tpu.graph import from_arrays
from signnet_basisnet_tpu.models import GINNet
from signnet_basisnet_tpu.training import (adam, build_steps, create_state,
                                           make_zinc_predict)

BG = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = 30

arrays = build(BG)
gb = from_arrays(arrays)
edges = float(np.asarray(arrays["edge_mask"]).sum())
model = GINNet(hidden_dim=HIDDEN, out_dim=HIDDEN, n_layers=N_LAYERS,
               pos_enc_dim=K, lap_method="sign_inv",
               sign_inv_layers=SIGN_INV_LAYERS, phi_out_dim=PHI_OUT,
               batch_norm=True, dropout=0.0)
tx = adam()
state0 = create_state(model, gb, tx, model_kwargs={"pos_enc": gb.eigvecs})
predict = make_zinc_predict(model, lap_method="sign_inv")
train_step, _ = build_steps(predict, tx, donate=False)
lr = jnp.float32(1e-3)
rng = jax.random.PRNGKey(0)

st, m = state0, None
for _ in range(5):
    st, m = train_step(st, gb, lr, rng)
jax.block_until_ready(m["loss"])

def run(barrier):
    st = state0
    t0 = time.perf_counter()
    for _ in range(STEPS):
        st, m = train_step(st, gb, lr, rng)
    out = barrier(m)
    dt = time.perf_counter() - t0
    return dt / STEPS, out

def run_sync():
    st = state0
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(STEPS):
        st, m = train_step(st, gb, lr, rng)
        s += float(m["loss"])
    return (time.perf_counter() - t0) / STEPS, s

for name, fn in [
    ("block_until_ready", lambda: run(lambda m: jax.block_until_ready(m["loss"]))),
    ("device_get(final)", lambda: run(lambda m: float(jax.device_get(m["loss"])))),
    ("per-step fetch   ", run_sync),
]:
    best = float("inf")
    for _ in range(3):
        dt, out = fn()
        best = min(best, dt)
    print(f"batch={BG} {name}: {best * 1e3:8.3f} ms/step  "
          f"{edges / best / 1e6:8.2f} M edges/s", flush=True)
print("TIMER_PROBE_DONE")
