"""Same image/seed, eigvec basis rotated inside each eigenspace."""
import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from signnet_basisnet_tpu.train_filters import FilterModel
from signnet_basisnet_tpu.data import load_twodgrid, filter_labels
from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.training import adam, scale_updates, metrics as M

img, epochs, seed, rot_seed = (int(a) for a in sys.argv[1:5])
data = load_twodgrid('/root/repo/data/2dgrid/2Dgrid.mat')
n = data['n']
y_all = filter_labels(data, 'band', cache_dir='/root/repo/data/2dgrid')
V = np.asarray(data['eigvecs'], np.float64).copy()
w = np.asarray(data['eigvals'])
if rot_seed >= 0:
    rng = np.random.default_rng(rot_seed)
    rounded = np.round(w, 5)
    uniq, inv = np.unique(rounded, return_inverse=True)
    for gi in range(len(uniq)):
        cols = np.where(inv == gi)[0]
        if len(cols) > 1:
            Q, _ = np.linalg.qr(rng.normal(size=(len(cols), len(cols))))
            V[:, cols] = V[:, cols] @ Q
gb = from_arrays(batch_np([dict(senders=data['senders'], receivers=data['receivers'],
    node_feat=np.zeros((n,1), np.float32))], num_nodes=n, num_edges=len(data['senders']), num_graphs=2))
eigvecs = jnp.asarray(V.astype(np.float32)); eigvals = jnp.asarray(w)
mask = jnp.asarray(data['mask'])[:, None]
model = FilterModel(net='DS', hidden=32, num_layers=3, use_eig=True,
                    lap_method='sign_inv', sign_inv_net='DS', k=n)
base = seed * 100003 + img
rngs = {'params': jax.random.PRNGKey(base), 'dropout': jax.random.PRNGKey(base+1),
        'sign_flip': jax.random.PRNGKey(base+2)}
x = jnp.asarray(data['x'][:, img:img+1]); y = jnp.asarray(y_all[:, img:img+1])
v = model.init(rngs, gb, x, eigvecs=eigvecs, eigvals=eigvals, training=False)
tx = adam()
params, bs = v['params'], v.get('batch_stats', {})
opt_state = tx.init(params)

@jax.jit
def step(params, bs, opt_state, rng):
    def loss_fn(p):
        pred, upd = model.apply({'params': p, 'batch_stats': bs}, gb, x,
                                training=True, rngs={'dropout': rng, 'sign_flip': rng},
                                mutable=['batch_stats'], eigvecs=eigvecs, eigvals=eigvals)
        return M.masked_mse_sum(pred, y, mask), upd.get('batch_stats', bs)
    (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    upds, new_opt = tx.update(grads, opt_state, params)
    new_params = jax.tree.map(lambda a, b: a + b, params, scale_updates(upds, 0.01))
    return new_params, new_bs, new_opt, loss

with jax.default_matmul_precision('highest'):
    rng = jax.random.PRNGKey(1000 + base)
    best = float('inf')
    for ep in range(epochs):
        rng, sub = jax.random.split(rng)
        params, bs, opt_state, loss = step(params, bs, opt_state, sub)
        best = min(best, float(loss))
        if ep % 50 == 0 or ep == epochs - 1:
            print(f"rot={rot_seed} ep {ep}: loss {float(loss):.6f} best {best:.6f}", flush=True)
