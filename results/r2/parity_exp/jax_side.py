"""Export flax init params for image IMG + run the same trajectory in jax."""
import sys
import numpy as np
import jax, jax.numpy as jnp
sys.path.insert(0, '/root/repo')
from signnet_basisnet_tpu.train_filters import FilterModel
from signnet_basisnet_tpu.data import load_twodgrid, filter_labels
from signnet_basisnet_tpu.graph import batch_np, from_arrays
from signnet_basisnet_tpu.training import adam, scale_updates, metrics as M

img = int(sys.argv[1]); epochs = int(sys.argv[2]); seed = int(sys.argv[3])
out_npz = sys.argv[4]

data = load_twodgrid('/root/repo/data/2dgrid/2Dgrid.mat')
n = data['n']
y_all = filter_labels(data, 'band', cache_dir='/root/repo/data/2dgrid')
gb = from_arrays(batch_np([dict(senders=data['senders'], receivers=data['receivers'],
    node_feat=np.zeros((n,1), np.float32))], num_nodes=n, num_edges=len(data['senders']), num_graphs=2))
eigvecs = jnp.asarray(data['eigvecs']); eigvals = jnp.asarray(data['eigvals'])
mask = jnp.asarray(data['mask'])[:, None]
model = FilterModel(net='DS', hidden=32, num_layers=3, use_eig=True,
                    lap_method='sign_inv', sign_inv_net='DS', k=n)
base = seed * 100003 + img
rngs = {'params': jax.random.PRNGKey(base), 'dropout': jax.random.PRNGKey(base+1),
        'sign_flip': jax.random.PRNGKey(base+2)}
x = jnp.asarray(data['x'][:, img:img+1]); y = jnp.asarray(y_all[:, img:img+1])
v = model.init(rngs, gb, x, eigvecs=eigvecs, eigvals=eigvals, training=False)
flat = {'/'.join(str(k.key) for k in p): np.asarray(a)
        for p, a in jax.tree_util.tree_flatten_with_path(v['params'])[0]}
np.savez(out_npz, **flat)
print("exported", len(flat), "params")

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
    upds = scale_updates(upds, 0.01)
    new_params = jax.tree.map(lambda a, b: a + b, params, upds)
    return new_params, new_bs, new_opt, loss

with jax.default_matmul_precision('highest'):
    rng = jax.random.PRNGKey(1000 + base)
    losses = []
    for ep in range(epochs):
        rng, sub = jax.random.split(rng)
        params, bs, opt_state, loss = step(params, bs, opt_state, sub)
        losses.append(float(loss))
        if ep % 10 == 0 or ep == epochs - 1:
            print(f"jax ep {ep}: {float(loss):.6f}", flush=True)
    print("min:", min(losses))
