"""CLI driver: spectral filter regression on the 2D grid (the LearningFilters
workload).

    python -m signnet_basisnet_tpu.train_filters --filter_type band \
        --net DS --lap_method sign_inv --img_num 3

Per-image independent training (fresh model per image, full-batch epochs),
masked MSE loss + r2, CSV results append — the reference script's protocol
(reference: LearningFilters/training.py:230-266).
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from .data import filter_labels, load_twodgrid
from .graph import batch_np, from_arrays
from .models import (FILTER_MODEL_REGISTRY, IGNBasisInv, IGNShared, SignPlus,
                     basis_features)
from .models.spectral_filters import DeepSetsNet, MLPNet, TransformerNet
from .nn.deepsets import EqDeepSetsEncoder
from .nn.mlp import MLP as MLPBlock
from .spectral import eigenspace_layout, projectors_by_multiplicity, prop_higher_mult
from .training import adam, count_params, metrics as M, scale_updates
from flax import linen as nn


class SignInvPE(nn.Module):
    """phi(v)+phi(-v) per eigvec + DeepSets rho over [phi_out | eigvals]
    (reference: LearningFilters/training.py:101-109, gen_sign_inv/gen_rho)."""
    sign_inv_net: str = "DS"
    pe_dim: int = 32
    num_layers: int = 2

    @nn.compact
    def __call__(self, eigvecs, eigvals, training: bool = True):
        n, k = eigvecs.shape
        v = eigvecs.T[..., None]                     # k x n x 1
        if self.sign_inv_net == "DS":
            inner = EqDeepSetsEncoder(hidden=32, out=1, num_layers=3,
                                      use_bn=True, name="phi")
        elif self.sign_inv_net == "MLP":
            inner = MLPBlock(hidden=32, out=1, num_layers=self.num_layers,
                             use_bn=True, bn_track_running_stats=False,
                             name="phi")
        elif self.sign_inv_net == "Transformer":
            inner = _TransformerInner(name="phi")
        else:
            raise ValueError(self.sign_inv_net)
        feats = SignPlus(inner, name="signplus")(v, training=training)
        feats = jnp.swapaxes(feats, 0, 1).reshape(n, -1)   # n x k
        lam = jnp.broadcast_to(eigvals[None, :], (n, k))
        feats = jnp.concatenate([feats, lam], axis=-1)     # n x 2k
        rho = EqDeepSetsEncoder(hidden=10, out=self.pe_dim, num_layers=3,
                                use_bn=True, name="rho")
        return rho(feats, training=training)


class _TransformerInner(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = True):
        t = TransformerNet(hidden=32, out=1, num_layers=2, name="t")
        return t(None, x, training=training)


class BasisInvPE(nn.Module):
    """IGN per multiplicity bucket + DeepSets rho (reference:
    LearningFilters/training.py:119-126)."""
    mult_list: tuple
    pe_dim: int = 32
    shared: bool = False
    ign_hidden: int = 32

    @nn.compact
    def __call__(self, projs, eigvals, n, training: bool = True):
        net = (IGNShared(self.mult_list, hidden=min(self.ign_hidden, 16),
                         name="ign") if self.shared
               else IGNBasisInv(self.mult_list, hidden=self.ign_hidden,
                                name="ign"))
        phi_outs = net(projs, training=training)
        feats = basis_features(phi_outs, n)               # n x (total vecs)
        lam = jnp.broadcast_to(eigvals[None, :], (n, eigvals.shape[0]))
        feats = jnp.concatenate([feats, lam], axis=-1)
        rho = EqDeepSetsEncoder(hidden=10, out=self.pe_dim, num_layers=3,
                                use_bn=True, name="rho")
        return rho(feats, training=training)


class FilterModel(nn.Module):
    """Base node-regression net + optional eig features (reference:
    get_lap_feat, LearningFilters/training.py:87-130)."""
    net: str = "DS"
    hidden: int = 32
    num_layers: int = 2
    use_eig: bool = False
    lap_method: str = "none"
    sign_inv_net: str = "DS"
    basis_inv_net: str = "IGN"
    mult_list: tuple = ()
    k: int = 0
    ign_hidden: int = 32

    @nn.compact
    def __call__(self, gb, x, eigvecs=None, eigvals=None, projs=None,
                 training: bool = True):
        if self.use_eig:
            n = x.shape[0]
            if self.lap_method == "none":
                lam = jnp.broadcast_to(eigvals[None, :], (n, self.k))
                x = jnp.concatenate([x, eigvecs, lam], -1)
            elif self.lap_method == "abs_val":
                lam = jnp.broadcast_to(eigvals[None, :], (n, self.k))
                x = jnp.concatenate([x, jnp.abs(eigvecs), lam], -1)
            elif self.lap_method == "sign_flip":
                rng = self.make_rng("sign_flip") if training else None
                v = eigvecs
                if rng is not None:
                    flips = jnp.where(
                        jax.random.uniform(rng, (v.shape[1],)) >= 0.5, 1., -1.)
                    v = v * flips[None, :]
                lam = jnp.broadcast_to(eigvals[None, :], (n, self.k))
                x = jnp.concatenate([x, v, lam], -1)
            elif self.lap_method == "sign_inv":
                pe = SignInvPE(self.sign_inv_net, name="pe")(
                    eigvecs, eigvals, training=training)
                x = jnp.concatenate([x, pe], -1)
            elif self.lap_method == "basis_inv":
                pe = BasisInvPE(self.mult_list,
                                shared=self.basis_inv_net == "IGNShared",
                                ign_hidden=self.ign_hidden,
                                name="pe")(projs, eigvals, n,
                                           training=training)
                x = jnp.concatenate([x, pe], -1)
            else:
                raise ValueError(self.lap_method)
        base = FILTER_MODEL_REGISTRY[self.net](
            hidden=self.hidden, num_layers=self.num_layers, name="base")
        return base(gb, x, training=training)


def run(args, log=print):
    blk = max(1, min(args.scan_epochs, args.epochs))
    if args.epochs % blk != 0:
        # the epoch loop always runs whole scan blocks; a non-divisible
        # count would silently train up to blk-1 extra epochs (ADVICE r3)
        raise ValueError(
            f"--epochs ({args.epochs}) must be a multiple of "
            f"--scan_epochs ({blk})")
    if getattr(args, "matmul_precision", None):
        # TPU f32 matmuls default to reduced-precision bf16 passes; the
        # reference trains true-f32 on CUDA.  'highest' restores parity
        # (3-pass f32 emulation) — decisive for images that must reach
        # ~1e-4 full-batch MSE.
        with jax.default_matmul_precision(args.matmul_precision):
            return _run(args, log)
    return _run(args, log)


def _rotate_within_eigenspaces(V, w, rot_seed: int):
    """Apply a random orthogonal rotation inside every repeated eigenspace.

    The eigenvector basis of a repeated eigenvalue is arbitrary (LAPACK
    returns SOME orthonormal basis; 96.9% of the 2D grid's eigenvectors
    live in repeated spaces) and the reference shipped neither its basis
    realization nor a seed — per-image trainability is a joint property
    of (basis draw, init draw) (RESULTS.md r2 #3).  This re-draws the
    basis without changing the spectral content."""
    V = np.asarray(V, np.float64).copy()
    rng = np.random.default_rng(rot_seed)
    rounded = np.round(np.asarray(w), 5)
    uniq, inv = np.unique(rounded, return_inverse=True)
    for gi in range(len(uniq)):
        cols = np.where(inv == gi)[0]
        if len(cols) > 1:
            Q, _ = np.linalg.qr(rng.normal(size=(len(cols), len(cols))))
            V[:, cols] = V[:, cols] @ Q
    return V.astype(np.float32)


def _run(args, log=print):
    data = load_twodgrid(args.mat_path)
    n = data["n"]
    if args.basis_rot_seed >= 0:
        data = dict(data)
        data["eigvecs"] = _rotate_within_eigenspaces(
            data["eigvecs"], data["eigvals"], args.basis_rot_seed)
        log(f"eigvec basis re-drawn within eigenspaces "
            f"(rot_seed {args.basis_rot_seed})")
    y_all = filter_labels(data, args.filter_type, cache_dir=args.label_dir)
    gb = from_arrays(batch_np(
        [dict(senders=data["senders"], receivers=data["receivers"],
              node_feat=np.zeros((n, 1), np.float32))],
        num_nodes=n, num_edges=len(data["senders"]), num_graphs=2))

    eigvecs = jnp.asarray(data["eigvecs"][:, :args.k]) if args.k else \
        jnp.asarray(data["eigvecs"])
    eigvals = jnp.asarray(data["eigvals"][:eigvecs.shape[1]])
    k = eigvecs.shape[1]
    mask = jnp.asarray(data["mask"])[:, None]

    projs = None
    mult_list = ()
    if args.lap_method == "basis_inv":
        layout = eigenspace_layout(np.asarray(data["eigvals"]))
        log(f"prop vecs in higher mult: {prop_higher_mult(layout, n):.4f}; "
            f"num eigenspaces: {layout.num_spaces}")
        projs_np = projectors_by_multiplicity(data["eigvecs"], layout)
        projs = {m: jnp.asarray(P[:, None]) for m, P in projs_np.items()}
        mult_list = tuple(layout.uniq_mults)

    model = FilterModel(net=args.net, hidden=args.hidden_channels,
                        num_layers=args.num_layers, use_eig=args.use_eig,
                        lap_method=args.lap_method,
                        sign_inv_net=args.sign_inv_net,
                        basis_inv_net=args.basis_inv_net,
                        mult_list=mult_list, k=k,
                        ign_hidden=args.ign_hidden)
    tx = adam()
    results = []
    x_all = jnp.asarray(data["x"])
    kwargs = dict(eigvecs=eigvecs, eigvals=eigvals, projs=projs)
    from functools import partial as _partial
    init_fn = jax.jit(_partial(model.init, training=False))

    # One jitted step shared across all images (x/y are runtime args, so the
    # per-image fresh-model protocol never retriggers compilation).
    def train_step(params, bs, opt_state, rng, x, y, eig_kwargs):
        def loss_fn(p):
            pred, upd = model.apply(
                {"params": p, "batch_stats": bs}, gb, x, training=True,
                rngs={"dropout": rng, "sign_flip": rng},
                mutable=["batch_stats"], **eig_kwargs)
            return M.masked_mse_sum(pred, y, mask), \
                (pred, upd.get("batch_stats", bs))
        (loss, (pred, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        upds, new_opt = tx.update(grads, opt_state, params)
        upds = scale_updates(upds, args.lr)
        new_params = jax.tree.map(lambda a, b: a + b, params, upds)
        r2 = M.masked_r2(pred, y, mask)
        return new_params, new_bs, new_opt, loss, r2

    jit_step_shared = jax.jit(train_step)

    # Device-side epoch blocks: lax.scan over `scan_epochs` full-batch steps
    # per launch, tracking the best (loss, r2) in the carry — removes the
    # per-epoch host round-trip (the bottleneck on a tunneled TPU backend).
    def epoch_block(params, bs, opt_state, best_loss, best_r2, rngs_blk, x, y,
                    eig_kwargs):
        def body(carry, rng):
            params, bs, opt_state, best_loss, best_r2 = carry
            params, bs, opt_state, loss, r2 = train_step(
                params, bs, opt_state, rng, x, y, eig_kwargs)
            # reference records the r2 AT the min-loss epoch, not an
            # independent max (LearningFilters/training.py:241-245)
            better = loss < best_loss
            best_r2 = jnp.where(better, r2, best_r2)
            best_loss = jnp.where(better, loss, best_loss)
            return (params, bs, opt_state, best_loss, best_r2), None
        (params, bs, opt_state, best_loss, best_r2), _ = jax.lax.scan(
            body, (params, bs, opt_state, best_loss, best_r2), rngs_blk)
        return params, bs, opt_state, best_loss, best_r2

    jit_block = jax.jit(epoch_block)

    img_ids = list([int(s) for s in args.img_ids.split(",")]
                   if getattr(args, "img_ids", "") else range(args.img_num))

    vm = max(1, int(getattr(args, "vmap_images", 1)))
    if vm > 1:
        return _run_vmapped(args, log, img_ids, vm, model, tx, gb, mask,
                            x_all, y_all, kwargs, init_fn, epoch_block)

    for img in img_ids:
        x = x_all[:, img:img + 1]
        y = jnp.asarray(y_all[:, img:img + 1])
        base = args.seed * 100003 + img
        rngs = {"params": jax.random.PRNGKey(base),
                "dropout": jax.random.PRNGKey(base + 1),
                "sign_flip": jax.random.PRNGKey(base + 2)}
        variables = init_fn(rngs, gb, x, **kwargs)
        params, bs = variables["params"], variables.get("batch_stats", {})
        opt_state = tx.init(params)
        if img == 0:
            log(f"PARAMETERS: {count_params(params)}")

        t0 = time.time()
        rng = jax.random.PRNGKey(1000 + base)
        blk = max(1, min(args.scan_epochs, args.epochs))
        best_loss = jnp.float32(jnp.inf)
        best_r2 = jnp.float32(0.0)
        done = 0
        while done < args.epochs:
            # always runs a full blk-epoch block (fixed size: one compile);
            # epochs is a multiple of scan_epochs in every protocol config
            rng, sub = jax.random.split(rng)
            rngs_blk = jax.random.split(sub, blk)  # fixed size: one compile
            params, bs, opt_state, best_loss, best_r2 = jit_block(
                params, bs, opt_state, best_loss, best_r2, rngs_blk, x, y,
                kwargs)
            done += blk
            if done % 500 < blk or done >= args.epochs:
                log(f"img {img} epoch {done} min_loss {float(best_loss):.6f} "
                    f"best_r2 {float(best_r2):.4f} ({time.time() - t0:.1f}s)")
                t0 = time.time()
        best_loss, best_r2 = float(best_loss), float(best_r2)
        results.append([best_loss, best_r2])
        log(f"img {img + 1}: loss={best_loss:.6f} r2={best_r2:.4f}")

    return _report(args, results, log)


def _report(args, results, log):
    arr = np.array(results)
    log(f"mean loss= {arr[:, 0].mean():.8f} stdev= {arr[:, 0].std():.8f} "
        f"mean r2= {arr[:, 1].mean():.6f}")
    if args.results_dir:
        os.makedirs(args.results_dir, exist_ok=True)
        p = os.path.join(args.results_dir,
                         f"{args.filter_type}_{args.img_num}.csv")
        with open(p, "a") as f:
            f.write(f"{args.net},{arr[:, 0].mean():.8f},{arr[:, 0].std():.8f},"
                    f"{args.use_eig},{args.lap_method},{args.hidden_channels},"
                    f"{args.num_layers}\n")
    return arr


def _run_vmapped(args, log, img_ids, vm, model, tx, gb, mask, x_all, y_all,
                 kwargs, init_fn, epoch_block):
    """Image-parallel training: vmap the whole per-image protocol (fresh
    model, full-batch Adam epochs) over chunks of `vm` images at once.

    The per-image math is identical to the serial path — same init keys,
    same rng streams, same best-(loss, r2) tracking — but one jitted
    program trains `vm` independent models simultaneously, so the TPU sees
    batched matmuls instead of 50 sequential tiny-model runs.  Protocol per
    reference LearningFilters/training.py:230-255 (per-image fresh model);
    batching images is an execution-schedule change only."""

    def init_one(rngs, x):
        return init_fn(rngs, gb, x, **kwargs)

    vinit = jax.jit(jax.vmap(init_one))
    vtx_init = jax.jit(jax.vmap(tx.init))
    in_ax = (0, 0, 0, 0, 0, 0, 0, 0, None)
    vblock = jax.jit(jax.vmap(epoch_block, in_axes=in_ax))

    blk = max(1, min(args.scan_epochs, args.epochs))

    def vsplit_one(key):
        # same stream as the serial loop: rng, sub = split(rng);
        # rngs_blk = split(sub, blk)
        key, sub = jax.random.split(key)
        return key, jax.random.split(sub, blk)

    vsplit = jax.jit(jax.vmap(vsplit_one))

    results = {}
    for c0 in range(0, len(img_ids), vm):
        chunk = img_ids[c0:c0 + vm]
        bases = [args.seed * 100003 + img for img in chunk]
        xs = jnp.stack([x_all[:, img:img + 1] for img in chunk])
        ys = jnp.stack([jnp.asarray(y_all[:, img:img + 1]) for img in chunk])
        rngs = {
            "params": jnp.stack([jax.random.PRNGKey(b) for b in bases]),
            "dropout": jnp.stack([jax.random.PRNGKey(b + 1) for b in bases]),
            "sign_flip": jnp.stack([jax.random.PRNGKey(b + 2)
                                    for b in bases]),
        }
        variables = vinit(rngs, xs)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        opt_state = vtx_init(params)
        if c0 == 0:
            one = jax.tree.map(lambda a: a[0], params)
            log(f"PARAMETERS: {count_params(one)} "
                f"(x{vm} image-parallel models)")

        t0 = time.time()
        rng = jnp.stack([jax.random.PRNGKey(1000 + b) for b in bases])
        best_loss = jnp.full((len(chunk),), jnp.inf, jnp.float32)
        best_r2 = jnp.zeros((len(chunk),), jnp.float32)
        done = 0
        while done < args.epochs:
            rng, rngs_blk = vsplit(rng)
            params, bs, opt_state, best_loss, best_r2 = vblock(
                params, bs, opt_state, best_loss, best_r2, rngs_blk, xs, ys,
                kwargs)
            done += blk
            if done % 1000 < blk or done >= args.epochs:
                bl = np.asarray(best_loss)
                log(f"imgs {chunk[0]}-{chunk[-1]} epoch {done} "
                    f"mean_min_loss {bl.mean():.6f} worst {bl.max():.6f} "
                    f"({time.time() - t0:.1f}s)")
                t0 = time.time()
        bl, br = np.asarray(best_loss), np.asarray(best_r2)
        for i, img in enumerate(chunk):
            results[img] = [float(bl[i]), float(br[i])]
            log(f"img {img + 1}: loss={bl[i]:.6f} r2={br[i]:.4f}")
    return _report(args, [results[i] for i in img_ids], log)


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--filter_type", default="band",
                    choices=["low", "high", "band", "rejection", "comb",
                             "low_band"])
    ap.add_argument("--net", default="BernNet",
                    choices=list(FILTER_MODEL_REGISTRY))
    ap.add_argument("--img_num", type=int, default=3)
    ap.add_argument("--img_ids", default="",
                    help="comma-separated image indices (overrides img_num)")
    ap.add_argument("--use_eig", action="store_true")
    ap.add_argument("--lap_method", default="none")
    ap.add_argument("--sign_inv_net", default="DS")
    ap.add_argument("--basis_inv_net", default="IGN")
    ap.add_argument("--ign_hidden", type=int, default=32,
                    help="IGN phi width; 16 reproduces the published "
                         "48k-param BasisNet row (the reference code's "
                         "constructor default before hidden_channels=32 "
                         "was hardcoded in gen_basis_inv)")
    ap.add_argument("--hidden_channels", type=int, default=32)
    ap.add_argument("--num_layers", type=int, default=2)
    ap.add_argument("--scan_epochs", type=int, default=100,
                    help="epochs per on-device lax.scan block")
    ap.add_argument("--vmap_images", type=int, default=1,
                    help="train this many images' independent models "
                         "simultaneously via vmap (1 = serial protocol; "
                         "same per-image math either way)")
    ap.add_argument("--matmul_precision", default=None,
                    choices=[None, "default", "high", "highest"],
                    help="jax.default_matmul_precision for the run; "
                         "'highest' = f32 parity with the CUDA reference")
    ap.add_argument("--k", type=int, default=0,
                    help="use only first k eigvecs (0 = all)")
    ap.add_argument("--basis_rot_seed", type=int, default=-1,
                    help=">=0: random orthogonal re-draw of the eigvec "
                         "basis inside repeated eigenspaces (the LAPACK "
                         "basis is arbitrary; reference pinned neither "
                         "basis nor seed)")
    ap.add_argument("--mat_path", default="data/2dgrid/2Dgrid.mat")
    ap.add_argument("--label_dir", default="data/2dgrid")
    ap.add_argument("--results_dir", default="results")
    return ap


if __name__ == "__main__":
    run(build_parser().parse_args())
