"""CLI driver: ZINC graph regression (the GraphPrediction workload).

    python -m signnet_basisnet_tpu.train_zinc --config configs/gin_signinv.json \
        [key value ...]

Reproduces the reference pipeline (reference:
GraphPrediction/main_ZINC_graph_regression.py:94-252): PE init -> model ->
Adam + plateau LR -> epoch loop with val/test eval, checkpointing, min-lr /
max-time stops, final results dump.
"""
from __future__ import annotations

import argparse
import json
import os
import time

import jax
import numpy as np

from .data import (add_full_evd, add_lap_pe, add_rwpe, avg_degree_stats,
                   choose_budgets, iterate_graphbatches, load_zinc,
                   pack_batches)
from .graph import from_arrays
from .models import gnn_model
from .training import (Checkpointer, adam, build_steps, count_params,
                       create_state, fit, load_config, make_lapeig_loss_fn,
                       make_zinc_predict)


def prepare_data(cfg):
    splits, real = load_zinc(cfg.data.data_dir, subset=cfg.data.subset,
                             synth_sizes=(cfg.data.synth_train,
                                          cfg.data.synth_eval,
                                          cfg.data.synth_eval))
    k = cfg.model.pos_enc_dim
    for graphs in splits.values():
        if cfg.data.pe_mode == "lap_pe":
            add_lap_pe(graphs, k)
        elif cfg.data.pe_mode == "full_evd":
            add_full_evd(graphs, normalization=cfg.data.evd_normalization)
        elif cfg.data.pe_mode == "rwpe":
            add_rwpe(graphs, k)
    return splits, real


def run(cfg, log=print):
    if cfg.train.matmul_precision:
        with jax.default_matmul_precision(cfg.train.matmul_precision):
            return _run(cfg, log)
    return _run(cfg, log)


def _run(cfg, log=print):
    t0 = time.time()
    splits, real = prepare_data(cfg)
    log(f"dataset: ZINC ({'real' if real else 'synthetic'}) "
        f"train={len(splits['train'])} val={len(splits['val'])} "
        f"test={len(splits['test'])}")

    if cfg.data.agg_backend != "xla":
        from .graph import segment as seg
        if cfg.data.agg_backend == "tile_dense":
            # pure-XLA backend: works on every platform
            seg.set_agg_backend("tile_dense")
        elif jax.default_backend() == "cpu":
            # Pallas kernels need a TPU (or interpret mode); numerics are
            # backend-equivalent (tests/test_tiled_spmm.py), so CPU smoke
            # runs of chip-tuned configs silently use the XLA lowering
            log(f"agg_backend={cfg.data.agg_backend} requested but backend "
                f"is cpu: using xla aggregation (numerics identical)")
        else:
            seg.set_agg_backend(cfg.data.agg_backend)
    tile = cfg.data.tile
    nb, eb, gb_cnt = choose_budgets(splits["train"], cfg.train.batch_size,
                                    slack=cfg.data.batch_slack,
                                    align=cfg.data.batch_align, tile=tile)
    # fixed K even for full-EVD mode: pos_enc_dim is set to the dataset's
    # max node count there (37 for ZINC), keeping every batch one shape
    k = cfg.model.pos_enc_dim
    make_arrays = lambda graphs, shuffle, seed: pack_batches(
        graphs, nb, eb, gb_cnt, shuffle=shuffle, seed=seed, k=k, tile=tile)
    make_batches = lambda graphs, shuffle, seed: [
        from_arrays(a) for a in make_arrays(graphs, shuffle, seed)]
    val_batches = make_batches(splits["val"], False, 0)
    test_batches = make_batches(splits["test"], False, 0)

    params = dict(
        hidden_dim=cfg.model.hidden_dim, out_dim=cfg.model.out_dim,
        n_layers=cfg.model.n_layers, readout=cfg.model.readout,
        in_feat_dropout=cfg.model.in_feat_dropout, dropout=cfg.model.dropout,
        batch_norm=cfg.model.batch_norm, residual=cfg.model.residual,
        edge_feat=cfg.model.edge_feat, pe_init=cfg.model.pe_init,
        lap_method=cfg.model.lap_method, pos_enc_dim=cfg.model.pos_enc_dim,
        sign_inv_net=cfg.model.sign_inv_net,
        sign_inv_layers=cfg.model.sign_inv_layers,
        phi_out_dim=cfg.model.phi_out_dim,
        pe_aggregate=cfg.model.pe_aggregate,
        max_nodes=cfg.model.max_nodes,
        remat=cfg.model.remat,
    )
    use_lspe = cfg.model.use_lspe and cfg.model.model in ("GIN", "GatedGCN")
    if use_lspe:
        params["use_lspe"] = True
    if cfg.model.model in ("GAT", "Transformer"):
        params["num_heads"] = cfg.model.num_heads
    if cfg.model.model == "Transformer":
        params["full_graph"] = cfg.model.full_graph
        params["layer_norm"] = cfg.model.layer_norm
    if cfg.model.model == "PNA":
        avg_d = avg_degree_stats(splits["train"])
        params.update(avg_d_log=avg_d["log"], towers=cfg.model.towers,
                      gru=cfg.model.gru, no_towers=cfg.model.no_towers,
                      **cfg.model.extra)

    model = gnn_model(cfg.model.model, **params)
    tx = adam(cfg.train.weight_decay)
    rng = jax.random.PRNGKey(cfg.train.seed)
    state = create_state(model, val_batches[0], tx, rng=rng,
                         model_kwargs={"pos_enc": val_batches[0].eigvecs})
    log(f"model: {cfg.model.model} params={count_params(state.params)}")

    if cfg.train.eval_bn_mode == "batch" and (
            cfg.model.dropout > 0 or cfg.model.in_feat_dropout > 0):
        # batch-stats eval runs the forward with training=True, which would
        # also enable dropout — only valid for dropout-free configs (all
        # reference ZINC sign-inv configs are); fail fast instead of
        # silently evaluating with dropout on (ADVICE r3)
        raise ValueError(
            "eval_bn_mode='batch' requires dropout=0 and in_feat_dropout=0 "
            f"(got {cfg.model.dropout}, {cfg.model.in_feat_dropout})")
    use_lapeig = cfg.model.use_lapeig_loss and use_lspe
    import jax.numpy as jnp
    cdtype = (jnp.dtype(cfg.train.compute_dtype)
              if cfg.train.compute_dtype else None)
    predict = make_zinc_predict(model, lap_method=cfg.model.lap_method,
                                return_p=use_lapeig, compute_dtype=cdtype)
    if use_lapeig:
        loss_fn = make_lapeig_loss_fn(cfg.model.alpha_loss,
                                      cfg.model.lambda_loss,
                                      cfg.model.pos_enc_dim)
        train_step, eval_step = build_steps(
            predict, tx, loss_fn=loss_fn,
            eval_bn_mode=cfg.train.eval_bn_mode)
    else:
        train_step, eval_step = build_steps(
            predict, tx, eval_bn_mode=cfg.train.eval_bn_mode)

    ckpt = (Checkpointer(cfg.train.checkpoint_dir, cfg.train.keep_checkpoints)
            if cfg.train.checkpoint_dir else None)

    if cfg.train.mp > 1:
        # model-parallel training (parallel/mp_halo): nodes+edges sharded
        # over an mp mesh axis, per-layer neighbor-only halo all_to_all,
        # params replicated.  fit() is step-contract-agnostic, so only the
        # batch representation and the step builders change.
        if use_lapeig:
            raise ValueError("train.mp > 1 does not support use_lapeig_loss")
        from .parallel import (build_mp_steps, device_arrays_mp, make_mesh,
                               partition_batch_mp)
        from .parallel.mp_halo import mp_budgets
        mp = cfg.train.mp
        mesh_mp = make_mesh(dp=1, mp=mp, devices=jax.devices()[:mp])
        probe = (make_arrays(splits["val"], False, 0)
                 + make_arrays(splits["test"], False, 0)
                 + make_arrays(splits["train"], True, cfg.train.seed))
        e_sh, H = mp_budgets(probe, mp)
        e_sh = -(-int(e_sh * 1.2) // 8) * 8    # headroom: shuffled epochs
        H = -(-int(H * 2) // 8) * 8            # shift shard boundaries
        log(f"mp={mp}: edge shard {e_sh}, halo {H} rows/pair "
            f"(vs {nb} nodes — boundary-only exchange)")
        part = lambda arrays: jax.tree.map(
            jnp.asarray, device_arrays_mp(
                partition_batch_mp(arrays, mp, e_shard=e_sh, halo=H)))
        val_batches = [part(a) for a in make_arrays(splits["val"], False, 0)]
        test_batches = [part(a)
                        for a in make_arrays(splits["test"], False, 0)]
        train_step, eval_step = build_mp_steps(predict, tx, mesh_mp)
        train_fn = lambda ep: [part(a) for a in make_arrays(
            splits["train"], True, cfg.train.seed + ep)]
    else:
        # background-thread prefetch: packing + host->device transfer of the
        # next batches overlap device compute (the reference's DataLoader
        # workers, main_ZINC_graph_regression.py:165-167)
        train_fn = lambda ep: iterate_graphbatches(
            splits["train"], nb, eb, gb_cnt, shuffle=True,
            seed=cfg.train.seed + ep, k=k, tile=tile, prefetch=4)

    result = fit(
        state, train_step, eval_step,
        train_batches_fn=train_fn,
        val_batches_fn=lambda: val_batches,
        test_batches_fn=lambda: test_batches,
        epochs=cfg.train.epochs, init_lr=cfg.train.init_lr,
        lr_reduce_factor=cfg.train.lr_reduce_factor,
        lr_schedule_patience=cfg.train.lr_schedule_patience,
        min_lr=cfg.train.min_lr, max_time_hours=cfg.train.max_time_hours,
        seed=cfg.train.seed, log_every=cfg.train.print_epoch_interval,
        logger=log, checkpointer=ckpt, resume=cfg.train.resume,
        eval_sign_flip=(cfg.model.lap_method == "sign_flip"
                        and cfg.model.eval_sign_flip),
    )
    log(f"FINAL: test_mae={result.test_mae:.4f} val_mae={result.val_mae:.4f} "
        f"epochs={result.epochs_run} time={(time.time() - t0) / 3600:.2f}h")
    # last-epoch test is the reference's reporting (main_ZINC_graph_
    # regression.py:233-252); test@best-val is additionally reported since
    # a late eval-corruption epoch (BN dead-channel blowup, RESULTS.md r3)
    # can poison the last-epoch number while never being best-val
    log(f"FINAL_BEST_VAL: test_mae={result.best_val_test_mae:.4f} "
        f"val_mae={result.best_val_mae:.4f}")

    if cfg.out_dir:
        os.makedirs(cfg.out_dir, exist_ok=True)
        with open(os.path.join(cfg.out_dir, f"{cfg.name}_results.json"),
                  "w") as f:
            json.dump(dict(test_mae=result.test_mae, val_mae=result.val_mae,
                           best_val_test_mae=result.best_val_test_mae,
                           best_val_mae=result.best_val_mae,
                           epochs=result.epochs_run, config=cfg.to_dict(),
                           history=result.history), f, indent=2)
    return result


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args(argv)
    cfg = load_config(args.config, args.overrides)
    run(cfg)


if __name__ == "__main__":
    main()
