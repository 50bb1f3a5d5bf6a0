"""Image-parallel (vmap) filter training matches the serial protocol.

The vmapped runner trains `vm` independent per-image models in one jitted
program (train_filters._run_vmapped); per-image math — init keys, rng
streams, Adam updates, best-(loss, r2) tracking — is identical to the
serial path, so after a few epochs the per-image losses must agree to
float tolerance (exact bitwise equality is not expected: batched matmuls
reassociate differently).
"""
import numpy as np
import pytest

from signnet_basisnet_tpu.train_filters import build_parser, run


def _args(**over):
    ap = build_parser()
    args = ap.parse_args([])
    args.net = "MLP"
    args.use_eig = True
    args.lap_method = "sign_inv"
    args.sign_inv_net = "MLP"
    args.k = 8
    args.img_num = 2
    args.epochs = 4
    args.scan_epochs = 2
    args.lr = 1e-3  # gentle steps: keeps float-reassociation noise from
    # being chaotically amplified (at lr 0.01 the first steps traverse
    # loss 54 -> 10 and 1e-5 noise grows to percent level by epoch 2)
    args.results_dir = ""
    for k, v in over.items():
        setattr(args, k, v)
    return args


def test_vmapped_matches_serial():
    quiet = lambda *a, **k: None
    serial = run(_args(), log=quiet)
    vmapped = run(_args(vmap_images=2), log=quiet)
    assert serial.shape == vmapped.shape == (2, 2)
    # exact bitwise equality is not expected (batched matmuls reassociate);
    # at gentle lr the trajectories agree to float tolerance
    np.testing.assert_allclose(vmapped[:, 0], serial[:, 0], rtol=2e-3)


def test_vmapped_chunking_covers_all_images():
    quiet = lambda *a, **k: None
    # 3 images in chunks of 2: one full + one partial chunk
    out = run(_args(img_num=3, vmap_images=2), log=quiet)
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(out))
