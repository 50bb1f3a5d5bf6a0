"""parallel/: DP train step over a virtual 8-device mesh; edge-sharded
aggregation parity with single-device; entrypoint dryrun."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from signnet_basisnet_tpu.parallel import (build_dp_steps,
                                           edge_sharded_aggregate, make_mesh)


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    mesh = make_mesh(dp=4, mp=2)
    assert mesh.shape == {"dp": 4, "mp": 2}


def test_edge_sharded_aggregate_matches_single_device():
    mesh = make_mesh(dp=1, mp=8)
    rng = np.random.default_rng(0)
    n, e, d = 32, 64, 8
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    senders = jnp.asarray(np.sort(rng.integers(0, n, e)).astype(np.int32))
    receivers = jnp.asarray(rng.integers(0, n, e).astype(np.int32))
    emask = jnp.asarray((rng.random(e) < 0.8).astype(np.float32))

    agg = edge_sharded_aggregate(mesh, axis="mp")
    out = agg(x, senders, receivers, emask, n)
    ref = jax.ops.segment_sum(x[senders] * emask[:, None], receivers,
                              num_segments=n)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dryrun_multichip_entrypoint():
    import importlib.util, os
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_entry_compiles():
    import importlib.util, os
    path = os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry2", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, (variables, gb) = mod.entry()
    out = jax.jit(fn)(variables, gb)
    assert np.all(np.isfinite(np.asarray(out)))
