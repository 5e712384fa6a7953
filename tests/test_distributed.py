"""Sharded scenario-mesh execution on the 8-device virtual CPU mesh
(SURVEY.md §4 implication (d): collectives without real hardware)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boundmpc_tpu import distributed, ocp, solver as solver_mod
from __graft_entry__ import _build_batch


@pytest.fixture(scope="module")
def sharded_setup():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ocp.OcpConfig()
    scfg = solver_mod.SolverConfig(max_iters=4)
    mesh = distributed.scenario_mesh(devices[:8])
    eng = distributed.ShardedEngine(cfg, scfg, mesh, dtype=jnp.float32)
    states, paths, weights, x_phi_d = _build_batch(16, cfg)
    return eng, (eng.sharding(states), eng.sharding(paths),
                 eng.sharding(weights), eng.sharding(x_phi_d))


def test_sharded_tick_runs(sharded_setup):
    eng, (states, paths, weights, x_phi_d) = sharded_setup
    new_states, outs, metrics = eng.tick(states, paths, weights, x_phi_d)
    jax.block_until_ready(new_states.phi)
    assert new_states.phi.shape == (16,)
    assert int(metrics["n_dead"]) == 0
    assert int(metrics["total_iters"]) > 0
    assert np.isfinite(float(metrics["mean_phi"]))


def test_sharded_matches_unsharded():
    """Device placement must not change the math (same tick on 1 vs 8 dev)."""
    from boundmpc_tpu import batch as batch_mod

    cfg = ocp.OcpConfig()
    scfg = solver_mod.SolverConfig(max_iters=4)
    states, paths, weights, x_phi_d = _build_batch(8, cfg)

    tick_b = batch_mod.make_batched_tick(cfg, scfg, dtype=jnp.float32, donate=False)
    st1, out1 = tick_b(states, paths, weights, x_phi_d)

    mesh = distributed.scenario_mesh(jax.devices()[:8])
    eng = distributed.ShardedEngine(cfg, scfg, mesh, dtype=jnp.float32)
    st8, out8, _ = eng.tick(
        eng.sharding(states), eng.sharding(paths), eng.sharding(weights),
        eng.sharding(x_phi_d),
    )
    np.testing.assert_allclose(
        np.asarray(st1.phi), np.asarray(st8.phi), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(st1.q), np.asarray(st8.q), rtol=1e-4, atol=1e-5
    )


def test_sharded_stream_matches_unsharded():
    """The async stream executor under shard_map: per-device independent
    while_loops must reproduce the single-mesh stream executor's per-lane
    trajectories (lanes never interact, so placement is invisible)."""
    from boundmpc_tpu import batch as batch_mod, stream as stream_mod

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32._replace(max_iters=8)
    K = 4
    states, paths, weights, x_phi_d = _build_batch(16, cfg)
    pref = batch_mod.make_prefactor_batch(cfg, paths, weights, x_phi_d)

    fn1 = stream_mod.make_stream_ticks(cfg, scfg, K, donate=False)
    st1, out1 = fn1(states, paths, weights, x_phi_d, pref)

    mesh = distributed.scenario_mesh(devices[:8])
    eng = distributed.ShardedEngine(cfg, scfg, mesh, dtype=jnp.float32)
    st8, out8, metrics = eng.stream(
        eng.sharding(states), eng.sharding(paths), eng.sharding(weights),
        eng.sharding(x_phi_d), eng.sharding(pref), n_ticks=K,
    )
    assert out8.success.shape == (K, 16)
    np.testing.assert_array_equal(np.asarray(out1.success),
                                  np.asarray(out8.success))
    np.testing.assert_allclose(np.asarray(out1.phi), np.asarray(out8.phi),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st1.phi), np.asarray(st8.phi),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st1.q), np.asarray(st8.q),
                               rtol=1e-4, atol=1e-5)
    # ICI-reduced aggregates agree with host-side reduction of the series.
    assert int(metrics["n_success"]) == int(np.asarray(out1.success).sum())
    # n_loop is the psum of per-device trip counts.  Lower bound: one device
    # owns the globally slowest lane and needs at least as many trips for it
    # as the single-mesh loop did (per-lane iteration counts are placement-
    # invariant), so the sum is >= the single-mesh trip count.  Upper bound:
    # no device can need more trips than the single-mesh loop (its local
    # lane set is a subset), so the sum is <= 8x.  This catches a broken
    # reduction (e.g. pmean) — out1.n_loop // 8 was nearly vacuous.
    assert int(out1.n_loop) <= int(metrics["n_loop"]) <= 8 * int(out1.n_loop)
