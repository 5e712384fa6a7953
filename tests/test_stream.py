"""Stream executor vs sequential scanned ticks: per-lane equivalence.

The stream executor (stream.py) interleaves lanes' solver iterations and
tick commits inside one fused loop, but every lane's per-tick math —
presolve, GN iterations, line search, postsolve — is the shared engine /
solver code applied in the same order.  These tests pin that: the fused
asynchronous schedule must produce the same closed-loop results as
`batch.make_scanned_ticks` running each tick to lockstep completion.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boundmpc_tpu import batch, ocp, solver as solver_mod, stream
from boundmpc_tpu.runtime.fleet import FleetRunner
from boundmpc_tpu.runtime.scenarios import experiment1, experiment2, random_scenario


def _fleet(B, seed=3, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    scs = [experiment1(), experiment2()][: min(B, 2)]
    scs += [random_scenario(rng) for _ in range(B - len(scs))]
    return FleetRunner(scs, solver_cfg=solver_mod.RUNTIME_F32, dtype=dtype)


def _run_both(K, B, dtype):
    f = _fleet(B, dtype=dtype)
    copy = lambda tree: jax.tree.map(lambda a: jnp.array(a), tree)
    scanned = batch.make_scanned_ticks(f.cfg, f.scfg, K, dtype=dtype)
    a = scanned(copy(f.states), f.paths, f.weights, f.x_phi_d, f._pref)
    streamed = stream.make_stream_ticks(f.cfg, f.scfg, K, dtype=dtype)
    st_b, so = streamed(copy(f.states), f.paths, f.weights, f.x_phi_d,
                        f._pref)
    return a, (st_b, (so.success, so.viol, so.iters))


def test_stream_matches_scanned_f64():
    """Strict per-lane equivalence in float64, where every convergence
    threshold sits many orders of magnitude above the rounding noise, so the
    two differently-compiled programs must take IDENTICAL per-tick iteration
    paths."""
    (st_a, (succ_a, viol_a, iters_a)), (st_b, (succ_b, viol_b, iters_b)) = (
        _run_both(K=6, B=4, dtype=jnp.float64))
    np.testing.assert_array_equal(np.asarray(succ_a), np.asarray(succ_b))
    np.testing.assert_array_equal(np.asarray(iters_a), np.asarray(iters_b))
    np.testing.assert_allclose(np.asarray(viol_a), np.asarray(viol_b),
                               rtol=0, atol=1e-9)
    for name, a, b in zip(st_a._fields, jax.tree.leaves(st_a),
                          jax.tree.leaves(st_b)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=1e-8, err_msg=f"EngineState.{name} diverged")


def test_stream_matches_scanned_f32_behavioral():
    """In float32 the stagnation exit sits AT the rounding noise floor, so
    iteration counts may differ between the two compiled programs (XLA fuses
    them differently) — but the closed-loop BEHAVIOR must agree: same success
    pattern, feasible solutions, same plant trajectory to f32 tolerance.
    (The executed jerk knots may differ more: the objective's jerk weight is
    1e-4, a nearly-flat solution subspace.)"""
    (st_a, (succ_a, viol_a, _)), (st_b, (succ_b, viol_b, _)) = (
        _run_both(K=6, B=4, dtype=jnp.float32))
    np.testing.assert_array_equal(np.asarray(succ_a), np.asarray(succ_b))
    assert np.asarray(viol_a).max() < 1e-4 and np.asarray(viol_b).max() < 1e-4
    for fld in ("q", "dq", "phi", "dphi", "pr_ref", "iw_ref", "sector"):
        np.testing.assert_allclose(
            np.asarray(getattr(st_a, fld), np.float64),
            np.asarray(getattr(st_b, fld), np.float64),
            rtol=0, atol=2e-2, err_msg=f"EngineState.{fld} diverged")


def test_stream_cohort_invariance():
    """Cohort commits (batching the whole-batch-cost commit phase until
    >= cohort lanes are pending — the B>=1024 scaling fix) must not change
    any lane's numerics: a pending lane just waits, masked out of GN
    stepping, and its commit applies the exact same (done) LoopState.
    Strict f64 equality between cohort=1 (commit-on-any-done, the r4
    behavior) and cohort=B."""
    K, B = 6, 4
    f = _fleet(B, dtype=jnp.float64)
    copy = lambda tree: jax.tree.map(lambda a: jnp.array(a), tree)
    outs = []
    for cohort in (1, B):
        fn = stream.make_stream_ticks(f.cfg, f.scfg, K, dtype=jnp.float64,
                                      cohort=cohort)
        st, so = fn(copy(f.states), f.paths, f.weights, f.x_phi_d, f._pref)
        outs.append((st, so))
    (st1, so1), (stB, soB) = outs
    np.testing.assert_array_equal(np.asarray(so1.success),
                                  np.asarray(soB.success))
    np.testing.assert_array_equal(np.asarray(so1.iters),
                                  np.asarray(soB.iters))
    np.testing.assert_allclose(np.asarray(so1.viol), np.asarray(soB.viol),
                               rtol=0, atol=1e-9)
    for name, a, b in zip(st1._fields, jax.tree.leaves(st1),
                          jax.tree.leaves(stB)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=0, atol=1e-8, err_msg=f"EngineState.{name} diverged")
    # Deferred commits strictly reduce commit-phase invocations, never the
    # recorded per-lane work.
    assert int(soB.n_loop) >= int(np.asarray(soB.iters).sum(axis=0).max())


def test_stream_progress_and_success():
    """Longer run: the fused loop must keep making path progress and stay
    successful through segment crossings (window slides) for every lane."""
    B, K = 4, 25
    f = _fleet(B, seed=11)
    streamed = stream.make_stream_ticks(f.cfg, f.scfg, K)
    st, so = streamed(f.states, f.paths, f.weights, f.x_phi_d, f._pref)
    succ, viol, iters = so.success, so.viol, so.iters
    # Sanity on the loop counter: at least max-total-iterations.
    total = np.asarray(iters).sum(axis=0)
    assert int(so.n_loop) >= total.max()
    # Recorded per-tick phi must be monotone per lane and end at the final
    # state's phi.
    phi_rec = np.asarray(so.phi)
    assert (np.diff(phi_rec, axis=0) >= -1e-6).all()
    np.testing.assert_allclose(phi_rec[-1], np.asarray(st.phi), atol=1e-6)
    succ = np.asarray(succ)
    assert succ.mean() > 0.97
    phi = np.asarray(st.phi)
    assert (phi > 0.3).all(), phi
    assert int(np.asarray(st.sector).max()) >= 1  # a window slide happened
    assert not np.asarray(st.dead).any()
