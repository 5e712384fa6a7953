"""Fleet runner: lockstep batching, checkpoint/resume determinism."""
import numpy as np
import jax.numpy as jnp

from boundmpc_tpu import solver as solver_mod
from boundmpc_tpu.runtime import FleetRunner, experiment1, random_scenario


def _fleet(B=4, **kw):
    rng = np.random.default_rng(3)
    scs = [experiment1()] + [random_scenario(rng) for _ in range(B - 1)]
    # The production f32 config: success_rate now aggregates over EVERY tick
    # (including the cold first one), which needs the full iteration budget —
    # a 12-iteration cold tick sits at viol ~1e-2 and honestly counts failed.
    return FleetRunner(scs, solver_cfg=solver_mod.RUNTIME_F32, **kw)


def test_fleet_progresses():
    f = _fleet()
    st = f.run(ticks=6)
    assert st.batch == 4
    assert st.success_rate == 1.0
    assert np.isfinite(st.solves_per_s)


def test_checkpoint_resume_deterministic(tmp_path):
    f1 = _fleet()
    f1.run(ticks=4)
    ckpt = tmp_path / "fleet.npz"
    f1.save_checkpoint(ckpt)
    s1 = f1.run(ticks=3)

    f2 = _fleet()
    f2.load_checkpoint(ckpt)
    s2 = f2.run(ticks=3)

    np.testing.assert_allclose(
        np.asarray(f1.states.q), np.asarray(f2.states.q), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(f1.states.phi), np.asarray(f2.states.phi), atol=1e-6
    )
