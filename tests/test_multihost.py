"""Two-process jax.distributed bring-up test (SURVEY.md §5.8).

Spawns two REAL processes that initialize the JAX distributed runtime over a
local coordinator (the CPU analog of two TPU hosts), build the global
scenario mesh, and reduce a metric over it with psum — covering
`distributed.init_multihost`, which no single-process test can reach.
"""
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")

    # init_multihost must run BEFORE importing the package: module-level
    # jnp constants would initialise the XLA backend and forbid it.
    from boundmpc_tpu.distributed import init_multihost  # noqa: E402 (jax-only import)

    init_multihost(coordinator=f"127.0.0.1:{{port}}", num_processes=2,
                   process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from boundmpc_tpu.distributed import scenario_mesh
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, len(jax.devices())  # 2 per process

    mesh = scenario_mesh()  # global 4-device mesh

    @jax.jit
    @partial(jax.shard_map, mesh=mesh, in_specs=P("scenario"), out_specs=P())
    def fleet_total(x):
        return jax.lax.psum(jnp.sum(x), "scenario")

    sh = NamedSharding(mesh, P("scenario"))
    x = jax.make_array_from_callback(
        (8,), sh, lambda idx: np.arange(8, dtype=np.float32)[idx])
    total = float(fleet_total(x))
    assert total == float(np.arange(8).sum()), total

    # --- full ENGINE ticks across the process boundary ------------------
    # Every process builds the same global batch host-side, contributes its
    # addressable shards, and the sharded production tick runs with ICI/DCN
    # metric reductions — two real processes driving one fleet.
    from boundmpc_tpu import ocp, solver as solver_mod
    from boundmpc_tpu.distributed import ShardedEngine
    from __graft_entry__ import _build_batch

    cfg = ocp.OcpConfig()
    scfg = solver_mod.RUNTIME_F32
    B = 4
    states, paths, weights, x_phi_d = _build_batch(B, cfg)

    def shard_tree(tree):
        def put(leaf):
            arr = np.asarray(leaf)
            s = NamedSharding(mesh, P("scenario"))
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx])
        return jax.tree.map(put, tree)

    states = shard_tree(states)
    paths = shard_tree(paths)
    weights = shard_tree(weights)
    x_phi_d = shard_tree(x_phi_d)

    eng = ShardedEngine(cfg, scfg, mesh, dtype=jnp.float32)
    phi_prev = -1.0
    for t in range(3):
        states, outs, metrics = eng.tick(states, paths, weights, x_phi_d)
        jax.block_until_ready(states.phi)
        n_success = int(metrics["n_success"])
        mean_phi = float(metrics["mean_phi"])
        assert n_success == B, (t, n_success)
        assert int(metrics["n_dead"]) == 0
        assert mean_phi > phi_prev, (t, mean_phi, phi_prev)
        phi_prev = mean_phi
    print(f"proc {{pid}}: ok, psum={{total}}, engine_phi={{phi_prev:.5f}}")
""").format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_init_multihost_two_processes(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    # Strip the TPU-tunnel sitecustomize (it registers a JAX backend at
    # interpreter start, which forbids jax.distributed.initialize later)
    # and its trigger env vars; force the CPU platform.
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
           and not k.startswith("PALLAS_AXON")}
    pp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
          if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pp)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen([sys.executable, str(script), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=480)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid}: ok" in out
