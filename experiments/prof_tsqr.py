"""TSQR kernel chunk-size sweep at the production shape (B, 550, 80).

Usage: python experiments/prof_tsqr.py [--B 256]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from boundmpc_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    from boundmpc_tpu.ops import tsqr as tsqr_mod

    B, m, n = args.B, 550, 80
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, m, n), jnp.float32)
    b = jax.random.normal(key, (B, m), jnp.float32)
    x_ref = None

    for rc in [32, 64, 110, 128]:
        try:
            f = jax.jit(lambda A, b: jax.lax.scan(
                lambda Ab, _: ((Ab[0] + 1e-12 * jnp.sum(
                    tsqr_mod.tsqr_ls_solve(Ab[0], Ab[1], rc=rc)), Ab[1]),
                    None), (A, b), None, length=20)[0][0])
            y = f(A, b)
            jax.block_until_ready(y)
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                y = f(A, b)
                jax.block_until_ready(y)
                ts.append((time.perf_counter() - t0) / 20)
            x = tsqr_mod.tsqr_ls_solve(A, b, rc=rc)
            if x_ref is None:
                x_ref = np.asarray(x)
                err = 0.0
            else:
                err = float(np.max(np.abs(np.asarray(x) - x_ref)))
            print(f"rc={rc:4d}: {np.median(ts)*1e3:7.3f} ms  "
                  f"max|dx vs rc32|={err:.2e}", flush=True)
        except Exception as e:
            print(f"rc={rc:4d}: FAILED {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
