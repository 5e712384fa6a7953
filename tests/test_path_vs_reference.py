"""Path-constructor cross-test: build_path vs the reference ReferencePath.

Feeds identical via sets through `boundmpc_tpu.path.build_path` and the
reference's `ReferencePath` (ReferencePath.py:10-150, imported read-only via
tests/ref_oracle.py) and asserts the derived quantities match: arc-length
switching points, scaled per-segment rotation vectors dr, integrated omega,
Gram-Schmidt error-plane bases, and phi_max — including a degenerate
pure-rotation segment (ReferencePath.py:92-99).
"""
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from boundmpc_tpu.runtime import experiment1, experiment2
from ref_oracle import ReferencePath


def _reference_path(sc):
    """Instantiate the reference ReferencePath from a Scenario (the ctor
    mutates its list arguments, so copies are passed)."""
    n_via = len(sc.p_via)
    return ReferencePath(
        [np.array(p, float) for p in sc.p_via],
        [np.array(r, float) for r in sc.r_via],
        [[np.array(x, float) for x in sc.p_lower],
         [np.array(x, float) for x in sc.p_upper]],
        [[np.array(x, float) for x in sc.r_lower],
         [np.array(x, float) for x in sc.r_upper]],
        [np.array(b, float) for b in sc.bp1],
        [np.array(b, float) for b in sc.br1],
        [sc.s] * n_via, [sc.e_p_min] * n_via, [sc.e_r_min] * n_via,
        [sc.e_p_max] * n_via, [sc.e_r_max] * n_via,
        nr_segs=sc.nr_segs,
    )


def _compare(sc):
    ref = _reference_path(sc)
    ours = sc.build(dtype=np.float64)

    n_real = len(sc.p_via) - 1
    S = n_real + sc.nr_segs - 1

    # Arc-length switching points (ref.phi holds per-segment lengths with a
    # leading 0; ours is cumulative)
    ref_switch = np.cumsum(np.asarray(ref.phi[: n_real + 1], float))
    np.testing.assert_allclose(
        np.asarray(ours.phi_start[: n_real + 1]), ref_switch, atol=1e-12)
    assert abs(float(ours.phi_max) - float(ref.phi_max)) < 1e-12

    for i in range(S):
        np.testing.assert_allclose(
            np.asarray(ours.seg_dr[i]), np.asarray(ref.dr[i], float),
            atol=1e-10, err_msg=f"dr[{i}]")
        np.testing.assert_allclose(
            np.asarray(ours.bp1[i]), np.asarray(ref.bp1[i], float),
            atol=1e-10, err_msg=f"bp1[{i}]")
        np.testing.assert_allclose(
            np.asarray(ours.bp2[i]), np.asarray(ref.bp2[i], float),
            atol=1e-10, err_msg=f"bp2[{i}]")
        np.testing.assert_allclose(
            np.asarray(ours.br1[i]), np.asarray(ref.br1[i], float),
            atol=1e-10, err_msg=f"br1[{i}]")
        np.testing.assert_allclose(
            np.asarray(ours.br2[i]), np.asarray(ref.br2[i], float),
            atol=1e-10, err_msg=f"br2[{i}]")
        dp_ref = np.asarray(ref.dp[i], float)
        np.testing.assert_allclose(
            np.asarray(ours.seg_dp[i]), dp_ref / np.linalg.norm(dp_ref),
            atol=1e-10, err_msg=f"dp[{i}]")

    # Integrated omega at the via points (iw is per-VIA in the reference)
    for i in range(n_real + 1):
        np.testing.assert_allclose(
            np.asarray(ours.seg_iw[i] if i < S else ours.seg_iw[-1]),
            np.asarray(ref.iw[i], float), atol=1e-10, err_msg=f"iw[{i}]")

    # Per-segment asymmetric limits
    for i in range(S):
        np.testing.assert_allclose(
            np.asarray(ours.asymm_lower[i]),
            np.concatenate([ref.p_lower[min(i, len(ref.p_lower) - 1)],
                            ref.r_lower[min(i, len(ref.r_lower) - 1)]]),
            atol=1e-12, err_msg=f"asymm_lower[{i}]")


def test_path_matches_reference_experiment1():
    _compare(experiment1())


def test_path_matches_reference_experiment2():
    _compare(experiment2())


def test_path_matches_reference_pure_rotation_segment():
    """Degenerate middle segment: no translation, pure rotation — arc length
    |dr|/pi and the previous direction reused (ReferencePath.py:77-99)."""
    sc = experiment1()
    # make via 2 coincide with via 1 in position but rotate
    sc.p_via[2] = np.array(sc.p_via[1], float)
    _compare(sc)


def test_window_matches_reference_update():
    """Sliding-window parameters after crossing a switch: reference
    ReferencePath.update/get_parameters (:190-238) vs our branchless
    window()."""
    from boundmpc_tpu.path import window

    sc = experiment1()
    ref = _reference_path(sc)
    ours = sc.build(dtype=np.float64)

    # advance the reference past the first switching point
    phi_probe = float(np.asarray(ours.phi_start[1])) + 0.05
    pd, dpd_normed, dpd, _, phi_switch = ref.get_parameters(np.array([phi_probe]))
    assert ref.sector == 1

    win = window(ours, np.asarray(1, np.int32), sc.nr_segs)
    np.testing.assert_allclose(np.asarray(win.p_ref), np.asarray(pd, float).T,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(win.dp_ref), np.asarray(dpd, float).T,
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(win.dp_normed),
                               np.asarray(dpd_normed, float).T, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(win.phi_switch), np.asarray(phi_switch, float).flatten(),
        atol=1e-12)
