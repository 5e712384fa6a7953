"""Piecewise-linear Cartesian reference paths as static pytrees.

The reference's ``ReferencePath`` (bound_mpc/bound_mpc/ReferencePath/
ReferencePath.py) is a mutable object with a sliding ``nr_segs``-segment
window advanced by in-place shifting (``update``, :190-212).  TPU-first
re-design: the *whole* path is built once (host, numpy) into stacked arrays
with static shapes; the sliding window becomes a pure gather
(``window(path, sector)``) and the sector advance a branchless count
(``advance_sector``) — both jit/vmap-safe so thousands of scenarios can run
batched with per-scenario sectors.

Build-time semantics preserved from the reference constructor:
  * per-segment relative rotations dr and integrated omega iw (:65-75),
  * degenerate-segment handling (tiny position displacement -> inherit
    direction / orientation-based arc length, :77-99),
  * arc-length parametrization phi with switching points (:89-109),
  * Gram-Schmidt orthonormal error-plane bases bp1/bp2, br1/br2 (:111-150),
  * padding by ``nr_segs - 1`` virtual segments past the path end (:44-60),
    with the reference's dr pad of [1, 1, 1] (:72-75).
"""
from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from .lie import matrix_to_rotvec as _matrix_to_rotvec_jnp


class PathData(NamedTuple):
    """Stacked per-segment path arrays (capacity S, leading batch dims ok)."""

    seg_p0: jnp.ndarray  # (S, 3) segment start position
    seg_iw: jnp.ndarray  # (S, 3) integrated omega at segment start
    seg_dp: jnp.ndarray  # (S, 3) unit position direction
    seg_dr: jnp.ndarray  # (S, 3) rotation velocity per unit phi
    seg_dr_unit: jnp.ndarray  # (S, 3) normalized seg_dr (or [0,1,0] fallback)
    seg_len: jnp.ndarray  # (S,)
    phi_start: jnp.ndarray  # (S + 1,) cumulative switching values
    bp1: jnp.ndarray  # (S, 3)
    bp2: jnp.ndarray  # (S, 3)
    br1: jnp.ndarray  # (S, 3)
    br2: jnp.ndarray  # (S, 3)
    asymm_lower: jnp.ndarray  # (S, 4)
    asymm_upper: jnp.ndarray  # (S, 4)
    via_rotvec: jnp.ndarray  # (S + 1, 3) rotation vector at each via point
    phi_max: jnp.ndarray  # () total arc length (+ bias)
    n_real: jnp.ndarray  # () int32: number of real segments
    s: jnp.ndarray  # () bound slope parameter
    e_p_min: jnp.ndarray  # ()
    e_r_min: jnp.ndarray  # ()
    e_p_max: jnp.ndarray  # ()
    e_r_max: jnp.ndarray  # ()


class Window(NamedTuple):
    """Active ``nr_segs``-segment window, reference get_parameters/get_limits
    layout (segments along the last axis removed — row-major (nr_segs, ...))."""

    p_ref: jnp.ndarray  # (nr_segs, 6)  [pos ; iw]
    dp_ref: jnp.ndarray  # (nr_segs, 6)  [unit dir ; dr]
    dp_normed: jnp.ndarray  # (nr_segs, 3)
    phi_switch: jnp.ndarray  # (nr_segs + 1,)
    bp1: jnp.ndarray  # (nr_segs, 3)
    bp2: jnp.ndarray
    br1: jnp.ndarray
    br2: jnp.ndarray
    asymm_lower: jnp.ndarray  # (nr_segs, 4)
    asymm_upper: jnp.ndarray  # (nr_segs, 4)
    seg_len: jnp.ndarray  # (nr_segs,)


def _gram_schmidt(v_unit: np.ndarray, b: np.ndarray) -> np.ndarray:
    return b - (v_unit @ b) * v_unit


def build_path(
    p_via: Sequence[np.ndarray],
    r_via: Sequence[np.ndarray],
    p_lower: Sequence[np.ndarray],
    p_upper: Sequence[np.ndarray],
    r_lower: Sequence[np.ndarray],
    r_upper: Sequence[np.ndarray],
    bp1_in: Sequence[np.ndarray],
    br1_in: Sequence[np.ndarray],
    s: float,
    e_p_min: float,
    e_r_min: float,
    e_p_max: float,
    e_r_max: float,
    nr_segs: int,
    phi_bias: float = 0.0,
    capacity: int | None = None,
    dtype=np.float64,
) -> PathData:
    """Host-side path construction (numpy) -> PathData pytree.

    ``r_via`` entries are 3x3 rotation matrices.  ``capacity`` pads the
    segment arrays to a static size so scenarios with different via counts
    batch together; it must be >= n_via - 1 + (nr_segs - 1).

    Returns a NUMPY pytree: path construction is host-side config work, and
    eager per-leaf device transfers cost ~25 ms each through the TPU tunnel
    (21 leaves x B scenarios dominated large-fleet setup).  Batching layers
    stack scenarios host-side and transfer once per leaf; jit consumes numpy
    leaves directly for the single-scenario runners.
    """
    from scipy.spatial.transform import Rotation as R

    p = [np.asarray(x, dtype=dtype) for x in p_via]
    r = [np.asarray(x, dtype=dtype) for x in r_via]
    n_via = len(p)
    n_real = n_via - 1
    S = n_real + (nr_segs - 1)
    if capacity is None:
        capacity = S
    assert capacity >= S, "capacity too small for path"

    # Relative rotations and integrated omega at via points.
    dr_raw = [R.from_matrix(r[i + 1] @ r[i].T).as_rotvec() for i in range(n_real)]
    iw = [np.zeros(3, dtype=dtype)]
    for i in range(1, n_via):
        iw.append(iw[i - 1] + dr_raw[i - 1])

    # Position directions with degenerate-segment fallback.
    dp = []
    for i in range(n_real):
        d = p[i + 1] - p[i]
        if np.linalg.norm(d) < 1e-3:
            d = dp[-1].copy() if i > 0 else np.array([0.0, 1.0, 0.0], dtype=dtype)
        dp.append(d)

    # Arc lengths; pure-rotation segments get |dr| / pi
    # (ReferencePath.py:92-99).  Fully degenerate segments (no translation
    # AND no rotation, e.g. the default hold-in-place path of
    # path_utils.get_default_path) get a tiny positive length: the reference
    # divides 0/0 into NaN dr there; a 1e-3 floor keeps the hold path
    # well-defined with the same behavior (robot holds pose, path completes
    # immediately).
    seg_len = []
    for i in range(n_real):
        li = np.linalg.norm(p[i + 1] - p[i])
        if li < 1e-3:
            li = max(np.linalg.norm(dr_raw[i]) / np.pi, 1e-3)
        seg_len.append(li)
    phi_max = float(np.sum(seg_len)) + phi_bias

    dr = [dr_raw[i] / seg_len[i] for i in range(n_real)]

    # Pad with virtual segments (reference :72-87: dr pad [1,1,1], repeat rest).
    for _ in range(nr_segs - 1):
        p.append(p[-1])
        r.append(r[-1])
        iw.append(iw[-1])
        dp.append(dp[-1])
        dr.append(np.array([1.0, 1.0, 1.0], dtype=dtype))
        seg_len.append(1.0)

    # Error-plane bases per segment.
    bp1_l, bp2_l, br1_l, br2_l = [], [], [], []
    n_bases = min(len(bp1_in), S)
    for i in range(S):
        j = min(i, n_bases - 1)
        dpn = dp[i] / np.linalg.norm(dp[i])
        b1 = _gram_schmidt(dpn, np.asarray(bp1_in[j], dtype=dtype))
        nb = np.linalg.norm(b1)
        if nb < 1e-3:
            # fallback: any vector orthogonal to dpn
            alt = np.array([1.0, 0.0, 0.0], dtype=dtype)
            if abs(dpn[0]) > 0.9:
                alt = np.array([0.0, 1.0, 0.0], dtype=dtype)
            b1 = _gram_schmidt(dpn, alt)
            nb = np.linalg.norm(b1)
        b1 = b1 / nb
        bp1_l.append(b1)
        bp2_l.append(np.cross(dpn, b1))

        ndr = np.linalg.norm(dr[i])
        omega = dr[i] / ndr if ndr > 1e-4 else np.array([0.0, 1.0, 0.0], dtype=dtype)
        c1 = _gram_schmidt(omega, np.asarray(br1_in[j], dtype=dtype))
        nc = np.linalg.norm(c1)
        if nc < 1e-3:
            alt = np.array([1.0, 0.0, 0.0], dtype=dtype)
            if abs(omega[0]) > 0.9:
                alt = np.array([0.0, 1.0, 0.0], dtype=dtype)
            c1 = _gram_schmidt(omega, alt)
            nc = np.linalg.norm(c1)
        c1 = c1 / nc
        br1_l.append(c1)
        br2_l.append(np.cross(omega, c1))

    # Per-segment asymmetric limit rectangles (lists indexed by start via).
    def _lim(lst, i):
        j = min(i, len(lst) - 1)
        return np.asarray(lst[j], dtype=dtype)

    asymm_lower = np.stack(
        [np.concatenate([_lim(p_lower, i), _lim(r_lower, i)]) for i in range(S)]
    )
    asymm_upper = np.stack(
        [np.concatenate([_lim(p_upper, i), _lim(r_upper, i)]) for i in range(S)]
    )

    phi_start = phi_bias + np.concatenate([[0.0], np.cumsum(seg_len)])

    via_rotvec = np.stack([R.from_matrix(m).as_rotvec() for m in r])  # (S+1, 3)

    def pad_to(a, rows):
        a = np.asarray(a, dtype=dtype)
        if a.shape[0] >= rows:
            return a[:rows]
        reps = np.repeat(a[-1:], rows - a.shape[0], axis=0)
        return np.concatenate([a, reps], axis=0)

    def pad_seg(a):
        return pad_to(a, capacity)

    seg_dr = np.stack(dr)
    dr_norm = np.linalg.norm(seg_dr, axis=-1, keepdims=True)
    seg_dr_unit = np.where(
        dr_norm > 1e-4, seg_dr / np.maximum(dr_norm, 1e-30), np.array([0.0, 1.0, 0.0])
    )
    dp_arr = np.stack(dp)
    dp_unit = dp_arr / np.linalg.norm(dp_arr, axis=-1, keepdims=True)

    # phi_start padding continues the cumsum with unit segments.
    extra = capacity - S
    phi_start_pad = np.concatenate(
        [phi_start, phi_start[-1] + np.arange(1, extra + 1, dtype=dtype)]
    )

    return PathData(
        seg_p0=pad_seg(np.stack(p[:S])),
        seg_iw=pad_seg(np.stack(iw[:S])),
        seg_dp=pad_seg(dp_unit),
        seg_dr=pad_seg(seg_dr),
        seg_dr_unit=pad_seg(seg_dr_unit),
        seg_len=pad_seg(np.asarray(seg_len)),
        phi_start=np.asarray(phi_start_pad, dtype=dtype),
        bp1=pad_seg(np.stack(bp1_l)),
        bp2=pad_seg(np.stack(bp2_l)),
        br1=pad_seg(np.stack(br1_l)),
        br2=pad_seg(np.stack(br2_l)),
        asymm_lower=pad_seg(asymm_lower),
        asymm_upper=pad_seg(asymm_upper),
        via_rotvec=pad_to(via_rotvec, capacity + 1),
        phi_max=np.asarray(phi_max, dtype=dtype),
        n_real=np.asarray(n_real, dtype=np.int32),
        s=np.asarray(s, dtype=dtype),
        e_p_min=np.asarray(e_p_min, dtype=dtype),
        e_r_min=np.asarray(e_r_min, dtype=dtype),
        e_p_max=np.asarray(e_p_max, dtype=dtype),
        e_r_max=np.asarray(e_r_max, dtype=dtype),
    )


def locate_sector(path: PathData, phi: jnp.ndarray) -> jnp.ndarray:
    """Sector containing ``phi``: the number of switching points strictly
    below it, clamped to the real segments.  Direction-free — the engine
    uses this so the window FOLLOWS the plant even when damage-control
    retreat drives phi backward across a switching point (the reference's
    window only ever slides forward, ReferencePath.update :190-212, because
    its single robot never retreats; a fleet lane recovering from a bound
    violation legitimately does, and evaluating a stale forward window at a
    retreated phi wedges the lane — measured r5 soak, lane 62: phi driven
    3.1 -> 0.01 against a sector-2 window, permanent failure)."""
    return jnp.sum(
        (phi > path.phi_start[1:-1])
        & (jnp.arange(path.phi_start.shape[0] - 2) < path.n_real - 1),
        axis=-1,
    ).astype(jnp.int32)


def advance_sector(path: PathData, sector: jnp.ndarray, phi: jnp.ndarray) -> jnp.ndarray:
    """Branchless equivalent of the reference's while-loop sector advance
    (ReferencePath.update, :190-212): the new sector is the number of
    switching points strictly below phi, clamped to the real segments and
    never decreasing (see `locate_sector` for the direction-free variant)."""
    return jnp.maximum(sector, locate_sector(path, phi))


def window(path: PathData, sector: jnp.ndarray, nr_segs: int) -> Window:
    """Gather the active window starting at ``sector`` (static size)."""

    def slice0(a, size):
        return lax.dynamic_slice_in_dim(a, sector, size, axis=0)

    p_ref = jnp.concatenate([slice0(path.seg_p0, nr_segs), slice0(path.seg_iw, nr_segs)], axis=-1)
    dp_ref = jnp.concatenate([slice0(path.seg_dp, nr_segs), slice0(path.seg_dr, nr_segs)], axis=-1)
    return Window(
        p_ref=p_ref,
        dp_ref=dp_ref,
        dp_normed=slice0(path.seg_dr_unit, nr_segs),
        phi_switch=slice0(path.phi_start, nr_segs + 1),
        bp1=slice0(path.bp1, nr_segs),
        bp2=slice0(path.bp2, nr_segs),
        br1=slice0(path.br1, nr_segs),
        br2=slice0(path.br2, nr_segs),
        asymm_lower=slice0(path.asymm_lower, nr_segs),
        asymm_upper=slice0(path.asymm_upper, nr_segs),
        seg_len=slice0(path.seg_len, nr_segs),
    )


def segment_index(phi: jnp.ndarray, phi_switch: jnp.ndarray, nr_segs: int) -> jnp.ndarray:
    """Branchless replacement for the reference's chained ``ca.if_else``
    segment dispatch (bound_mpc_functions.get_current_segment, :13-20):
    index of the active window segment for path parameter ``phi``.

    Matches the reference semantics: segment i is active when
    phi < phi_switch[i + 1], else fall through to the last row.
    """
    # count of interior switch points strictly <= phi  (phi < phi_switch[i+1]
    # fails for all i <= k  iff  phi >= phi_switch[k+1])
    return jnp.sum(phi >= phi_switch[1:nr_segs], axis=-1).astype(jnp.int32)
