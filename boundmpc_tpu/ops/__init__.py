"""Pallas TPU kernels for the solver's hot linear algebra.

The reference delegates its KKT work to Ipopt + MA57 (BoundMPC.py:120-148);
here the equivalent factorization runs on-chip: `tsqr.py` solves the batched
stacked weighted least-squares systems that define the Gauss-Newton step,
with the triangular factor resident in VMEM instead of re-streaming the
~90 MB batched matrix from HBM per Householder column (the measured
bottleneck of XLA's batched QR at B=256).
"""
from .tsqr import tsqr_ls_solve  # noqa: F401
