"""Offline analysis & report generation.

Replaces the reference's Logger→Plotter→RViz observability pipeline
(`Logger/Logger.py`, `Plotter/Plotter.py`, `Rviz_Tools/rviz_tools.py`):
figures are rendered to files from logged telemetry instead of live RViz;
the figure catalog follows the reference Plotter's groups (errors with bound
envelopes, joint states with limits, Cartesian path, path parameter,
timing/iterations, manipulability) plus an npz export.
"""
from .report import Report, generate_report  # noqa: F401
