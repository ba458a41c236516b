"""Simulation layer: flow simulation, timestepper, sources, I/O."""
