"""Execution engines: interpret (eager, per-op timing) and compile (whole-plan jit)."""
