"""Pixel/array ops: the deterministic numeric core of the pipeline.

All ops are pure JAX (jit-able, differentiable where meaningful) and reproduce
the reference numerics exactly (see each module's docstring for the file:line
provenance of the semantics).
"""
