"""Example circuits (reference examples/: cubic, exponentiate, mimc,
plonk, rollup, serialization)."""
