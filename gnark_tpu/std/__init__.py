"""Gadget standard library (the reference's std/, SURVEY §2.7).

Gadgets are written against the frontend API so every gadget works with
both the R1CS (Groth16) and SCS (PLONK) builders, and with the big-int
test engine.
"""

from gnark_tpu.backend import hints as _hints


def register_hints():
    """Re-register all stdlib hints (std/hints.go:18 analog) — needed by
    servers that solve deserialized constraint systems."""
    # importing the modules registers their hints
    from gnark_tpu.std import bits  # noqa: F401
    from gnark_tpu.backend import hints as _h
    from gnark_tpu.std.algebra import sw_bls12377 as _sw
    from gnark_tpu.std.algebra import sw_bls24315 as _sw24
    _h.register(_sw.decompose_scalar_bls12377)   # std/hints.go:25 analog
    _h.register(_sw24.decompose_scalar_bls24315)
    from gnark_tpu.std import twisted_edwards as _te
    _h.register(_te.decompose_scalar_bandersnatch)
    return _hints.all_registered()
