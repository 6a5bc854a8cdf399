"""frontend.Compile analog: schema walk -> wire allocation -> define -> IR.

Reference flow: frontend/compile.go:32 (parse circuit, allocate input
wires public-then-secret, run user Define, builder.Compile()).
"""

from __future__ import annotations

from gnark_tpu.frontend import schema as schema_mod
from gnark_tpu.frontend.r1cs_builder import CompileConfig, R1CSBuilder


def compile_circuit(circuit, curve, scheme: str = "groth16",
                    config: CompileConfig | None = None):
    """Compile a Circuit instance into a constraint system for `curve`.

    scheme: "groth16" -> R1CS; "plonk" -> sparse R1CS (PLONK gates).
    """
    if scheme == "groth16":
        builder = R1CSBuilder(curve, config)
    elif scheme == "plonk":
        from gnark_tpu.frontend.scs_builder import SCSBuilder
        builder = SCSBuilder(curve, config)
    else:
        raise ValueError(f"unknown scheme {scheme!r}")

    def make_leaf(visibility, name):
        if visibility == "public":
            return builder.add_public_variable(name)
        return builder.add_secret_variable(name)

    schema_mod.instantiate(circuit, make_leaf)
    circuit.define(builder)
    return builder.compile_system()
