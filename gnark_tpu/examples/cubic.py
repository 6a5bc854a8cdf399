"""x**3 + x + 5 == y (examples/cubic/cubic.go:32)."""

from gnark_tpu.frontend.schema import Circuit, Public, Secret


class CubicCircuit(Circuit):
    x = Secret()
    y = Public()

    def define(self, api):
        x3 = api.mul(self.x, self.x, self.x)
        api.assert_is_equal(self.y, api.add(x3, self.x, 5))
