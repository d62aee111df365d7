"""Native SRS powers (srs.cpp) vs the python fixed-base oracle.

The 2^21 dev SRS is generated natively (~18s vs ~50min python,
PERF.md r5); _load_srs_disk spot-checks 3 points per extension, this
test pins a denser sample incl. window-boundary scalars."""

import pytest

from lurk_tpu.native import srs as nsrs
from lurk_tpu.proof import hyperkzg as hk


@pytest.mark.skipif(not nsrs.available(), reason="no C++ toolchain")
def test_srs_powers_match_python_oracle():
    tau = hk._tau()
    n = 300
    got = nsrs.srs_powers(hk.CURVE, tau, 0, n)
    table, c = hk._fixed_base_mul_table(hk.CURVE.generator)
    for i in list(range(8)) + [17, 100, 255, 256, 257, n - 1]:
        expect = hk._fixed_base_mul(table, c,
                                    pow(tau, i, hk.CURVE.order))
        assert got[i] == expect, f"power {i}"


@pytest.mark.skipif(not nsrs.available(), reason="no C++ toolchain")
def test_srs_powers_nonzero_start():
    tau = hk._tau()
    got = nsrs.srs_powers(hk.CURVE, tau, 1000, 5)
    table, c = hk._fixed_base_mul_table(hk.CURVE.generator)
    for j in range(5):
        expect = hk._fixed_base_mul(
            table, c, pow(tau, 1000 + j, hk.CURVE.order))
        assert got[j] == expect


@pytest.mark.skipif(not nsrs.available(), reason="no C++ toolchain")
def test_srs_edge_scalars():
    # scalars with zero bytes in every window position exercise the
    # d=0 skip; tau=1 gives powers == G everywhere
    got = nsrs.srs_powers(hk.CURVE, 1, 0, 4)
    for pt in got:
        assert pt == hk.CURVE.generator
