"""Nova IVC with augmented circuits on the pasta cycle: a toy cubic
step function, proven for a few steps, verified O(1). Exercises the
whole in-circuit fold-verifier stack (ec gadgets, bignat folds,
transcript gadget) with check=True synthesis (every constraint checked
on the fly) plus shape-uniformity pinning."""

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.proof import nova_cycle
from lurk_tpu.proof.nova_cycle import CyclePublicParams, CycleSNARK
from lurk_tpu.r1cs.cs import ConstraintSystem, lc_add
from lurk_tpu.r1cs.gadgets import Num, alloc_num, enforce_equal, mul


def cubic_step(cs: ConstraintSystem, zi, aux):
    """z' = z^3 + z + 5 (the classic Nova example step)."""
    z = zi[0]
    z2 = mul(cs, z, z)
    z3 = mul(cs, z2, z)
    out = alloc_num(cs, (z3.value + z.value + 5) % cs.p)
    lhs = Num(lc_add(lc_add(z3.lc, z.lc, cs.p),
                     {ConstraintSystem.ONE_VAR: 5}, cs.p),
              (z3.value + z.value + 5) % cs.p)
    enforce_equal(cs, lhs, out)
    return [out]


def _host_cubic(z, p):
    return (z ** 3 + z + 5) % p


@pytest.fixture(scope="module")
def pp():
    return CyclePublicParams.setup(PALLAS_SCALAR, 1, cubic_step, [0])


def test_cycle_ivc_prove_verify(pp):
    p = PALLAS_SCALAR.modulus
    z0 = 3
    snark = CycleSNARK(pp, [z0])
    z = z0
    for _ in range(3):
        z = _host_cubic(z, p)
        snark.prove_step([z], check=True)
    proof = snark.finish()
    assert proof.n == 3 and proof.zn == [z]
    assert nova_cycle.verify(pp, proof)

    # tampered output
    bad = nova_cycle.CycleProof(
        proof.n, proof.z0, [(z + 1) % p], proof.u1, proof.w1, proof.u2,
        proof.u2_pending, proof.comm_t_last, proof.w2_folded)
    assert not nova_cycle.verify(pp, bad)
    # tampered step count
    bad_n = nova_cycle.CycleProof(
        proof.n + 1, proof.z0, proof.zn, proof.u1, proof.w1, proof.u2,
        proof.u2_pending, proof.comm_t_last, proof.w2_folded)
    assert not nova_cycle.verify(pp, bad_n)
    # zero-step proof rejected
    zero = nova_cycle.CycleProof(
        0, proof.z0, proof.z0, proof.u1, proof.w1, proof.u2,
        proof.u2_pending, proof.comm_t_last, proof.w2_folded)
    assert not nova_cycle.verify(pp, zero)


def test_cycle_single_step(pp):
    p = PALLAS_SCALAR.modulus
    snark = CycleSNARK(pp, [7])
    z1 = _host_cubic(7, p)
    snark.prove_step([z1], check=True)
    proof = snark.finish()
    assert proof.n == 1
    assert nova_cycle.verify(pp, proof)
