"""SuperNova augmented circuits: O(#circuits) NIVC on the curve cycle
(functional parity: arecibo supernova RecursiveSNARK; toy non-uniform
step functions before the Lurk integration)."""

import dataclasses

import pytest

from lurk_tpu.fields import PALLAS_SCALAR
from lurk_tpu.proof import supernova_cycle as snc
from lurk_tpu.proof.supernova_cycle import (
    SnCyclePublicParams, SnCycleProof, SnCycleSNARK,
)
from lurk_tpu.r1cs.gadgets import Num, add, alloc_num, enforce_equal, mul


def _step_add(cs, zi, aux):
    # z' = [z0 + 1, z1]; next_pc witnessed
    z_next = [add(cs, zi[0], Num.constant(cs, 1)), zi[1]]
    return z_next, alloc_num(cs, aux)


def _step_mul(cs, zi, aux):
    # z' = [z0, z1 * 3]; next_pc witnessed
    z_next = [zi[0], mul(cs, zi[1], Num.constant(cs, 3))]
    return z_next, alloc_num(cs, aux)


@pytest.fixture(scope="module")
def proven():
    p = PALLAS_SCALAR.modulus
    pp = SnCyclePublicParams.setup(
        PALLAS_SCALAR, 2, [_step_add, _step_mul], [0, 1], [0, 0])
    snark = SnCycleSNARK(pp, [5, 1])
    # program: pc sequence 0, 1, 1, 0  (aux = next_pc)
    seq = [0, 1, 1, 0]
    z = [5, 1]
    for k, pc in enumerate(seq):
        nxt = seq[k + 1] if k + 1 < len(seq) else 0
        if pc == 0:
            z = [(z[0] + 1) % p, z[1]]
        else:
            z = [z[0], (z[1] * 3) % p]
        snark.prove_step(pc, z, nxt, step_aux=nxt, check=True)
    return pp, snark.finish(), z


def test_sn_cycle_prove_verify(proven):
    pp, proof, z = proven
    assert proof.n == 4
    assert proof.zn == z == [7, 9]
    assert snc.verify(pp, proof)


def test_sn_cycle_compress(proven):
    from lurk_tpu.proof.prover_supernova_cycle import (
        compress_sn_cycle, verify_compressed_sn_cycle,
    )
    pp, proof, _ = proven
    cp = compress_sn_cycle(pp, proof)
    assert verify_compressed_sn_cycle(pp, cp)
    bad = dataclasses.replace(cp, zn=[cp.zn[0] + 1, cp.zn[1]])
    assert not verify_compressed_sn_cycle(pp, bad)


def test_sn_cycle_tamper(proven):
    pp, proof, _ = proven
    bad = dataclasses.replace(proof, zn=[proof.zn[0] + 1, proof.zn[1]])
    assert not snc.verify(pp, bad)
    bad2 = dataclasses.replace(proof, pc_n=proof.pc_n + 1)
    assert not snc.verify(pp, bad2)
    # swapping two accumulators breaks their per-shape relaxed checks
    bad3 = dataclasses.replace(
        proof, u1s=[proof.u1s[1], proof.u1s[0]],
        w1s=[proof.w1s[1], proof.w1s[0]])
    assert not snc.verify(pp, bad3)
