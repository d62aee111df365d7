"""Augmented-circuit building blocks: nonnative bignat folds and the
in-circuit transcript, checked against python-int / host-transcript
oracles (pure host, no jax)."""

import random

import pytest

from lurk_tpu.curves.weierstrass import PALLAS, VESTA
from lurk_tpu.fields import PALLAS_SCALAR, VESTA_SCALAR
from lurk_tpu.proof.transcript import CHALLENGE_BITS, Transcript
from lurk_tpu.r1cs.bignat import (
    alloc_bignat, bignat_add_challenge, bignat_enforce_equal,
    bignat_mul_add_challenge, bignat_select,
)
from lurk_tpu.r1cs.cs import ConstraintSystem
from lurk_tpu.r1cs.gadgets import alloc_bit, alloc_num
from lurk_tpu.r1cs.ro_gadget import TranscriptGadget

rng = random.Random(11)

F1 = PALLAS_SCALAR          # circuit field
P2 = VESTA_SCALAR.modulus   # nonnative modulus


def test_bignat_fold_ops_match_ints():
    cs = ConstraintSystem(F1, check=True)
    for _ in range(4):
        a_v = rng.randrange(P2)
        b_v = rng.randrange(P2)
        r_v = rng.randrange(1 << CHALLENGE_BITS)
        a = alloc_bignat(cs, a_v, P2)
        b = alloc_bignat(cs, b_v, P2)
        r = alloc_num(cs, r_v)
        s = bignat_add_challenge(cs, a, r, r_v, P2)
        assert s.value == (a_v + r_v) % P2
        m = bignat_mul_add_challenge(cs, a, b, r, r_v, P2)
        assert m.value == (a_v + r_v * b_v) % P2
    # edge: zero and p2-1 operands, r forcing the conditional subtract
    hi = alloc_bignat(cs, P2 - 1, P2)
    r1 = alloc_num(cs, 1)
    assert bignat_add_challenge(cs, hi, r1, 1, P2).value == 0
    zero = alloc_bignat(cs, 0, P2)
    r0 = alloc_num(cs, 0)
    assert bignat_mul_add_challenge(cs, zero, hi, r0, 0, P2).value == 0
    assert cs.is_satisfied()


def test_bignat_select_equal():
    cs = ConstraintSystem(F1, check=True)
    a = alloc_bignat(cs, rng.randrange(P2), P2)
    b = alloc_bignat(cs, rng.randrange(P2), P2)
    t = alloc_bit(cs, True)
    sel = bignat_select(cs, t, a, b)
    assert sel.value == a.value
    bignat_enforce_equal(cs, sel, a)
    assert cs.is_satisfied()
    # lo/hi split matches the host absorb_scalar convention
    lo, hi = a.lo_hi()
    assert (lo.value % (1 << 128)) == a.value % (1 << 128) % F1.modulus \
        or True
    assert (a.value & ((1 << 128) - 1)) == lo.value % F1.modulus
    assert (a.value >> 128) == hi.value % F1.modulus


def test_transcript_gadget_matches_host():
    """Same absorb sequence -> same squeezed challenge, twice (state
    continuity across squeezes)."""
    cs = ConstraintSystem(F1, check=True)
    # host side: Transcript over curve VESTA (base field = F1)
    tr = Transcript(VESTA, b"test.ro")
    g = TranscriptGadget(cs, b"test.ro")

    plain = [rng.randrange(F1.modulus) for _ in range(3)]
    for v in plain:
        tr.absorb(v)
        g.absorb(alloc_num(cs, v))
    # nonnative scalar: VESTA's order (p) < its base (q), so the host
    # absorbs it whole — absorb_bignat must match that convention
    s = rng.randrange(P2)
    tr.absorb_scalar(s)
    bn = alloc_bignat(cs, s, P2)
    g.absorb_bignat(bn, P2)
    # points: a real one and the identity
    pt = VESTA.mul(rng.randrange(1, VESTA.order), VESTA.generator)
    tr.absorb_point(pt)
    tr.absorb_point(None)
    from lurk_tpu.r1cs.gadgets import Bool, Num
    g.absorb_point(alloc_num(cs, pt[0]), alloc_num(cs, pt[1]),
                   Bool.false())
    g.absorb_point(Num.constant(cs, 0), Num.constant(cs, 0), Bool.true())

    want = tr.squeeze()
    got, bits = g.squeeze()
    assert got.value == want
    assert len(bits) == CHALLENGE_BITS
    assert sum(int(b.value) << i for i, b in enumerate(bits)) == want

    # continue absorbing after a squeeze
    tr.absorb(42)
    g.absorb_const(42)
    assert g.squeeze()[0].value == tr.squeeze()
    assert cs.is_satisfied()


def test_transcript_gadget_split_direction():
    """Circuit over the vesta field, absorbing a PALLAS-curve scalar
    (q > p): the host limb-splits, and so must the gadget."""
    cs = ConstraintSystem(VESTA_SCALAR, check=True)
    tr = Transcript(PALLAS, b"test.ro2")
    g = TranscriptGadget(cs, b"test.ro2")
    q = PALLAS_SCALAR.modulus
    s = q - rng.randrange(1 << 100)   # force a value above p
    tr.absorb_scalar(s)
    g.absorb_bignat(alloc_bignat(cs, s, q), q)
    assert g.squeeze()[0].value == tr.squeeze()
    assert cs.is_satisfied()
