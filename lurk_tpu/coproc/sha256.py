"""Sha256 coprocessor (evaluation side).

Parity: /root/reference/src/coprocessor/sha256.rs:21-120. For each
argument ZPtr, 64 bytes are laid out (32 LE tag bytes, 32 LE digest
bytes); the whole buffer is reversed, sha256-hashed, and the big-endian
digest integer is truncated to the field capacity (NUM_BITS - 1) —
matching the reference's pack_bits/discard_bits dance bit for bit.

The circuit side synthesizes the full in-circuit sha256 gadget
(lurk_tpu.r1cs.sha256_gadget), matching the reference's CoCircuit.
"""

from __future__ import annotations

import hashlib
from typing import List

from ..lem.evaluation import Coprocessor
from ..store.core import Ptr, Store
from ..symbol import Symbol, user_sym


def compute_sha256(store: Store, z_ptrs) -> int:
    field = store.field
    buf = bytearray()
    for z in z_ptrs:
        buf += int(z.tag).to_bytes(32, "little")
        buf += z.digest.to_bytes(32, "little")
    buf.reverse()
    digest = hashlib.sha256(bytes(buf)).digest()
    v = int.from_bytes(digest, "big")
    capacity = field.num_bits - 1
    return v & ((1 << capacity) - 1)


def sha256_evaluate(store: Store, args: List[Ptr]) -> Ptr:
    z_ptrs = [store.hash_ptr(p) for p in args]
    return store.num(compute_sha256(store, z_ptrs))


def sha256_coprocessor(n: int) -> Coprocessor:
    """Sha256Coprocessor of arity n (eval + in-circuit sha256 gadget)."""
    return Coprocessor(arity=n, evaluate=sha256_evaluate,
                       circuit=Sha256Circuit(n))


class Sha256Circuit:
    """Circuit side (CoCircuit parity, sha256.rs:27-66): strict bit
    decomposition of each arg's tag and digest, byte-padded, reversed,
    sha256 in-circuit, digest packed to the field capacity."""

    def __init__(self, n: int):
        self.n = n

    def synthesize(self, synth, not_dummy, inp):
        from ..lem.circuit import AllocatedPtr
        from ..r1cs.gadgets import Num, alloc_num, to_bits_le_strict
        from ..r1cs.cs import ConstraintSystem, lc_add, lc_scale, lc_sub
        from ..r1cs.sha256_gadget import sha256_bits
        from ..tags import ExprTag
        cs = synth.cs
        # inp = [args..., env, cont]; env/cont pass through unchanged
        # (CoCircuit::synthesize_internal parity, coprocessor/mod.rs:57-112)
        args, env, cont = inp[:self.n], inp[-2], inp[-1]
        bits = []

        def pad8(b):
            while len(b) % 8:
                from ..r1cs.gadgets import Bool
                b.append(Bool.false())

        for ptr in args:
            tag_bits = to_bits_le_strict(cs, ptr.tag)
            bits.extend(tag_bits)
            pad8(bits)
            hash_bits = to_bits_le_strict(cs, ptr.hash)
            bits.extend(hash_bits)
            pad8(bits)
        bits.reverse()
        digest_bits = sha256_bits(cs, bits)
        digest_bits.reverse()   # now LSB-first
        capacity = cs.field.num_bits - 1
        take = digest_bits[:capacity]
        value = sum(int(b.value) << i for i, b in enumerate(take))
        out = alloc_num(cs, value)
        pack = {}
        for i, b in enumerate(take):
            pack = lc_add(pack, lc_scale(b.lc(cs), 1 << i, cs.p), cs.p)
        cs.enforce(lc_sub(pack, out.lc, cs.p),
                   {ConstraintSystem.ONE_VAR: 1}, {})
        result = AllocatedPtr(Num.constant(cs, int(ExprTag.Num)), out)
        return [result, env, cont]


def sha256_nivc_symbol(n: int) -> Symbol:
    """Symbol used by the reference's sha256_nivc example."""
    return user_sym(f"sha256_nivc_{n}")
