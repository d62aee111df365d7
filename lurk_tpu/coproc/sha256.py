"""Sha256 coprocessor (evaluation side).

Parity: /root/reference/src/coprocessor/sha256.rs:21-120. For each
argument ZPtr, 64 bytes are laid out (32 LE tag bytes, 32 LE digest
bytes); the whole buffer is reversed, sha256-hashed, and the big-endian
digest integer is truncated to the field capacity (NUM_BITS - 1) —
matching the reference's pack_bits/discard_bits dance bit for bit.

The circuit side currently consumes the evaluated result as
non-deterministic advice (Coprocessor.has_circuit=False path of the
reference); an in-circuit sha256 gadget is the planned upgrade.
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
    """Sha256Coprocessor of arity n."""
    return Coprocessor(arity=n, evaluate=sha256_evaluate)


def sha256_nivc_symbol(n: int) -> Symbol:
    """Symbol used by the reference's sha256_nivc example."""
    return user_sym(f"sha256_nivc_{n}")
