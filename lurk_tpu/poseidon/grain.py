"""Grain-LFSR round-constant generation for Poseidon, Neptune-compatible.

Re-implements the constant-generation scheme of the Poseidon paper's
``generate_parameters_grain.sage`` as used by the ``neptune`` crate
(the reference's Poseidon provider; see /root/reference/src/hash.rs:60-83
for how Lurk instantiates ``PoseidonConstants::new()`` per arity).

The LFSR state is 80 bits seeded with (field, sbox, n, t, R_F, R_P, 1^30);
output bits are produced in a self-shrinking mode: bits are consumed in
non-overlapping pairs, the second bit of a pair is emitted iff the first
bit is 1. Round-constant candidates take ``n`` bits MSB-first and are
rejection-sampled against the field modulus.
"""

from __future__ import annotations

from typing import Iterator, List


class GrainLFSR:
    """80-bit Grain LFSR in self-shrinking mode."""

    _TAPS = (62, 51, 38, 23, 13, 0)

    def __init__(self, field_code: int, sbox_code: int, n: int, t: int,
                 r_f: int, r_p: int):
        bits: List[int] = []
        _append_bits(bits, 2, field_code)
        _append_bits(bits, 4, sbox_code)
        _append_bits(bits, 12, n)
        _append_bits(bits, 12, t)
        _append_bits(bits, 10, r_f)
        _append_bits(bits, 10, r_p)
        _append_bits(bits, 30, (1 << 30) - 1)
        assert len(bits) == 80
        self._state = bits
        # 160 warm-up clocks, outputs discarded.
        for _ in range(160):
            self._clock()

    def _clock(self) -> int:
        s = self._state
        new_bit = (
            s[62] ^ s[51] ^ s[38] ^ s[23] ^ s[13] ^ s[0]
        )
        s.pop(0)
        s.append(new_bit)
        return new_bit

    def next_filtered_bit(self) -> int:
        """Self-shrinking output: first bit of a pair selects whether the
        second bit is emitted."""
        while True:
            b1 = self._clock()
            b2 = self._clock()
            if b1:
                return b2

    def next_bits(self, n: int) -> List[int]:
        return [self.next_filtered_bit() for _ in range(n)]

    def field_elements(self, modulus: int, n_bits: int,
                       count: int) -> Iterator[int]:
        """Yield ``count`` uniformly sampled field elements: ``n_bits``
        filtered bits MSB-first per candidate, rejection-sampled < modulus."""
        for _ in range(count):
            while True:
                v = 0
                for b in self.next_bits(n_bits):
                    v = (v << 1) | b
                if v < modulus:
                    yield v
                    break


def _append_bits(out: List[int], width: int, value: int) -> None:
    for i in range(width - 1, -1, -1):
        out.append((value >> i) & 1)


def generate_round_constants(modulus: int, n_bits: int, t: int, r_f: int,
                             r_p: int, field_code: int = 1,
                             sbox_code: int = 0) -> List[int]:
    """All (r_f + r_p) * t round constants, in generation order."""
    lfsr = GrainLFSR(field_code, sbox_code, n_bits, t, r_f, r_p)
    return list(lfsr.field_elements(modulus, n_bits, (r_f + r_p) * t))
