"""ZData: the compact self-describing binary tree format.

Byte-format parity: /root/reference/src/z_data.rs:33-210. A value is an
Atom (byte leaf) or Cell (children); the tag byte encodes kind + small
length (< 64 inline, == 64 as the 0 small-size, else a trimmed LE size
prefix follows).

Also provides the field-element codec used by the legacy ZExpr/ZCont
serialization (z_expr.rs/z_cont.rs): field elements as 32-byte LE atoms.
"""

from __future__ import annotations

from typing import List, Tuple, Union

ZData = Union["Atom", "Cell"]


class Atom:
    __slots__ = ("bytes",)

    def __init__(self, data: bytes):
        self.bytes = bytes(data)

    def __eq__(self, other):
        return isinstance(other, Atom) and self.bytes == other.bytes

    def __repr__(self):
        return f"[a:{', '.join(f'{b:02x}' for b in self.bytes)}]"


class Cell:
    __slots__ = ("children",)

    def __init__(self, children: List[ZData]):
        self.children = list(children)

    def __eq__(self, other):
        return isinstance(other, Cell) and self.children == other.children

    def __repr__(self):
        return f"[c:{', '.join(map(repr, self.children))}]"


def _byte_count(x: int) -> int:
    """Bytes needed for x in trimmed LE (z_data.rs:82-89)."""
    if x == 0:
        return 1
    return (x.bit_length() - 1) // 8 + 1


byte_count = _byte_count


def to_trimmed_le_bytes(x: int) -> bytes:
    return x.to_bytes(_byte_count(x), "little")


def _tag(z: ZData) -> int:
    if isinstance(z, Atom):
        n = len(z.bytes)
        if n == 0:
            return 0b0000_0000
        if n < 64:
            return 0b0100_0000 + n
        if n == 64:
            return 0b0100_0000
        return _byte_count(n)
    n = len(z.children)
    if n == 0:
        return 0b1000_0000
    if n < 64:
        return 0b1100_0000 + n
    if n == 64:
        return 0b1100_0000
    return 0b1000_0000 + _byte_count(n)


def to_bytes(z: ZData) -> bytes:
    out = bytearray([_tag(z)])
    if isinstance(z, Atom):
        n = len(z.bytes)
        if n == 0:
            pass
        elif n <= 64:
            out += z.bytes
        else:
            out += to_trimmed_le_bytes(n)
            out += z.bytes
    else:
        n = len(z.children)
        if 0 < n <= 64:
            for c in z.children:
                out += to_bytes(c)
        elif n > 64:
            out += to_trimmed_le_bytes(n)
            for c in z.children:
                out += to_bytes(c)
    return bytes(out)


def _from_bytes_aux(data: bytes, off: int) -> Tuple[ZData, int]:
    tag = data[off]
    off += 1
    size = tag & 0b11_1111
    small = (tag & 0b0100_0000) != 0
    if small:
        size = 64 if size == 0 else size
    else:
        if size > 8:
            raise ValueError("size prefix too long")
        raw = data[off:off + size]
        if len(raw) < size:
            raise ValueError("truncated size prefix")
        off += size
        size = int.from_bytes(raw, "little")
    if (tag & 0b1000_0000) == 0:  # atom
        if not small and (tag & 0b0011_1111) == 0 and tag == 0:
            return Atom(b""), off
        if small:
            raw = data[off:off + size]
            if len(raw) < size:
                raise ValueError("truncated atom")
            return Atom(raw), off + size
        raw = data[off:off + size]
        if len(raw) < size:
            raise ValueError("truncated atom")
        return Atom(raw), off + size
    # cell
    if tag == 0b1000_0000:
        return Cell([]), off
    children = []
    for _ in range(size):
        child, off = _from_bytes_aux(data, off)
        children.append(child)
    return Cell(children), off


def from_bytes(data: bytes) -> ZData:
    z, off = _from_bytes_aux(data, 0)
    return z


# -- field codec (z_expr/z_cont atoms) ---------------------------------------


def f_to_atom(f: int) -> Atom:
    return Atom(f.to_bytes(32, "little"))


def atom_to_f(a: Atom) -> int:
    return int.from_bytes(a.bytes, "little")
