"""Trie coprocessor: arity-8, height-85 Merkle-Poseidon trie.

Parity: /root/reference/src/coprocessor/trie/mod.rs — `StandardTrie =
Trie<F, 8, 85>` with New/Lookup/Insert coprocessors. Key path = the
big-endian bits of the key taken 3 at a time (85 * 3 = 255); empty
subtrees are precomputed (empty_roots chain of hash8); preimages are
registered in the store's inverse Poseidon cache so lookups can walk
digests back to children.

Anchors: the reference pins empty roots for small heights
(trie/mod.rs:925-940) — reproduced in tests.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..fields import FieldSpec
from ..lem.evaluation import Coprocessor, Lang
from ..store.core import Ptr, Store
from ..symbol import Symbol, user_sym

ARITY = 8
ARITY_BITS = 3
HEIGHT = 85


class TrieError(Exception):
    pass


class Trie:
    """Sparse Merkle trie backed by a store's Poseidon inverse cache."""

    def __init__(self, store: Store, root: Optional[int] = None):
        self.store = store
        self.empty_roots = self._compute_empty_roots()
        self.root = self.empty_roots[HEIGHT - 1] if root is None else root

    def _hash(self, preimage: List[int]) -> int:
        # memoized + registered in the inverse cache
        return self.store.poseidon.hash(preimage)

    def _preimage(self, digest: int) -> Optional[Tuple[int, ...]]:
        return self.store.poseidon.inverse.get((ARITY, digest))

    def _compute_empty_roots(self) -> List[int]:
        cache = getattr(self.store, "_trie_empty_roots", None)
        if cache is not None:
            return cache
        roots = []
        preimage = [0] * ARITY
        for _ in range(HEIGHT):
            h = self._hash(list(preimage))
            roots.append(h)
            preimage = [h] * ARITY
        self.store._trie_empty_roots = roots
        return roots

    def empty_root_for_height(self, height: int) -> int:
        if height == 0:
            return 0
        return self.empty_roots[height - 1]

    @staticmethod
    def path(key: int, num_bits: int) -> List[int]:
        """Big-endian 3-bit chunks of the key (trie/mod.rs:580-607)."""
        bits_needed = ARITY_BITS * HEIGHT
        bits = [(key >> i) & 1 for i in range(num_bits)]  # LE
        bits += [0] * (bits_needed - len(bits))
        bits.reverse()  # BE
        bits = bits[len(bits) - bits_needed:]
        out = []
        for c in range(HEIGHT):
            chunk = bits[c * ARITY_BITS:(c + 1) * ARITY_BITS]
            acc = 0
            for b in chunk:
                acc = 2 * acc + b
            out.append(acc)
        return out

    def _key_path(self, key: int) -> List[int]:
        return self.path(key, self.store.field.num_bits)

    # -- lookup ---------------------------------------------------------------

    def prove_lookup(self, key: int) -> List[Tuple[int, ...]]:
        """Preimage path from root to leaf (Merkle inclusion hint)."""
        path = self._key_path(key)
        preimages = []
        nxt = self.root
        for k in path:
            pre = self._preimage(nxt)
            if pre is None:
                raise TrieError(f"missing preimage for {nxt:#x}")
            preimages.append(pre)
            nxt = pre[k]
        return preimages

    def lookup_aux(self, key: int) -> int:
        path = self._key_path(key)
        preimages = self.prove_lookup(key)
        return preimages[-1][path[-1]]

    def lookup(self, key: int) -> Optional[int]:
        payload = self.lookup_aux(key)
        return payload if payload != 0 else None

    # -- insert ---------------------------------------------------------------

    def insert(self, key: int, value: int) -> bool:
        path = self._key_path(key)
        old_preimages = self.prove_lookup(key)
        new_value = value
        for k, pre in zip(reversed(path), reversed(old_preimages)):
            new_pre = list(pre)
            new_pre[k] = new_value
            new_value = self._hash(new_pre)
        inserted = new_value != self.root
        self.root = new_value
        return inserted


# -- coprocessors (TrieCoproc parity) -----------------------------------------


def _new_evaluate(store: Store, args: List[Ptr]) -> Ptr:
    return store.num(Trie(store).root)


def _lookup_evaluate(store: Store, args: List[Ptr]) -> Ptr:
    root = store.hash_ptr(args[0]).digest
    key = store.hash_ptr(args[1]).digest
    trie = Trie(store, root)
    return store.comm(trie.lookup_aux(key))


def _insert_evaluate(store: Store, args: List[Ptr]) -> Ptr:
    root = store.hash_ptr(args[0]).digest
    key = store.hash_ptr(args[1]).digest
    val = store.hash_ptr(args[2]).digest
    trie = Trie(store, root)
    trie.insert(key, val)
    return store.num(trie.root)


def new_coprocessor() -> Coprocessor:
    return Coprocessor(arity=0, evaluate=_new_evaluate)


def lookup_coprocessor() -> Coprocessor:
    return Coprocessor(arity=2, evaluate=_lookup_evaluate)


def insert_coprocessor() -> Coprocessor:
    return Coprocessor(arity=3, evaluate=_insert_evaluate)


def install_trie_lang() -> Tuple[Lang, Symbol, Symbol, Symbol]:
    """Lang with .lurk.trie.{new,lookup,insert} (trie demo parity)."""
    new_sym = Symbol(("lurk", "trie", "new"), False)
    lookup_sym = Symbol(("lurk", "trie", "lookup"), False)
    insert_sym = Symbol(("lurk", "trie", "insert"), False)
    lang = Lang()
    lang.add_coprocessor(new_sym, new_coprocessor())
    lang.add_coprocessor(lookup_sym, lookup_coprocessor())
    lang.add_coprocessor(insert_sym, insert_coprocessor())
    return lang, new_sym, lookup_sym, insert_sym
