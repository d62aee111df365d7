"""Toplevel LEM coroutines: LEM Funcs as memoset queries (Op::Crout).

Parity: /root/reference/src/lem/coroutine/{toplevel,eval}.rs — a
`Toplevel` is an ordered map Symbol -> Coroutine(Func); a
`ToplevelQuery` evaluates its coroutine's Func through the LEM
interpreter, with every `Op::Crout` dispatched as a recursive memoset
query (`Scope.query_recursively`), so mutually recursive coroutines get
memoized, deferred-proof semantics.

Query key encoding (toplevel.rs:200-236): `(name . args)` with args as
an IMPROPER list — the final argument is the cdr, e.g. `(factorial . 5)`
for one argument, `(f a . b)` for two.

The circuit side (CoroutineCircuit / synthesize_call, 809 LoC in the
reference) rides the NIVC machinery and remains future work; the eval
side here produces the exact Scope/transcript/balance data the circuit
will consume.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from ..lem import ir
from ..lem.interpreter import Hints, Interpreter, dummy_channel
from ..store.core import Ptr, Store
from ..symbol import Symbol
from .memoset import Query, Scope


@dataclasses.dataclass
class Coroutine:
    """One LEM-authored coroutine (toplevel.rs:21-33)."""

    func: ir.Func
    rc: int = 1


class Toplevel:
    """Ordered coroutine registry (toplevel.rs:36-49)."""

    def __init__(self, funcs: List[Tuple[Symbol, ir.Func]]):
        self._map: Dict[Symbol, Coroutine] = {
            sym: Coroutine(ir.deconflict_func(func))
            for sym, func in funcs
        }

    def get(self, name: Symbol) -> Optional[Coroutine]:
        return self._map.get(name)

    def index_of(self, name: Symbol) -> int:
        return list(self._map).index(name)

    def __len__(self) -> int:
        return len(self._map)

    def __iter__(self):
        return iter(self._map.items())


def to_improper_list(store: Store, ptrs: List[Ptr]) -> Ptr:
    """[a] -> a;  [a, b, c] -> (a b . c)  (toplevel.rs to_improper_list)."""
    assert ptrs
    if len(ptrs) == 1:
        return ptrs[0]
    return store.improper_list(ptrs[:-1], ptrs[-1])


class ToplevelQuery(Query):
    """A (name, args) query against a Toplevel (toplevel.rs:52-85)."""

    toplevel: Toplevel = None     # bound by make_query_cls

    def __init__(self, name: Symbol, args: List[Ptr]):
        coroutine = self.toplevel.get(name)
        if coroutine is None:
            raise ValueError(f"`{name}` not found in the toplevel")
        want = len(coroutine.func.input_params)
        if len(args) != want:
            raise ValueError(
                f"wrong number of arguments: expected {want}, "
                f"found {len(args)}")
        self.name = name
        self.args = args

    def symbol(self) -> Symbol:
        return self.name

    def index(self) -> int:
        return self.toplevel.index_of(self.name)

    def to_ptr(self, store: Store) -> Ptr:
        return store.cons(store.intern_symbol(self.name),
                          to_improper_list(store, self.args))

    @classmethod
    def from_ptr(cls, store: Store, ptr: Ptr) -> Optional["ToplevelQuery"]:
        head, acc = store.car_cdr(ptr)
        name = store.fetch_symbol(head)
        if name is None or cls.toplevel.get(name) is None:
            return None
        num_args = len(cls.toplevel.get(name).func.input_params)
        assert num_args > 0, "cannot yet make 0 argument queries"
        args = []
        while len(args) < num_args - 1:
            car, acc = store.car_cdr(acc)
            args.append(car)
        args.append(acc)
        return cls(name, args)

    def eval(self, scope: Scope) -> Ptr:
        coroutine = self.toplevel.get(self.name)

        def crout(sym: Symbol, args: List[Ptr]) -> List[Ptr]:
            child = type(self)(sym, list(args))
            return [scope.query_recursively(self, child)]

        interp = Interpreter(scope.store, crout=crout)
        outs = interp._call_func(coroutine.func, list(self.args),
                                 Hints(), dummy_channel())
        return to_improper_list(scope.store, list(outs))


def make_query_cls(toplevel: Toplevel):
    """Bind a Toplevel into a Scope-compatible query class (the
    reference threads it as Scope::runtime_data)."""
    return type("BoundToplevelQuery", (ToplevelQuery,),
                {"toplevel": toplevel})


def scope_for(toplevel: Toplevel, store: Store,
              default_rc: int = 1) -> Scope:
    return Scope(store, make_query_cls(toplevel), default_rc)
