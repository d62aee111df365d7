"""Nova-style folding (NIFS) over relaxed R1CS with Pedersen commitments.

Functionality parity target: arecibo's `RecursiveSNARK::{new,prove_step,
verify}` driven by /root/reference/src/proof/nova.rs:260-373. This
module holds the NIFS primitives (shapes, commitment keys, fold math)
shared by every backend. The RecursiveSNARK/FoldingProof at the bottom
is the *-fold DEBUG backend (recomputing verifier); the production
backends are the augmented-circuit cycle provers (nova_cycle.py /
supernova_cycle.py — succinct, compressed by default).

Relaxed R1CS: Az ∘ Bz = u·(Cz) + E with z = (W, X, u).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

from ..curves.weierstrass import Affine, CURVE_FOR_FIELD, Curve
from ..r1cs.cs import LC, ConstraintSystem
from .transcript import Transcript


# ---------------------------------------------------------------------------
# Shape
# ---------------------------------------------------------------------------


class R1CSShape:
    """Frozen sparse R1CS over one field, z layout = (1|X | W)."""

    def __init__(self, cs: ConstraintSystem):
        self.p = cs.p
        self.field = cs.field
        self.num_inputs = cs.num_inputs          # includes the leading 1
        self.num_aux = cs.num_aux
        self.rows: List[Tuple[LC, LC, LC]] = cs.constraints
        self.digest = cs.shape_digest()

    @property
    def num_constraints(self) -> int:
        return len(self.rows)

    def _ev(self, lc: LC, z: List[int]) -> int:
        return sum(c * z[v] for v, c in lc.items()) % self.p

    def matvecs(self, z: List[int]) -> Tuple[List[int], List[int],
                                             List[int]]:
        if self.num_constraints >= 256:
            from ..native import r1cs as nr
            if nr.available():
                return nr.matvecs(self, z)
        p = self.p
        az, bz, cz = [], [], []
        for a, b, c in self.rows:
            az.append(self._ev(a, z))
            bz.append(self._ev(b, z))
            cz.append(self._ev(c, z))
        return az, bz, cz


# ---------------------------------------------------------------------------
# Pedersen commitment key
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CommitmentKey:
    curve: Curve
    gens: List[Affine]

    @staticmethod
    def setup(curve: Curve, label: bytes, n: int) -> "CommitmentKey":
        """Generator basis for Pedersen vector commitments.

        BN254 G1 uses the HyperKZG powers-of-tau SRS as its basis
        (reference parity: Bn256EngineKZG's CommitmentEngine IS the
        KZG engine, nova.rs:56-71 — commitments are then openable with
        pairings by proof/hyperkzg.py). Other curves (no pairing) use
        hash-derived generators + IPA."""
        if curve.name == "bn254-g1":
            from .hyperkzg import load_srs
            return CommitmentKey(curve, load_srs(n).powers)
        from .params_cache import load_generators
        return CommitmentKey(curve, load_generators(curve, label, n))

    def _device_table(self):
        """Device-resident MsmTable over this key's generators (v3
        dense-emission kernel). Default ON when an accelerator is
        attached and the key is big enough to win (r5: 1.46 s/msm
        pipelined at 2^20 vs ~2.9 s on the contended 4-core host —
        and the host cores are freed for witness/cross-term work).
        LURK_TPU_DEVICE_COMMITS=0 forces the host path,
        =1 forces the device path regardless of size."""
        import os
        flag = os.environ.get("LURK_TPU_DEVICE_COMMITS", "")
        if flag == "0":
            return None
        tab = getattr(self, "_dev_tab", None)
        if tab is None:
            import jax
            if jax.default_backend() == "cpu":
                object.__setattr__(self, "_dev_tab", False)
                return None
            from ..msm.device_v2 import MsmTable
            tab = MsmTable.build(self.curve, self.gens)
            object.__setattr__(self, "_dev_tab", tab)
        return tab or None

    def _mesh_table(self):
        """Sharded per-device table over the prover mesh (SURVEY §2.4:
        per-step commits ride the mesh when one is active — the
        nova.rs:297-332 parallel-commit analog). Built once per key."""
        from ..parallel.sharding import claim_cpu_msm_slot, prover_mesh
        mesh = prover_mesh()
        if mesh is None:
            return None
        tab = getattr(self, "_mesh_tab", None)
        if tab is None:
            if not claim_cpu_msm_slot(self.curve.name):
                # XLA:CPU fits one mesh-MSM executable per process;
                # this curve's commits take the native host path
                object.__setattr__(self, "_mesh_tab", False)
            else:
                from ..parallel.sharding import ShardedMsmTable
                tab = ShardedMsmTable(mesh, self.curve, self.gens)
                object.__setattr__(self, "_mesh_tab", tab)
        return tab or None

    def _route_path(self):
        from .params_cache import cache_dir
        return cache_dir() / (
            f"msm_route_v1_{self.curve.name}_{len(self.gens)}.txt")

    def _load_route(self):
        """Disk-cached race outcome: without it every prover process
        would pay the ~60-80 s device warmup (table build + upload +
        executable load) just to decide the route. Delete the file (or
        set LURK_TPU_DEVICE_COMMITS) to re-race after a hardware
        change."""
        try:
            v = self._route_path().read_text().strip()
            return v if v in ("device", "host") else None
        except Exception:
            return None

    def _store_route(self, route: str) -> None:
        try:
            self._route_path().parent.mkdir(parents=True, exist_ok=True)
            self._route_path().write_text(route)
        except Exception:
            pass

    def _race_routes(self, tab, vec) -> str:
        """Time one real commit each way; both results must agree
        (doubles as a device-parity check at prover scale)."""
        import time
        from ..msm import ec12 as E12
        from ..msm.device_v2 import _unflat
        from ..native import msm as nmsm
        # untimed warmup: executable load + first-dispatch costs are
        # one-time and must not bias the steady-state route choice
        E12.pt_from_device(self.curve,
                           _unflat(self.curve, tab.msm_async(vec)))
        t0 = time.perf_counter()
        out = tab.msm_async(vec)
        dev_pt = E12.pt_from_device(self.curve,
                                    _unflat(self.curve, out))[0]
        t_dev = time.perf_counter() - t0
        t0 = time.perf_counter()
        if nmsm.available():
            packed = getattr(self, "_packed", None)
            if packed is None or packed.shape[0] < len(self.gens):
                packed = nmsm.pack_points(self.gens)
                object.__setattr__(self, "_packed", packed)
            host_pt = nmsm.msm_packed(self.curve, vec, packed)
        else:
            host_pt = self.curve.pippenger(vec, self.gens[:len(vec)])
        t_host = time.perf_counter() - t0
        assert dev_pt == host_pt, "device commit != host commit"
        return "device" if t_dev < t_host else "host"

    def commit_async(self, vec: Sequence[int]):
        """Dispatch the commit without blocking when the DEVICE route
        is active; returns a zero-arg resolver. Lets the prover overlap
        a witness commit (device) with host cross-term work — the
        commit-level analog of the reference's witgen-parallel folding
        (nova.rs:297-332)."""
        import os
        n = len(vec)
        _flag = os.environ.get("LURK_TPU_DEVICE_COMMITS", "")
        route = getattr(self, "_route", None)
        if n >= 65536 and _flag != "0" and \
                (route == "device" or _flag == "1"):
            tab = self._device_table()
            if tab is not None:
                from ..msm import ec12 as E12
                from ..msm.device_v2 import _unflat
                out = tab.msm_async(vec)

                def resolve(out=out):
                    return E12.pt_from_device(
                        self.curve, _unflat(self.curve, out))[0]
                return resolve
        pt = self.commit(vec)
        return lambda: pt

    def commit(self, vec: Sequence[int]) -> Affine:
        n = len(vec)
        assert n <= len(self.gens), "commitment key too small"
        mesh_tab = self._mesh_table() if n >= 64 else None
        if mesh_tab is not None:
            import jax
            cpu = jax.default_backend() == "cpu"
            return mesh_tab.msm([v % self.curve.order for v in vec],
                                c=8 if cpu else 16,
                                lanes_w=8 if cpu else 512)
        import os
        _flag = os.environ.get("LURK_TPU_DEVICE_COMMITS", "")
        tab = None
        if n >= 65536 and _flag != "0":
            if _flag == "1":
                tab = self._device_table()
            else:
                # first big commit on this key: race device vs host
                # once and remember the winner (disk-cached — the
                # "routes automatically when the device benches
                # faster" contract; tunnel RTT and host-core
                # contention make a static threshold wrong both ways).
                # A cached "host" route skips the device table build
                # (~15 s + 277 MB upload) entirely.
                route = getattr(self, "_route", None)
                if route is None:
                    route = self._load_route()
                if route is None:
                    tab = self._device_table()
                    route = (self._race_routes(tab, list(vec))
                             if tab is not None else "host")
                    self._store_route(route)
                object.__setattr__(self, "_route", route)
                tab = self._device_table() if route == "device" else None
        if tab is not None:
            from ..msm import ec12 as E12
            from ..msm.device_v2 import _unflat
            out = tab.msm_async(vec)
            return E12.pt_from_device(self.curve,
                                      _unflat(self.curve, out))[0]
        from ..native import msm as nmsm
        if n >= 64 and nmsm.available():
            # packed-generator cache: keys are long-lived, commits hot
            packed = getattr(self, "_packed", None)
            if packed is None or packed.shape[0] < len(self.gens):
                packed = nmsm.pack_points(self.gens)
                object.__setattr__(self, "_packed", packed)
            return nmsm.msm_packed(self.curve, vec, packed)
        return self.curve.pippenger(list(vec), self.gens[:n])


# ---------------------------------------------------------------------------
# Instances / witnesses
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class R1CSInstance:
    """Strict instance: u = 1, E = 0."""

    comm_w: Affine
    x: List[int]


@dataclasses.dataclass
class RelaxedInstance:
    comm_w: Affine
    comm_e: Affine
    x: List[int]
    u: int

    @staticmethod
    def default(shape: R1CSShape) -> "RelaxedInstance":
        return RelaxedInstance(None, None, [0] * (shape.num_inputs - 1), 0)


@dataclasses.dataclass
class RelaxedWitness:
    w: List[int]
    e: List[int]

    @staticmethod
    def default(shape: R1CSShape) -> "RelaxedWitness":
        return RelaxedWitness([0] * shape.num_aux,
                              [0] * shape.num_constraints)


def z_vector(shape: R1CSShape, x: List[int], w, u: int = 1):
    """(u | X | W): the leading public ONE generalizes to u when
    relaxed. Returns a PackedVec when w is packed (native-resident
    accumulator path) — matvecs/cross_term/check_relaxed accept both."""
    from ..native.r1cs import PackedVec, pv_concat
    head = [u % shape.p] + [v % shape.p for v in x]
    if isinstance(w, PackedVec):
        return pv_concat(head, w, shape.p)
    return head + [v % shape.p for v in w]


def _native_r1cs():
    """The C++ sparse kernels (native/r1cs.cpp) or None; the Python
    paths below are the oracle and fallback."""
    from ..native import r1cs as nr
    return nr if nr.available() else None


def check_strict(shape: R1CSShape, x: List[int], w: List[int]) -> bool:
    nr = _native_r1cs()
    if nr is not None:
        return nr.check_relaxed(shape, z_vector(shape, x, w, 1), 1,
                                [0] * shape.num_constraints)
    az, bz, cz = shape.matvecs(z_vector(shape, x, w, 1))
    p = shape.p
    return all((a * b - c) % p == 0 for a, b, c in zip(az, bz, cz))


def check_relaxed(shape: R1CSShape, inst: RelaxedInstance,
                  wit: RelaxedWitness) -> bool:
    nr = _native_r1cs()
    if nr is not None:
        return nr.check_relaxed(
            shape, z_vector(shape, inst.x, wit.w, inst.u), inst.u,
            wit.e)
    p = shape.p
    az, bz, cz = shape.matvecs(z_vector(shape, inst.x, wit.w, inst.u))
    return all((a * b - (inst.u * c + e)) % p == 0
               for a, b, c, e in zip(az, bz, cz, wit.e))


# ---------------------------------------------------------------------------
# NIFS
# ---------------------------------------------------------------------------


def cross_term(shape: R1CSShape, inst1: RelaxedInstance,
               wit1: RelaxedWitness, x2: List[int], w2):
    """T = Az1∘Bz2 + Az2∘Bz1 − u1·Cz2 − Cz1  (u2 = 1 strict).
    Returns a PackedVec on the native path."""
    p = shape.p
    z1 = z_vector(shape, inst1.x, wit1.w, inst1.u)
    z2 = z_vector(shape, x2, w2, 1)
    nr = _native_r1cs()
    if nr is not None:
        return nr.cross_term_pv(shape, z1, inst1.u, z2)
    az1, bz1, cz1 = shape.matvecs(z1)
    az2, bz2, cz2 = shape.matvecs(z2)
    u1 = inst1.u
    return [
        (a1 * b2 + a2 * b1 - u1 * c2 - c1) % p
        for a1, b1, c1, a2, b2, c2 in
        zip(az1, bz1, cz1, az2, bz2, cz2)
    ]


def _absorb_relaxed(tr: Transcript, inst: RelaxedInstance) -> None:
    tr.absorb_point(inst.comm_w)
    tr.absorb_point(inst.comm_e)
    tr.absorb_scalar(inst.u)   # u accumulates in the scalar field: lossless
    for v in inst.x:
        tr.absorb_scalar(v)


def _absorb_strict(tr: Transcript, inst: R1CSInstance) -> None:
    tr.absorb_point(inst.comm_w)
    for v in inst.x:
        tr.absorb_scalar(v)


def fold_challenge(curve: Curve, shape_digest: str,
                   acc: RelaxedInstance, new: R1CSInstance,
                   comm_t: Affine) -> int:
    tr = Transcript(curve, b"nova.fold")
    tr.absorb(int(shape_digest[:32], 16))
    _absorb_relaxed(tr, acc)
    _absorb_strict(tr, new)
    tr.absorb_point(comm_t)
    return tr.squeeze()


def fold_instance(curve: Curve, acc: RelaxedInstance, new: R1CSInstance,
                  comm_t: Affine, r: int, order: int) -> RelaxedInstance:
    comm_w = curve.add(acc.comm_w, curve.mul(r, new.comm_w))
    comm_e = curve.add(acc.comm_e, curve.mul(r, comm_t))
    x = [(a + r * b) % order for a, b in zip(acc.x, new.x)]
    return RelaxedInstance(comm_w, comm_e, x, (acc.u + r) % order)


def fold_witness(p: int, acc: RelaxedWitness, w2, t,
                 r: int) -> RelaxedWitness:
    from ..native import r1cs as nr1cs
    if nr1cs.available() and len(acc.w) >= 1024:
        # packed-resident accumulators: no int marshalling per fold
        w = nr1cs.vec_rlc_pv(p, acc.w, w2, r)
        e = nr1cs.vec_rlc_pv(p, acc.e, t, r)
        return RelaxedWitness(w, e)
    w = [(a + r * b) % p for a, b in zip(acc.w, w2)]
    e = [(a + r * b) % p for a, b in zip(acc.e, t)]
    return RelaxedWitness(w, e)


# ---------------------------------------------------------------------------
# IVC driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PublicParams:
    shape: R1CSShape
    curve: Curve
    ck: CommitmentKey

    @staticmethod
    def setup(shape: R1CSShape,
              curve: Optional[Curve] = None) -> "PublicParams":
        if curve is None:
            # the commitment curve's group order must equal the circuit
            # field, else Pedersen folding linearity breaks
            curve = CURVE_FOR_FIELD[shape.field.name]
        assert curve.order == shape.p, \
            f"curve {curve.name} order != circuit field"
        # next power of two: the Spartan/IPA compression layer (spartan
        # .py) opens commitments over pow2-padded vectors, and Pedersen
        # prefix consistency means the padded commitment equals the
        # unpadded one, so one key serves both paths.
        n = max(shape.num_aux, shape.num_constraints, shape.num_inputs, 2)
        n = 1 << (n - 1).bit_length()
        return PublicParams(shape, curve,
                            CommitmentKey.setup(
                                curve, b"lurk_tpu.ck." + curve.name.encode(),
                                n))


@dataclasses.dataclass
class FoldingProof:
    """Fold chain: per-step strict instances + cross-term commitments,
    plus the final accumulated witness (uncompressed)."""

    steps: List[Tuple[R1CSInstance, Affine]]   # (instance_i, comm_T_i)
    final_witness: RelaxedWitness
    z0: List[int]
    zi: List[int]


class RecursiveSNARK:
    """Accumulates per-step (x, w) pairs (prove_step parity)."""

    def __init__(self, pp: PublicParams):
        self.pp = pp
        self.acc_inst = RelaxedInstance.default(pp.shape)
        self.acc_wit = RelaxedWitness.default(pp.shape)
        self.steps: List[Tuple[R1CSInstance, Affine]] = []
        self.z0: Optional[List[int]] = None
        self.zi: Optional[List[int]] = None

    def prove_step(self, x: List[int], w: List[int],
                   check: bool = False) -> None:
        pp = self.pp
        shape = pp.shape
        if check:
            assert check_strict(shape, x, w), "step witness unsatisfied"
        comm_w = pp.ck.commit(w)
        inst = R1CSInstance(comm_w, list(x))
        t = cross_term(shape, self.acc_inst, self.acc_wit, x, w)
        comm_t = pp.ck.commit(t)
        r = fold_challenge(pp.curve, shape.digest, self.acc_inst, inst,
                           comm_t)
        self.acc_inst = fold_instance(pp.curve, self.acc_inst, inst,
                                      comm_t, r, shape.p)
        self.acc_wit = fold_witness(shape.p, self.acc_wit, w, t, r)
        self.steps.append((inst, comm_t))

    def finish(self) -> FoldingProof:
        assert self.z0 is not None and self.zi is not None
        return FoldingProof(self.steps, self.acc_wit, self.z0, self.zi)


def verify(pp: PublicParams, proof: FoldingProof,
           io_chain_check=None) -> bool:
    """Recompute the fold chain and check the final relaxed witness.

    `io_chain_check(x_list)` optionally validates the step-to-step IO
    linkage (e.g. MultiFrame z_out == next z_in)."""
    shape = pp.shape
    # A zero-step proof is vacuous: the all-zero default accumulator is
    # satisfied by the default zero witness. Reject it (and malformed
    # public IO) here so direct callers are protected, not only those
    # routed through io_chain_checker.
    if not proof.steps:
        return False
    if any(len(inst.x) != shape.num_inputs - 1 for inst, _ in proof.steps):
        return False
    acc = RelaxedInstance.default(shape)
    for inst, comm_t in proof.steps:
        r = fold_challenge(pp.curve, shape.digest, acc, inst, comm_t)
        acc = fold_instance(pp.curve, acc, inst, comm_t, r, shape.p)
    if io_chain_check is not None:
        if not io_chain_check([inst.x for inst, _ in proof.steps]):
            return False
    # final relaxed satisfaction
    if not check_relaxed(shape, acc, proof.final_witness):
        return False
    # commitment consistency of the final accumulator
    if pp.ck.commit(proof.final_witness.w) != acc.comm_w:
        return False
    if pp.ck.commit(proof.final_witness.e) != acc.comm_e:
        return False
    return True
