"""Proof persistence: LurkProof / LurkProofMeta / Commitment files.

Parity: /root/reference/src/cli/lurk_proof.rs:30-80, field_data.rs,
commitment.rs, paths.rs — proofs and commitments are persisted under the
cache dir keyed by proof key `{backend}_{field}_{rc}_{claim_hash}`
(repl/mod.rs:297-300).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import List, Optional, Tuple

from ..curves.weierstrass import Affine
from ..fields import FieldSpec
from ..proof.nova import (
    FoldingProof, R1CSInstance, RelaxedWitness,
)
from ..store.core import Store, ZPtr
from ..store.zdag import ZDag


def proofs_dir() -> Path:
    base = os.environ.get("LURK_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".lurk_tpu"))
    d = Path(base) / "proofs"
    d.mkdir(parents=True, exist_ok=True)
    return d


def commits_dir() -> Path:
    base = os.environ.get("LURK_TPU_CACHE",
                          os.path.join(os.path.expanduser("~"),
                                       ".lurk_tpu"))
    d = Path(base) / "commits"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _pt(p: Affine):
    return None if p is None else [f"{p[0]:x}", f"{p[1]:x}"]


def _un_pt(v) -> Affine:
    return None if v is None else (int(v[0], 16), int(v[1], 16))


def proof_to_json(proof: FoldingProof) -> dict:
    return {
        "steps": [
            {"comm_w": _pt(inst.comm_w),
             "x": [f"{v:x}" for v in inst.x],
             "comm_t": _pt(comm_t)}
            for inst, comm_t in proof.steps
        ],
        "final_w": [f"{v:x}" for v in proof.final_witness.w],
        "final_e": [f"{v:x}" for v in proof.final_witness.e],
        "z0": [f"{v:x}" for v in proof.z0],
        "zi": [f"{v:x}" for v in proof.zi],
    }


def nivc_proof_to_json(proof) -> dict:
    return {
        "steps": [
            {"pc": pc,
             "comm_w": _pt(inst.comm_w),
             "x": [f"{v:x}" for v in inst.x],
             "comm_t": _pt(comm_t)}
            for pc, inst, comm_t in proof.steps
        ],
        "final": {
            str(pc): {"w": [f"{v:x}" for v in wit.w],
                      "e": [f"{v:x}" for v in wit.e]}
            for pc, wit in proof.final_witnesses.items()
        },
        "z0": [f"{v:x}" for v in proof.z0],
        "zi": [f"{v:x}" for v in proof.zi],
    }


def nivc_proof_from_json(d: dict):
    from ..proof.supernova import NivcProof
    steps = [
        (s["pc"],
         R1CSInstance(_un_pt(s["comm_w"]),
                      [int(v, 16) for v in s["x"]]),
         _un_pt(s["comm_t"]))
        for s in d["steps"]
    ]
    final = {
        int(pc): RelaxedWitness([int(v, 16) for v in wd["w"]],
                                [int(v, 16) for v in wd["e"]])
        for pc, wd in d["final"].items()
    }
    return NivcProof(steps, final,
                     [int(v, 16) for v in d["z0"]],
                     [int(v, 16) for v in d["zi"]])


def _spartan_to_json(sp) -> dict:
    def ipa(pr):
        return {"ls": [_pt(q) for q in pr.ls],
                "rs": [_pt(q) for q in pr.rs],
                "a": f"{pr.a_final:x}"}

    def hkzg(pr):
        return {"comms": [_pt(q) for q in pr.comms],
                "evals": [[f"{v:x}" for v in ev] for ev in pr.evals],
                "quotients": [_pt(q) for q in pr.quotients]}
    out = {
        "sc1": [[f"{v:x}" for v in row] for row in sp.sc1_polys],
        "claims": [f"{v:x}" for v in sp.claims],
        "sc2": [[f"{v:x}" for v in row] for row in sp.sc2_polys],
        "w_eval": f"{sp.w_eval:x}",
    }
    if getattr(sp, "hkzg_joint", None) is not None:
        j = sp.hkzg_joint
        out["hkzg_joint"] = {
            "comms": [[_pt(q) for q in cms] for cms in j.comms],
            "evals": [[[f"{v:x}" for v in ev] for ev in evs]
                      for evs in j.evals],
            "w": _pt(j.w), "wp": _pt(j.wp)}
    elif sp.hkzg_w is not None:
        out["hkzg_w"] = hkzg(sp.hkzg_w)
        out["hkzg_e"] = hkzg(sp.hkzg_e)
    else:
        out["ipa_w"] = ipa(sp.ipa_w)
        out["ipa_e"] = ipa(sp.ipa_e)
    return out


def _spartan_from_json(d: dict):
    from ..proof.ipa import IpaProof
    from ..proof.hyperkzg import HkzgProof
    from ..proof.spartan import SpartanProof

    def ipa(v):
        return IpaProof([_un_pt(q) for q in v["ls"]],
                        [_un_pt(q) for q in v["rs"]],
                        int(v["a"], 16))

    def hkzg(v):
        return HkzgProof([_un_pt(q) for q in v["comms"]],
                         [tuple(int(x, 16) for x in ev)
                          for ev in v["evals"]],
                         [_un_pt(q) for q in v["quotients"]])
    base = [
        [[int(v, 16) for v in row] for row in d["sc1"]],
        tuple(int(v, 16) for v in d["claims"]),
        [[int(v, 16) for v in row] for row in d["sc2"]],
        int(d["w_eval"], 16)]
    if "hkzg_joint" in d:
        from ..proof.hyperkzg import HkzgBatchProof
        v = d["hkzg_joint"]
        joint = HkzgBatchProof(
            [[_un_pt(q) for q in cms] for cms in v["comms"]],
            [[tuple(int(x, 16) for x in ev) for ev in evs]
             for evs in v["evals"]],
            _un_pt(v["w"]), _un_pt(v["wp"]))
        return SpartanProof(*base, None, None, None, None, joint)
    if "hkzg_w" in d:
        return SpartanProof(*base, None, None,
                            hkzg(d["hkzg_w"]), hkzg(d["hkzg_e"]))
    return SpartanProof(*base, ipa(d["ipa_w"]), ipa(d["ipa_e"]))


def compressed_proof_to_json(proof) -> dict:
    """spartan.CompressedProof (IVC) -> json dict."""
    return {
        "steps": [
            {"comm_w": _pt(inst.comm_w),
             "x": [f"{v:x}" for v in inst.x],
             "comm_t": _pt(comm_t)}
            for inst, comm_t in proof.steps
        ],
        "spartan": _spartan_to_json(proof.spartan),
        "z0": [f"{v:x}" for v in proof.z0],
        "zi": [f"{v:x}" for v in proof.zi],
    }


def compressed_proof_from_json(d: dict):
    from ..proof.spartan import CompressedProof
    steps = [
        (R1CSInstance(_un_pt(s["comm_w"]),
                      [int(v, 16) for v in s["x"]]),
         _un_pt(s["comm_t"]))
        for s in d["steps"]
    ]
    return CompressedProof(steps, _spartan_from_json(d["spartan"]),
                           [int(v, 16) for v in d["z0"]],
                           [int(v, 16) for v in d["zi"]])


def compressed_nivc_to_json(proof) -> dict:
    return {
        "steps": [
            {"pc": pc,
             "comm_w": _pt(inst.comm_w),
             "x": [f"{v:x}" for v in inst.x],
             "comm_t": _pt(comm_t)}
            for pc, inst, comm_t in proof.steps
        ],
        "spartans": {str(pc): _spartan_to_json(sp)
                     for pc, sp in proof.spartans.items()},
        "z0": [f"{v:x}" for v in proof.z0],
        "zi": [f"{v:x}" for v in proof.zi],
    }


def compressed_nivc_from_json(d: dict):
    from ..proof.supernova import CompressedNivcProof
    steps = [
        (s["pc"],
         R1CSInstance(_un_pt(s["comm_w"]),
                      [int(v, 16) for v in s["x"]]),
         _un_pt(s["comm_t"]))
        for s in d["steps"]
    ]
    spartans = {int(pc): _spartan_from_json(sp)
                for pc, sp in d["spartans"].items()}
    return CompressedNivcProof(steps, spartans,
                               [int(v, 16) for v in d["z0"]],
                               [int(v, 16) for v in d["zi"]])


def _relaxed_to_json(u) -> dict:
    return {"comm_w": _pt(u.comm_w), "comm_e": _pt(u.comm_e),
            "x": [f"{v:x}" for v in u.x], "u": f"{u.u:x}"}


def _relaxed_from_json(d: dict):
    from ..proof.nova import RelaxedInstance
    return RelaxedInstance(_un_pt(d["comm_w"]), _un_pt(d["comm_e"]),
                           [int(v, 16) for v in d["x"]], int(d["u"], 16))


def _relaxed_wit_to_json(w) -> dict:
    return {"w": [f"{v:x}" for v in w.w], "e": [f"{v:x}" for v in w.e]}


def _relaxed_wit_from_json(d: dict):
    return RelaxedWitness([int(v, 16) for v in d["w"]],
                          [int(v, 16) for v in d["e"]])


def cycle_snark_to_json(snark) -> dict:
    """Live CycleSNARK accumulator -> json (chain-server session dumps:
    the reference serializes the running RecursiveSNARK itself,
    chain-server/src/server.rs:427-440 StreamSessionData)."""
    d = {
        "z0": [f"{v:x}" for v in snark.z0],
        "zi": [f"{v:x}" for v in snark.zi],
        "i": snark.i,
        "h": f"{snark.h:x}",
        "g": f"{snark.g:x}",
        "u1": _relaxed_to_json(snark.U1),
        "w1": _relaxed_wit_to_json(snark.W1),
        "u2": _relaxed_to_json(snark.U2),
        "w2": _relaxed_wit_to_json(snark.W2),
        "pending": None,
    }
    if snark.pending is not None:
        u, wvec = snark.pending
        d["pending"] = {"comm_w": _pt(u.comm_w),
                        "x": [f"{v:x}" for v in u.x],
                        "w": [f"{v:x}" for v in wvec]}
    return d


def cycle_snark_from_json(d: dict, pp):
    from ..proof.nova_cycle import CycleSNARK
    snark = CycleSNARK(pp, [int(v, 16) for v in d["z0"]])
    snark.zi = [int(v, 16) for v in d["zi"]]
    snark.i = d["i"]
    snark.h = int(d["h"], 16)
    snark.g = int(d["g"], 16)
    snark.U1 = _relaxed_from_json(d["u1"])
    snark.W1 = _relaxed_wit_from_json(d["w1"])
    snark.U2 = _relaxed_from_json(d["u2"])
    snark.W2 = _relaxed_wit_from_json(d["w2"])
    if d["pending"] is not None:
        pend = d["pending"]
        snark.pending = (
            R1CSInstance(_un_pt(pend["comm_w"]),
                         [int(v, 16) for v in pend["x"]]),
            [int(v, 16) for v in pend["w"]])
    return snark


def cycle_proof_to_json(proof) -> dict:
    """prover_cycle CycleProof (O(1) augmented-circuit IVC) -> json."""
    return {
        "n": proof.n,
        "z0": [f"{v:x}" for v in proof.z0],
        "zn": [f"{v:x}" for v in proof.zn],
        "u1": _relaxed_to_json(proof.u1),
        "w1": _relaxed_wit_to_json(proof.w1),
        "u2": _relaxed_to_json(proof.u2),
        "u2_pending": {"comm_w": _pt(proof.u2_pending.comm_w),
                       "x": [f"{v:x}" for v in proof.u2_pending.x]},
        "comm_t_last": _pt(proof.comm_t_last),
        "w2_folded": _relaxed_wit_to_json(proof.w2_folded),
    }


def cycle_proof_from_json(d: dict):
    from ..proof.nova_cycle import CycleProof
    return CycleProof(
        d["n"],
        [int(v, 16) for v in d["z0"]],
        [int(v, 16) for v in d["zn"]],
        _relaxed_from_json(d["u1"]),
        _relaxed_wit_from_json(d["w1"]),
        _relaxed_from_json(d["u2"]),
        R1CSInstance(_un_pt(d["u2_pending"]["comm_w"]),
                     [int(v, 16) for v in d["u2_pending"]["x"]]),
        _un_pt(d["comm_t_last"]),
        _relaxed_wit_from_json(d["w2_folded"]),
    )


def compressed_cycle_to_json(cp) -> dict:
    return {
        "n": cp.n,
        "z0": [f"{v:x}" for v in cp.z0],
        "zn": [f"{v:x}" for v in cp.zn],
        "u1": _relaxed_to_json(cp.u1),
        "u2": _relaxed_to_json(cp.u2),
        "u2_pending": {"comm_w": _pt(cp.u2_pending.comm_w),
                       "x": [f"{v:x}" for v in cp.u2_pending.x]},
        "comm_t_last": _pt(cp.comm_t_last),
        "spartan1": _spartan_to_json(cp.spartan1),
        "spartan2": _spartan_to_json(cp.spartan2),
    }


def compressed_cycle_from_json(d: dict):
    from ..proof.prover_cycle import CompressedCycleProof
    return CompressedCycleProof(
        d["n"],
        [int(v, 16) for v in d["z0"]],
        [int(v, 16) for v in d["zn"]],
        _relaxed_from_json(d["u1"]),
        _relaxed_from_json(d["u2"]),
        R1CSInstance(_un_pt(d["u2_pending"]["comm_w"]),
                     [int(v, 16) for v in d["u2_pending"]["x"]]),
        _un_pt(d["comm_t_last"]),
        _spartan_from_json(d["spartan1"]),
        _spartan_from_json(d["spartan2"]),
    )




def sn_cycle_proof_to_json(proof) -> dict:
    return {
        "n": proof.n,
        "z0": [f"{v:x}" for v in proof.z0],
        "zn": [f"{v:x}" for v in proof.zn],
        "pc_n": proof.pc_n,
        "u1s": [_relaxed_to_json(u) for u in proof.u1s],
        "w1s": [_relaxed_wit_to_json(w) for w in proof.w1s],
        "u2": _relaxed_to_json(proof.u2),
        "u2_pending": {"comm_w": _pt(proof.u2_pending.comm_w),
                       "x": [f"{v:x}" for v in proof.u2_pending.x]},
        "comm_t_last": _pt(proof.comm_t_last),
        "w2_folded": _relaxed_wit_to_json(proof.w2_folded),
    }


def sn_cycle_proof_from_json(d: dict):
    from ..proof.supernova_cycle import SnCycleProof
    return SnCycleProof(
        d["n"],
        [int(v, 16) for v in d["z0"]],
        [int(v, 16) for v in d["zn"]],
        d["pc_n"],
        [_relaxed_from_json(u) for u in d["u1s"]],
        [_relaxed_wit_from_json(w) for w in d["w1s"]],
        _relaxed_from_json(d["u2"]),
        R1CSInstance(_un_pt(d["u2_pending"]["comm_w"]),
                     [int(v, 16) for v in d["u2_pending"]["x"]]),
        _un_pt(d["comm_t_last"]),
        _relaxed_wit_from_json(d["w2_folded"]),
    )


def compressed_sn_cycle_to_json(cp) -> dict:
    return {
        "n": cp.n,
        "z0": [f"{v:x}" for v in cp.z0],
        "zn": [f"{v:x}" for v in cp.zn],
        "pc_n": cp.pc_n,
        "u1s": [_relaxed_to_json(u) for u in cp.u1s],
        "u2": _relaxed_to_json(cp.u2),
        "u2_pending": {"comm_w": _pt(cp.u2_pending.comm_w),
                       "x": [f"{v:x}" for v in cp.u2_pending.x]},
        "comm_t_last": _pt(cp.comm_t_last),
        "spartans1": [_spartan_to_json(sp) for sp in cp.spartans1],
        "spartan2": _spartan_to_json(cp.spartan2),
    }


def compressed_sn_cycle_from_json(d: dict):
    from ..proof.prover_supernova_cycle import CompressedSnCycleProof
    return CompressedSnCycleProof(
        d["n"],
        [int(v, 16) for v in d["z0"]],
        [int(v, 16) for v in d["zn"]],
        d["pc_n"],
        [_relaxed_from_json(u) for u in d["u1s"]],
        _relaxed_from_json(d["u2"]),
        R1CSInstance(_un_pt(d["u2_pending"]["comm_w"]),
                     [int(v, 16) for v in d["u2_pending"]["x"]]),
        _un_pt(d["comm_t_last"]),
        [_spartan_from_json(sp) for sp in d["spartans1"]],
        _spartan_from_json(d["spartan2"]),
    )


def proof_from_json(d: dict) -> FoldingProof:
    steps = [
        (R1CSInstance(_un_pt(s["comm_w"]),
                      [int(v, 16) for v in s["x"]]),
         _un_pt(s["comm_t"]))
        for s in d["steps"]
    ]
    wit = RelaxedWitness([int(v, 16) for v in d["final_w"]],
                         [int(v, 16) for v in d["final_e"]])
    return FoldingProof(steps, wit,
                        [int(v, 16) for v in d["z0"]],
                        [int(v, 16) for v in d["zi"]])


@dataclasses.dataclass
class LurkProof:
    """Persisted proof + public IO + rc (lurk_proof.rs parity).

    `kind` is "recursive" (uncompressed fold chain + final witness) or
    "compressed" (fold chain + Spartan/IPA proof — the reference always
    persists the compressed form, nova.rs:331-373)."""

    proof: object
    rc: int
    field: str
    backend: str = "supernova"
    kind: str = "recursive"

    def persist(self, proof_key: str) -> Path:
        path = proofs_dir() / f"{proof_key}.proof.json"
        nivc = self.backend.startswith("supernova")
        if self.backend == "supernova-cycle":
            proof_json = (compressed_sn_cycle_to_json(self.proof)
                          if self.kind == "compressed"
                          else sn_cycle_proof_to_json(self.proof))
        elif self.backend == "nova":
            proof_json = (compressed_cycle_to_json(self.proof)
                          if self.kind == "compressed"
                          else cycle_proof_to_json(self.proof))
        elif self.kind == "compressed":
            proof_json = (compressed_nivc_to_json(self.proof) if nivc
                          else compressed_proof_to_json(self.proof))
        else:
            proof_json = (nivc_proof_to_json(self.proof) if nivc
                          else proof_to_json(self.proof))
        path.write_text(json.dumps({
            "backend": self.backend,
            "field": self.field,
            "rc": self.rc,
            "kind": self.kind,
            "proof": proof_json,
        }))
        return path

    @staticmethod
    def load(proof_key: str) -> Optional["LurkProof"]:
        path = proofs_dir() / f"{proof_key}.proof.json"
        if not path.exists():
            return None
        d = json.loads(path.read_text())
        nivc = d["backend"].startswith("supernova")
        kind = d.get("kind", "recursive")
        if d["backend"] == "supernova-cycle":
            proof = (compressed_sn_cycle_from_json(d["proof"])
                     if kind == "compressed"
                     else sn_cycle_proof_from_json(d["proof"]))
        elif d["backend"] == "nova":
            proof = (compressed_cycle_from_json(d["proof"])
                     if kind == "compressed"
                     else cycle_proof_from_json(d["proof"]))
        elif kind == "compressed":
            proof = (compressed_nivc_from_json(d["proof"]) if nivc
                     else compressed_proof_from_json(d["proof"]))
        else:
            proof = (nivc_proof_from_json(d["proof"]) if nivc
                     else proof_from_json(d["proof"]))
        return LurkProof(proof, d["rc"], d["field"], d["backend"], kind)

    @staticmethod
    def is_cached(proof_key: str) -> bool:
        return (proofs_dir() / f"{proof_key}.proof.json").exists()


@dataclasses.dataclass
class LurkProofMeta:
    """Iterations + IO ZPtrs + ZDag (lurk_proof.rs LurkProofMeta)."""

    iterations: int
    expr_io: Tuple[ZPtr, ZPtr]
    env_io: Tuple[ZPtr, ZPtr]
    cont_io: Tuple[ZPtr, ZPtr]
    z_dag: ZDag

    def persist(self, proof_key: str) -> Path:
        path = proofs_dir() / f"{proof_key}.meta.json"

        def z(x: ZPtr):
            return {"tag": x.tag, "digest": f"{x.digest:x}"}

        path.write_text(json.dumps({
            "iterations": self.iterations,
            "expr_io": [z(self.expr_io[0]), z(self.expr_io[1])],
            "env_io": [z(self.env_io[0]), z(self.env_io[1])],
            "cont_io": [z(self.cont_io[0]), z(self.cont_io[1])],
            "z_dag": self.z_dag.to_json(),
        }))
        return path

    @staticmethod
    def load(proof_key: str) -> Optional["LurkProofMeta"]:
        path = proofs_dir() / f"{proof_key}.meta.json"
        if not path.exists():
            return None
        d = json.loads(path.read_text())

        def z(x) -> ZPtr:
            return ZPtr(x["tag"], int(x["digest"], 16))

        return LurkProofMeta(
            d["iterations"],
            (z(d["expr_io"][0]), z(d["expr_io"][1])),
            (z(d["env_io"][0]), z(d["env_io"][1])),
            (z(d["cont_io"][0]), z(d["cont_io"][1])),
            ZDag.from_json(d["z_dag"]),
        )


@dataclasses.dataclass
class Commitment:
    """Persisted commitment opening (cli/commitment.rs parity)."""

    digest: int
    secret: int
    payload_z: ZPtr
    z_dag: ZDag

    @staticmethod
    def new(secret: int, payload, store: Store) -> "Commitment":
        z_dag = ZDag()
        zpay = z_dag.populate_with(payload, store)
        digest, _ = store.hide_and_return_z_payload(secret, payload)
        return Commitment(digest, secret, zpay, z_dag)

    def persist(self) -> Path:
        path = commits_dir() / f"{self.digest:064x}.json"
        path.write_text(json.dumps({
            "digest": f"{self.digest:x}",
            "secret": f"{self.secret:x}",
            "payload": {"tag": self.payload_z.tag,
                        "digest": f"{self.payload_z.digest:x}"},
            "z_dag": self.z_dag.to_json(),
        }))
        return path

    @staticmethod
    def load(digest: int, store: Store) -> bool:
        """Load a persisted commitment into the store; True on success."""
        path = commits_dir() / f"{digest:064x}.json"
        if not path.exists():
            return False
        d = json.loads(path.read_text())
        z_dag = ZDag.from_json(d["z_dag"])
        zpay = ZPtr(d["payload"]["tag"], int(d["payload"]["digest"], 16))
        payload = z_dag.populate_store(zpay, store)
        store.add_comm(int(d["digest"], 16), int(d["secret"], 16), payload)
        return True
