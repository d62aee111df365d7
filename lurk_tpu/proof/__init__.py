"""Proof layer: Nova-style folding over the LEM step circuit."""

from .multiframe import MultiFrame, io_scalars  # noqa: F401
from .nova import (  # noqa: F401
    CommitmentKey, FoldingProof, PublicParams, R1CSShape, RecursiveSNARK,
    check_relaxed, check_strict, verify,
)
from .prover import NovaProver, public_params  # noqa: F401
from .spartan import (  # noqa: F401
    CompressedProof, compress, verify_compressed,
)
