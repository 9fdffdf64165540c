"""Deterministic blank-node labeling (skolemization).

The reference allocates blank-node identity per *document scope* by hashing
``seed ‖ label`` (Jena: riot/lang/LabelToNode.java:48-56 document-hash
policy, BlankNodeAllocatorHash.java:82-132; the fixed-seed variant
BlankNodeAllocatorFixedSeedHash is the precedent for determinism).

We key the seed by ``(repo, path, commit)`` so that re-running any subset of
partitions reproduces identical labels — this makes the pipeline
shuffle-safe and checkpoint-resumable, and makes cross-run triple-set
comparison a plain string join.  The hash is SHA-256 (Python stdlib;
MurmurHash3-128 is not available without third-party deps and the exact
function does not matter for isomorphism-based P/R — only determinism and
collision resistance do).
"""

from __future__ import annotations

import hashlib
from typing import Dict


def doc_seed(repo: str, path: str, commit: str) -> bytes:
    return hashlib.sha256(
        b"\x00".join((repo.encode(), path.encode(), commit.encode()))
    ).digest()


class BNodeAllocator:
    """Per-document blank-node allocator.

    - ``get(label)``: stable id for a labeled bnode (``_:x``) within the doc.
    - ``fresh()``: new bnode for ``[]`` / collections; counter under the
      same seed (mirrors BlankNodeAllocatorHash.create()).
    """

    __slots__ = ("seed", "cache", "counter")

    def __init__(self, seed: bytes):
        self.seed = seed
        self.cache: Dict[str, str] = {}
        self.counter = 0

    def _hash(self, data: bytes) -> str:
        return hashlib.sha256(self.seed + b"\x01" + data).hexdigest()[:32]

    def get(self, label: str) -> str:
        b = self.cache.get(label)
        if b is None:
            b = "B" + self._hash(b"L" + label.encode())
            self.cache[label] = b
        return b

    def fresh(self) -> str:
        self.counter += 1
        return "B" + self._hash(b"F%d" % self.counter)
