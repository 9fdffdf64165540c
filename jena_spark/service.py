"""SERVICE executor registry — the local seam of Jena's federation.

The reference routes every ``SERVICE <iri> { … }`` through a
pluggable registry (sparql/service/ServiceExecutorRegistry.java): the
HTTP executor is just the DEFAULT entry, and programs register custom
executors that answer a service IRI locally.  This module is that seam
Spark-first: register a quads/triples DataFrame under an endpoint IRI
and SERVICE blocks against that IRI evaluate the inner pattern over it
(a distributed join, never a driver round-trip).  Actual HTTP
federation stays out of scope (no network in this engine); an
unregistered endpoint raises — or contributes the unit solution under
``SERVICE SILENT``, Jena's silent-failure semantics.

Scale note: federated-by-registry datasets are ordinary DataFrames, so
the SERVICE join is a plain shuffle/broadcast join between the outer
solutions and the inner pattern's solutions — co-locatable, prunable,
AQE-planned like any other join in the engine.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame

_REGISTRY: Dict[str, DataFrame] = {}


def register_service(endpoint_iri: str, dataset: DataFrame) -> None:
    """Answer ``SERVICE <endpoint_iri>`` with ``dataset`` (a triples or
    quads DataFrame in canonical encoding).  The IRI is matched exactly
    (no normalization), like the registry's per-IRI executors."""
    _REGISTRY[endpoint_iri] = dataset


def unregister_service(endpoint_iri: str) -> None:
    _REGISTRY.pop(endpoint_iri, None)


def lookup_service(endpoint_iri: str) -> Optional[DataFrame]:
    return _REGISTRY.get(endpoint_iri)
