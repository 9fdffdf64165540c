"""RDF Patch — text-syntax reader, applier, and store differ.

Re-expresses the reference's change-stream machinery Spark-first
(jena-rdfpatch: org/apache/jena/rdfpatch/RDFPatch.java, RDFChanges.java,
text/RDFPatchReaderText.java, RDF2Patch.java):

- opcodes ``H`` (header), ``TX``/``TC``/``TA`` (transaction begin /
  commit / abort), ``PA``/``PD`` (prefix add/delete), ``A``/``D``
  (add / delete quad), each line '.'-terminated, terms in N-Triples
  syntax with an optional 4th graph term;
- a patch parses into committed transactions of ordered ops; an aborted
  transaction (TA) contributes nothing (RDFPatchReaderText txnAbort);
- ``apply_patch`` folds the ops into a quads DataFrame using the same
  delta-shaped set operations as SPARQL Update (ops/update.py): runs of
  consecutive A's become ONE anti-join+union, runs of D's ONE anti-join
  — the store is never re-shuffled, so replaying a long change log over
  a 100 TB store stays delta-sized per transaction;
- ``diff_patch`` is the RDF2Patch analog: two stores → the patch text
  that turns one into the other (adds/deletes via two anti-joins).

Blank-node labels in a patch are concrete node identities (the
reference treats them as fixed terms, not document-scoped labels) and
pass through verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame

from .parsers.tokenizer import (
    T_BNODE, T_DOT, T_EOF, T_HATHAT, T_IRI, T_KEYWORD, T_LANGTAG, T_STRING,
    Tokenizer,
)
from .terms import RDFSyntaxError, mk_iri, mk_literal

Quad = Tuple[Optional[str], str, str, str]


class PatchException(RDFSyntaxError):
    """Malformed patch text (reference: rdfpatch PatchException)."""


@dataclass
class PatchLog:
    headers: Dict[str, str] = field(default_factory=dict)
    prefixes: Dict[str, str] = field(default_factory=dict)  # final state
    # committed transactions: each a list of ("A"|"D", quad)
    txns: List[List[Tuple[str, Quad]]] = field(default_factory=list)

    @property
    def ops(self) -> List[Tuple[str, Quad]]:
        return [op for txn in self.txns for op in txn]


def _next_term(tz: Tokenizer, tok) -> Tuple[str, object]:
    """One N-Triples term starting at tok → (encoded term, next token)."""
    if tok.type == T_IRI:
        return mk_iri(tok.value).nt(), tz.next_token()
    if tok.type == T_BNODE:
        return "_:" + tok.value, tz.next_token()
    if tok.type == T_STRING:
        nxt = tz.next_token()
        if nxt.type == T_LANGTAG:
            return mk_literal(tok.value, lang=nxt.value).nt(), tz.next_token()
        if nxt.type == T_HATHAT:
            dt = tz.next_token()
            if dt.type != T_IRI:
                raise PatchException("datatype must be an IRI")
            return (
                mk_literal(tok.value, datatype=mk_iri(dt.value).lex).nt(),
                tz.next_token(),
            )
        return mk_literal(tok.value).nt(), nxt
    raise PatchException(
        f"line {tok.line}: bad term token {tok.type} {tok.value!r}"
    )


def parse_patch(text: str) -> PatchLog:
    """Parse RDF Patch text → committed transactions (text/
    RDFPatchReaderText.java doOneLine, one record per '.')."""
    tz = Tokenizer(text)
    log = PatchLog()
    cur: Optional[List[Tuple[str, Quad]]] = None  # open txn, None = outside
    implicit: List[Tuple[str, Quad]] = []  # records outside TX..TC

    tok = tz.next_token()
    while tok.type != T_EOF:
        if tok.type != T_KEYWORD:
            raise PatchException(
                f"line {tok.line}: expected keyword at start of patch "
                f"record, got {tok.type} {tok.value!r}"
            )
        code = tok.value
        tok = tz.next_token()
        if code == "H":
            if tok.type != T_KEYWORD:
                raise PatchException(f"line {tok.line}: bad header field")
            fieldname = tok.value
            term, tok = _next_term(tz, tz.next_token())
            log.headers[fieldname] = term
        elif code == "TX":
            if cur is not None:
                raise PatchException("nested TX")
            cur = []
        elif code == "TC":
            if cur is None:
                raise PatchException("TC without TX")
            log.txns.append(cur)
            cur = None
        elif code == "TA":
            if cur is None:
                raise PatchException("TA without TX")
            cur = None  # aborted: discard
        elif code in ("PA", "PD"):
            if tok.type != T_STRING:
                raise PatchException(f"line {tok.line}: {code} needs a prefix string")
            pfx = tok.value
            tok = tz.next_token()
            if code == "PA":
                if tok.type != T_IRI:
                    raise PatchException(f"line {tok.line}: PA needs an IRI")
                log.prefixes[pfx] = tok.value
                tok = tz.next_token()
            else:
                log.prefixes.pop(pfx, None)
        elif code in ("A", "D"):
            s, tok = _next_term(tz, tok)
            p, tok = _next_term(tz, tok)
            o, tok = _next_term(tz, tok)
            g: Optional[str] = None
            if tok.type != T_DOT:
                g, tok = _next_term(tz, tok)
            (cur if cur is not None else implicit).append((code, (g, s, p, o)))
        else:
            raise PatchException(f"line {tok.line}: unknown patch code {code!r}")
        if tok.type != T_DOT:
            raise PatchException(f"line {tok.line}: expected '.' ending a record")
        tok = tz.next_token()
    if cur is not None:
        raise PatchException("patch ends inside a transaction (no TC/TA)")
    if implicit:
        # records outside any TX apply as one implicit transaction
        log.txns.append(implicit)
    return log


def parse_patch_binary(data) -> PatchLog:
    """Parse a binary (thrift RDF_Patch_Row stream) patch → PatchLog.
    Same transaction semantics as the text reader: TA discards the open
    transaction, records outside TX..TC form one implicit transaction,
    Segment rows are markers and ignored (the reference's binary patch
    reader dispatches the same visitor as the text one)."""
    from .parsers.binrdf import read_patch_rows_thrift

    log = PatchLog()
    cur: Optional[List[Tuple[str, Quad]]] = None
    implicit: List[Tuple[str, Quad]] = []
    for row in read_patch_rows_thrift(data):
        code = row[0]
        if code == "H":
            log.headers[row[1]] = row[2]
        elif code == "TX":
            if cur is not None:
                raise PatchException("nested TX")
            cur = []
        elif code == "TC":
            if cur is None:
                raise PatchException("TC without TX")
            log.txns.append(cur)
            cur = None
        elif code == "TA":
            if cur is None:
                raise PatchException("TA without TX")
            cur = None
        elif code == "Segment":
            pass
        elif code == "PA":
            # binary prefixes carry the IRI as a plain string
            log.prefixes[row[2]] = row[3]
        elif code == "PD":
            log.prefixes.pop(row[2], None)
        else:  # A / D
            (cur if cur is not None else implicit).append(
                (code, (row[1], row[2], row[3], row[4]))
            )
    if cur is not None:
        raise PatchException("binary patch ends inside a transaction")
    if implicit:
        log.txns.append(implicit)
    return log


def patch_to_binary(patch: "str | PatchLog") -> bytes:
    """Serialize a PatchLog as a binary thrift RDF_Patch_Row stream
    (headers, prefix adds, then each transaction as TX..rows..TC)."""
    from .parsers.binrdf import write_patch_rows_thrift

    if isinstance(patch, str):
        patch = parse_patch(patch)
    rows: List[tuple] = []
    for name, value in patch.headers.items():
        rows.append(("H", name, value))
    for pfx, iri in patch.prefixes.items():
        rows.append(("PA", None, pfx, iri))
    for txn in patch.txns:
        rows.append(("TX",))
        for code, (g, s, p, o) in txn:
            rows.append((code, g, s, p, o))
        rows.append(("TC",))
    return write_patch_rows_thrift(rows)


def apply_patch(
    store: DataFrame, patch: "str | PatchLog", assume_distinct: bool = False
) -> DataFrame:
    """Apply a patch to a quads DataFrame → the new store.

    Scale shape: consecutive same-code records coalesce into one delta
    DataFrame; adds go through the broadcast semi/anti insert and
    deletes through the delta anti-join (ops/update.py) — zero
    full-store shuffles, like SPARQL Update."""
    from pyspark.sql import functions as F

    from .ops.update import _minus, _quads_to_df, _union

    if isinstance(patch, str):
        patch = parse_patch(patch)
    if "graph" not in store.columns:
        store = store.select(
            F.lit(None).cast("string").alias("graph"), "subj", "pred", "obj"
        )
    else:
        store = store.select("graph", "subj", "pred", "obj")
    if not assume_distinct:
        store = store.dropDuplicates()
    spark = store.sparkSession
    for txn in patch.txns:
        runs: List[Tuple[str, List[Quad]]] = []
        for code, quad in txn:
            if runs and runs[-1][0] == code:
                runs[-1][1].append(quad)
            else:
                runs.append((code, [quad]))
        for code, quads in runs:
            quads = list(dict.fromkeys(quads))
            delta = _quads_to_df(spark, quads)
            if code == "A":
                store = _union(store, delta, known_small=True, pre_deduped=True)
            else:
                store = _minus(store, delta)
        store = store.localCheckpoint(eager=True)  # txn boundary: pin state
    return store


def diff_patch(old: DataFrame, new: DataFrame) -> str:
    """RDF2Patch analog: the patch text that turns ``old`` into ``new``
    (deletes then adds, one transaction).  Both inputs are quads or
    triples DataFrames; comparison is exact-term (stores are canonical).
    Collects the DIFF only — at scale the diff of two corpus versions is
    delta-sized while the stores never leave the cluster."""
    from pyspark.sql import functions as F

    def norm(df):
        if "graph" not in df.columns:
            df = df.select(
                F.lit(None).cast("string").alias("graph"),
                "subj", "pred", "obj",
            )
        return df.select("graph", "subj", "pred", "obj").dropDuplicates()

    def _anti(left: DataFrame, right: DataFrame) -> DataFrame:
        # rename the probe side so the condition never resolves both
        # sides to one attribute (old and new usually share lineage);
        # graph is nullable → null-safe equality
        r = right.select(
            F.col("graph").alias("__g"), F.col("subj").alias("__s"),
            F.col("pred").alias("__p"), F.col("obj").alias("__o"),
        )
        cond = (
            left["graph"].eqNullSafe(r["__g"])
            & (left["subj"] == r["__s"])
            & (left["pred"] == r["__p"])
            & (left["obj"] == r["__o"])
        )
        return left.join(r, cond, "left_anti")

    o, n = norm(old), norm(new)
    # `new` is often derived from `old` (an updated store): pin it so the
    # anti-joins below are not ambiguous self-joins
    n = n.localCheckpoint(eager=True)
    dels = _anti(o, n)
    adds = _anti(n, o)
    lines = ["TX ."]
    for code, df in (("D", dels), ("A", adds)):
        rows = [tuple(x) for x in df.collect()]
        for g, s, p, obj in sorted(
            rows, key=lambda t: tuple("" if x is None else x for x in t)
        ):
            gpart = f" {g}" if g is not None else ""
            lines.append(f"{code} {s} {p} {obj}{gpart} .")
    lines.append("TC .")
    return "\n".join(lines) + "\n"
