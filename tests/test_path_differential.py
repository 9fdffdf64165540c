"""Differential property-path testing: random path expressions vs
DuckDB recursive-CTE mirrors.

The W3C property-path suite and the fixed oracles cover chosen shapes;
this sweep generates random nested path expressions — sequence,
alternative, inverse, `+`, `*`, `?` up to depth 3 — over random edge
sets and checks `?s <path> ?o` against a per-construct SQL mirror
(closures as recursive CTEs with UNION dedup, zero-length paths as
all-node self-pairs per SPARQL 1.1 §9.3).  Both sides are compared
DISTINCT (ALT/SEQ are bags in SPARQL; reachability is what the mirror
pins).
"""

import random

import duckdb
import pytest

PREDS = [f"<http://e/p{i}>" for i in range(3)]
NODES = [f"<http://e/n{i}>" for i in range(5)]


def _gen_store(rng):
    quads = set()
    for _ in range(rng.randint(6, 18)):
        quads.add((rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES)))
    return sorted(quads)


def _gen_path(rng, depth=0):
    kinds = ["link"] * 3 + (
        ["inv", "seq", "alt", "plus", "star", "opt"] if depth < 3 else []
    )
    k = rng.choice(kinds)
    if k == "link":
        return ("link", rng.choice(PREDS))
    if k == "inv":
        return ("inv", _gen_path(rng, depth + 1))
    if k in ("seq", "alt"):
        return (k, _gen_path(rng, depth + 1), _gen_path(rng, depth + 1))
    return (k, _gen_path(rng, depth + 1))


def _to_sparql(p):
    k = p[0]
    if k == "link":
        return p[1]
    if k == "inv":
        return f"(^{_to_sparql(p[1])})"
    if k == "seq":
        return f"({_to_sparql(p[1])}/{_to_sparql(p[2])})"
    if k == "alt":
        return f"({_to_sparql(p[1])}|{_to_sparql(p[2])})"
    mark = {"plus": "+", "star": "*", "opt": "?"}[k]
    return f"({_to_sparql(p[1])}){mark}"


class _Mirror:
    """Compile a path AST to DuckDB CTEs returning (src, dst) pairs."""

    def __init__(self):
        self.ctes = [
            "nodes AS (SELECT subj AS n FROM quads UNION SELECT obj FROM quads)"
        ]
        self.i = 0

    def fresh(self):
        self.i += 1
        return f"e{self.i}"

    def compile(self, p):
        k = p[0]
        name = self.fresh()
        if k == "link":
            lit = p[1].replace("'", "''")
            body = f"SELECT subj AS src, obj AS dst FROM quads WHERE pred = '{lit}'"
        elif k == "inv":
            a = self.compile(p[1])
            body = f"SELECT dst AS src, src AS dst FROM {a}"
        elif k == "seq":
            a, b = self.compile(p[1]), self.compile(p[2])
            body = (
                f"SELECT DISTINCT a.src, b.dst FROM {a} a "
                f"JOIN {b} b ON a.dst = b.src"
            )
        elif k == "alt":
            a, b = self.compile(p[1]), self.compile(p[2])
            body = f"SELECT src, dst FROM {a} UNION SELECT src, dst FROM {b}"
        elif k == "plus":
            a = self.compile(p[1])
            body = (
                f"SELECT src, dst FROM {a} UNION "
                f"SELECT {a}.src, c.dst FROM {a} JOIN {name} c "
                f"ON {a}.dst = c.src"
            )
        elif k == "star":
            a = self.compile(("plus", p[1]))
            body = (
                f"SELECT n AS src, n AS dst FROM nodes "
                f"UNION SELECT src, dst FROM {a}"
            )
        elif k == "opt":
            a = self.compile(p[1])
            body = (
                f"SELECT n AS src, n AS dst FROM nodes "
                f"UNION SELECT src, dst FROM {a}"
            )
        self.ctes.append(f"{name} AS ({body})")
        return name

    def sql(self, p):
        top = self.compile(p)
        return (
            "WITH RECURSIVE "
            + ", ".join(self.ctes)
            + f" SELECT DISTINCT src, dst FROM {top}"
        )


# --- round 6: negated property sets + ARQ {n}/{n,}/{n,m} quantifiers ------


def _gen_path_ext(rng, depth=0):
    """Like _gen_path but the grammar also draws NPS atoms and
    quantifier modifiers."""
    kinds = ["link"] * 2 + ["nps"] + (
        ["inv", "seq", "alt", "plus", "star", "opt", "mod"] if depth < 2 else []
    )
    k = rng.choice(kinds)
    if k == "link":
        return ("link", rng.choice(PREDS))
    if k == "nps":
        fwd = tuple(rng.sample(PREDS, rng.randint(0, 2)))
        inv = tuple(rng.sample(PREDS, rng.randint(0, 2)))
        if not fwd and not inv:
            fwd = (rng.choice(PREDS),)
        return ("nps", fwd, inv)
    if k == "mod":
        n = rng.randint(0, 2)
        m = rng.choice([n, n + 1, n + 2, None])  # None = unbounded {n,}
        # quantify an atom (link / nps / inverse-link) — mirrors how the
        # syntax attaches {n,m} to a path primary
        sub = _gen_path_ext(rng, 3)
        return ("mod", sub, n, m)
    if k == "inv":
        return ("inv", _gen_path_ext(rng, depth + 1))
    if k in ("seq", "alt"):
        return (k, _gen_path_ext(rng, depth + 1), _gen_path_ext(rng, depth + 1))
    return (k, _gen_path_ext(rng, depth + 1))


def _to_sparql_ext(p):
    k = p[0]
    if k == "nps":
        members = list(p[1]) + [f"^{i}" for i in p[2]]
        return "!(" + "|".join(members) + ")"
    if k == "mod":
        body = _to_sparql_ext(p[1])
        n, m = p[2], p[3]
        if m is None:
            return f"({body}){{{n},}}"
        if m == n:
            return f"({body}){{{n}}}"
        return f"({body}){{{n},{m}}}"
    if k == "link":
        return p[1]
    if k == "inv":
        return f"(^{_to_sparql_ext(p[1])})"
    if k == "seq":
        return f"({_to_sparql_ext(p[1])}/{_to_sparql_ext(p[2])})"
    if k == "alt":
        return f"({_to_sparql_ext(p[1])}|{_to_sparql_ext(p[2])})"
    mark = {"plus": "+", "star": "*", "opt": "?"}[k]
    return f"({_to_sparql_ext(p[1])}){mark}"


class _MirrorExt(_Mirror):
    def compile(self, p):
        k = p[0]
        if k == "nps":
            # §9.1 translation: !(F|^R) = NPS(F) ∪ inv(NPS(R)) — each
            # part present iff its member list is, each part excludes
            # ONLY its own members
            name = self.fresh()
            parts = []
            if p[1]:
                lst = ", ".join("'" + f.replace("'", "''") + "'" for f in p[1])
                parts.append(
                    f"SELECT subj AS src, obj AS dst FROM quads "
                    f"WHERE pred NOT IN ({lst})"
                )
            if p[2]:
                lst = ", ".join("'" + f.replace("'", "''") + "'" for f in p[2])
                parts.append(
                    f"SELECT obj AS src, subj AS dst FROM quads "
                    f"WHERE pred NOT IN ({lst})"
                )
            self.ctes.append(f"{name} AS ({' UNION '.join(parts)})")
            return name
        if k == "mod":
            a = self.compile(p[1])
            n, m = p[2], p[3]

            def kfold(kk):
                if kk == 0:
                    z = self.fresh()
                    self.ctes.append(
                        f"{z} AS (SELECT n AS src, n AS dst FROM nodes)"
                    )
                    return z
                cur = a
                for _ in range(kk - 1):
                    nxt = self.fresh()
                    self.ctes.append(
                        f"{nxt} AS (SELECT DISTINCT l.src, r.dst FROM {cur} l "
                        f"JOIN {a} r ON l.dst = r.src)"
                    )
                    cur = nxt
                return cur

            name = self.fresh()
            if m is None:
                # {n,} = n-fold ∘ star  (n=0 → star alone)
                star = self.compile(("star", p[1]))
                base = kfold(n)
                self.ctes.append(
                    f"{name} AS (SELECT DISTINCT l.src, r.dst FROM {base} l "
                    f"JOIN {star} r ON l.dst = r.src)"
                )
            else:
                parts = [kfold(kk) for kk in range(n, m + 1)]
                body = " UNION ".join(
                    f"SELECT src, dst FROM {pn}" for pn in parts
                )
                self.ctes.append(f"{name} AS ({body})")
            return name
        return super().compile(p)


@pytest.mark.slow  # ~2 min
def test_random_nps_and_quantifier_paths_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(73)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(20):
            rows = _gen_store(rng)
            path = _gen_path_ext(rng)
            # ensure the interesting constructs actually appear
            if not any(tag in str(path) for tag in ("nps", "mod")):
                path = ("seq", path, _gen_path_ext(rng, 3))
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            want = sorted(
                tuple(r) for r in con.execute(_MirrorExt().sql(path)).fetchall()
            )
            con.close()

            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            q = f"SELECT DISTINCT ?s ?o WHERE {{ ?s {_to_sparql_ext(path)} ?o }} "
            got = sorted(
                (r["s"], r["o"]) for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, rows[:6], got[:6], want[:6])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


GRAPHS = ["<http://e/g1>", "<http://e/g2>", "<http://e/g3>"]


@pytest.mark.slow  # ~2 min
def test_random_paths_under_graph_match_duckdb(spark):
    """``GRAPH ?g { ?s <path> ?o }`` — the path (including transitive
    closures) evaluates WITHIN one named graph at a time, never across
    graphs, with ?g bound (reference: PathLib.execTriplePath under
    OpGraph).  Mirror: the recursive-CTE mirror run per named graph
    over only that graph's triples, unioned.  Cross-graph edges that
    would join up a longer path are the bug this hunts."""
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(103)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(15):
            quads = set()
            for _ in range(rng.randint(8, 24)):
                quads.add(
                    (
                        rng.choice(GRAPHS + [None]),
                        rng.choice(NODES),
                        rng.choice(PREDS),
                        rng.choice(NODES),
                    )
                )
            rows = sorted(quads, key=lambda q: (q[0] or "", q[1], q[2], q[3]))
            path = _gen_path(rng)

            con = duckdb.connect()
            con.execute(
                "CREATE TABLE allq "
                "(graph VARCHAR, subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO allq VALUES (?, ?, ?, ?)", rows)
            want = []
            for g in GRAPHS:
                con.execute("DROP TABLE IF EXISTS quads")
                con.execute(
                    "CREATE TABLE quads AS SELECT subj, pred, obj "
                    "FROM allq WHERE graph = ?",
                    [g],
                )
                want.extend(
                    (g,) + tuple(r)
                    for r in con.execute(_Mirror().sql(path)).fetchall()
                )
            want.sort()
            con.close()

            qdf = spark.createDataFrame(rows, ["graph", "subj", "pred", "obj"])
            q = (
                "SELECT DISTINCT ?g ?s ?o WHERE { GRAPH ?g { "
                f"?s {_to_sparql(path)} ?o }} }}"
            )
            got = sorted(
                (r["g"], r["s"], r["o"])
                for r in sparql_select(qdf, q).collect()
            )
            assert got == want, (trial, q, rows[:6], got[:6], want[:6])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


@pytest.mark.slow  # each query pays full compile+collect
def test_random_paths_match_duckdb(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(31)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(25):
            rows = _gen_store(rng)
            path = _gen_path(rng)
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            want = sorted(tuple(r) for r in con.execute(_Mirror().sql(path)).fetchall())
            con.close()

            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])
            q = f"SELECT DISTINCT ?s ?o WHERE {{ ?s {_to_sparql(path)} ?o }} "
            got = sorted(
                (r["s"], r["o"]) for r in sparql_select(tri, q).collect()
            )
            assert got == want, (trial, q, rows[:6], got[:6], want[:6])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
