"""Differential aggregate testing: random GROUP BY queries vs a
DuckDB-join + independent-Python-§18.5 mirror.

The W3C aggregates suite runs fixed queries; this sweep generates random
(BGP, GROUP BY, aggregate-set, HAVING) combinations and checks the
engine against an independently-derived expectation.  DuckDB executes
the mechanical pattern-by-pattern join mirror (the same one
test_bgp_differential.py validates), and plain Python applies SPARQL
§18.5 aggregate semantics on top — the part a naive SQL mirror gets
wrong:

- a bound non-numeric value in a group makes SUM/AVG an evaluation
  error → unbound for that group (SQL would silently skip or coerce);
- the empty implicit group yields ONE row with COUNT=0, SUM=0, AVG=0,
  GROUP_CONCAT="" and MIN/MAX/SAMPLE unbound (SQL returns NULL sums);
- COUNT/SUM DISTINCT are distinct by TERM, not by value;
- GROUP_CONCAT applies str() to its inputs and its concatenation order
  is implementation-defined (compared as a multiset of parts).

MIN/MAX: on homogeneous groups (all-numeric / all-plain-string /
all-IRI) the §18.5+§15.1 result is checked exactly; on mixed-category
groups only the spec-defined part is pinned (numerics order before
non-numerics — W3C agg-min-02 semantics — and the result must be a
member of the group), because the cross-category tie-break is
implementation-defined and mirroring the engine's own key would test
nothing.

Reference: jena-arq sparql/expr/aggregate/Agg{Sum,Avg,Min,Max}*.java,
AccumulatorExpr error handling.
"""

import random
from fractions import Fraction

import duckdb
import pytest

X = "http://www.w3.org/2001/XMLSchema#"
SUBJECTS = [f"<http://e/s{i}>" for i in range(5)]
PREDICATES = [f"<http://e/p{i}>" for i in range(3)]
STR_OBJS = ['"a"', '"b"', '"zz"', '"m n"']
IRI_OBJS = ["<http://e/o1>", "<http://e/o2>"]


def _int_term(n):
    return f'"{n}"^^<{X}integer>'


INT_OBJS = [_int_term(n) for n in (-9, -1, 0, 2, 3, 7, 42)]
OBJS = INT_OBJS + STR_OBJS + IRI_OBJS


def _gen_store(rng, ints_only=False):
    # ints_only stores keep SUM/AVG un-poisoned so the exact numeric
    # path gets coverage (mixed stores poison ~90% of groups)
    objs = INT_OBJS if ints_only else OBJS
    triples = set()
    for _ in range(rng.randint(15, 60)):
        triples.add(
            (rng.choice(SUBJECTS), rng.choice(PREDICATES), rng.choice(objs))
        )
    return sorted(triples)


def _parse(term):
    """term string → (category, value)."""
    if term is None:
        return ("null", None)
    if term.startswith("<"):
        return ("iri", term)
    if term.endswith(f'"^^<{X}integer>'[1:]):  # '"N"^^<...integer>'
        return ("num", int(term[1 : term.index('"', 1)]))
    return ("str", term[1:-1])  # simple literal


def _str_value(term):
    """SPARQL str() of a term, as GROUP_CONCAT applies it."""
    cat, v = _parse(term)
    if cat == "iri":
        return term[1:-1]
    return term[1 : term.rindex('"')]


def _expected_aggs(terms):
    """§18.5 aggregate results over one group's multiset of ?v terms."""
    parsed = [_parse(t) for t in terms]
    cats = {c for c, _ in parsed}
    nums = [v for c, v in parsed if c == "num"]
    poisoned = bool(cats - {"num"})
    distinct = sorted(set(terms))
    d_parsed = [_parse(t) for t in distinct]
    d_nums = [v for c, v in d_parsed if c == "num"]
    out = {
        "n_all": len(terms),
        "n_v": len(terms),
        "n_dist": len(distinct),
        "sum": None if poisoned else sum(nums),
        "sum_d": None if poisoned else sum(d_nums),
        "avg": None
        if poisoned
        else (0 if not nums else Fraction(sum(nums), len(nums))),
        "gc_parts": sorted(_str_value(t) for t in terms),
        "members": set(terms),
    }
    # MIN/MAX — exact on homogeneous groups
    if cats == {"num"}:
        lo, hi = min(nums), max(nums)
        out["min"] = _int_term(lo)
        out["max"] = _int_term(hi)
    elif len(cats) == 1:  # all-str or all-iri: codepoint order on content
        vals = sorted((v, t) for (c, v), t in zip(parsed, terms))
        out["min"], out["max"] = vals[0][1], vals[-1][1]
    else:
        out["min"] = out["max"] = "MIXED"
        out["min_numeric"] = _int_term(min(nums)) if nums else None
    return out


def _mirror_bindings(con, pats, group_var, agg_var):
    """DuckDB executes the pattern-by-pattern join; returns
    {group_key_term_or_(): [v terms]} (group_var None = implicit group)."""
    first = {}
    conds = []
    for i, pat in enumerate(pats):
        for col, term in zip(("subj", "pred", "obj"), pat):
            ref = f"t{i}.{col}"
            if term.startswith("?"):
                if term in first:
                    conds.append(f"{ref} = {first[term]}")
                else:
                    first[term] = ref
            else:
                conds.append(f"{ref} = '" + term.replace("'", "''") + "'")
    sel = [first[agg_var] + " AS v"]
    if group_var is not None:
        sel.append(first[group_var] + " AS g")
    frm = ", ".join(f"quads t{i}" for i in range(len(pats)))
    where = " AND ".join(conds) if conds else "1=1"
    rows = con.execute(
        f"SELECT {', '.join(sel)} FROM {frm} WHERE {where}"
    ).fetchall()
    groups = {}
    for row in rows:
        key = row[1] if group_var is not None else ()
        groups.setdefault(key, []).append(row[0])
    if group_var is None and not groups:
        groups[()] = []  # the implicit group exists even when empty
    return groups


AGG_SELECT = (
    "(COUNT(*) AS ?n_all) (COUNT(?v) AS ?n_v) "
    "(COUNT(DISTINCT ?v) AS ?n_dist) (SUM(?v) AS ?sum) "
    "(SUM(DISTINCT ?v) AS ?sum_d) (AVG(?v) AS ?avg) "
    "(MIN(?v) AS ?mn) (MAX(?v) AS ?mx) (SAMPLE(?v) AS ?sp) "
    '(GROUP_CONCAT(?v; SEPARATOR="|") AS ?gc)'
)


def _check_group(exp, row, ctx):
    assert row["n_all"] == exp["n_all"], (ctx, "count*")
    assert row["n_v"] == exp["n_v"], (ctx, "count v")
    assert row["n_dist"] == exp["n_dist"], (ctx, "count distinct")
    for k, col in (("sum", "sum"), ("sum_d", "sum_d")):
        if exp[k] is None:
            assert row[col] is None, (ctx, k, row[col])
        else:
            assert row[col] is not None and float(row[col]) == float(exp[k]), (
                ctx, k, row[col], exp[k])
    if exp["avg"] is None:
        assert row["avg"] is None, (ctx, "avg", row["avg"])
    else:
        assert row["avg"] is not None
        assert abs(float(row["avg"]) - float(exp["avg"])) < 1e-9, (
            ctx, "avg", row["avg"], exp["avg"])
    if exp["n_all"] == 0:
        assert row["mn"] is None and row["mx"] is None and row["sp"] is None
        assert row["gc"] == '""', (ctx, "gc empty", row["gc"])
        return
    if exp["min"] == "MIXED":
        assert row["mn"] in exp["members"] and row["mx"] in exp["members"], (
            ctx, "minmax membership")
        if exp["min_numeric"] is not None:
            # numerics order before non-numerics (W3C agg-min-02)
            assert row["mn"] == exp["min_numeric"], (ctx, "mixed min", row["mn"])
    else:
        assert row["mn"] == exp["min"], (ctx, "min", row["mn"], exp["min"])
        assert row["mx"] == exp["max"], (ctx, "max", row["mx"], exp["max"])
    assert row["sp"] in exp["members"], (ctx, "sample membership")
    assert row["gc"].startswith('"') and row["gc"].endswith('"'), (ctx, "gc")
    got_parts = sorted(row["gc"][1:-1].split("|"))
    assert got_parts == exp["gc_parts"], (ctx, "gc", got_parts, exp["gc_parts"])


@pytest.mark.slow  # ~3 min: each trial pays a full compile+collect
def test_random_group_aggregates_match_mirror(spark):
    from jena_spark.ops.sparql import sparql_select

    rng = random.Random(31)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try:
        for trial in range(22):
            rows = _gen_store(rng, ints_only=trial % 3 == 2)
            con = duckdb.connect()
            con.execute(
                "CREATE TABLE quads (subj VARCHAR, pred VARCHAR, obj VARCHAR)"
            )
            con.executemany("INSERT INTO quads VALUES (?, ?, ?)", rows)
            tri = spark.createDataFrame(rows, ["subj", "pred", "obj"])

            # pattern: (?s p ?v) [+ a second pattern sharing ?s for join
            # multiplicities]; aggregate over ?v, group by ?s / ?w / none
            p_main = rng.choice(PREDICATES)
            pats = [("?s", p_main, "?v")]
            shape = rng.randrange(3)
            if shape == 1:
                pats.append(("?s", rng.choice(PREDICATES), "?w"))
            elif shape == 2:
                pats.append(("?s", "?q", "?w"))
            grouped = rng.random() < 0.75
            group_var = None
            if grouped:
                cands = ["?s"] + (["?w"] if shape else [])
                group_var = rng.choice(cands)
            having = grouped and rng.random() < 0.4

            exp_groups = {
                k: _expected_aggs(v)
                for k, v in _mirror_bindings(con, pats, group_var, "?v").items()
            }
            con.close()
            if having:
                exp_groups = {
                    k: e for k, e in exp_groups.items() if e["n_all"] >= 2
                }

            q = (
                "SELECT "
                + (group_var + " " if group_var else "")
                + AGG_SELECT
                + " WHERE { "
                + " . ".join(" ".join(p) for p in pats)
                + " }"
                + (f" GROUP BY {group_var}" if group_var else "")
                + (" HAVING (COUNT(*) >= 2)" if having else "")
            )
            got = sparql_select(tri, q).collect()
            ctx = (trial, q)
            if group_var:
                by_key = {r[group_var[1:]]: r for r in got}
                assert set(by_key) == set(exp_groups), (
                    ctx, sorted(by_key), sorted(exp_groups))
                for k, exp in exp_groups.items():
                    _check_group(exp, by_key[k], ctx + (k,))
            else:
                assert len(got) == 1, ctx
                _check_group(exp_groups[()], got[0], ctx)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def test_empty_match_implicit_group(spark):
    """Zero solutions, no GROUP BY: one row, COUNT=0, SUM=0, AVG=0,
    GROUP_CONCAT="" and MIN/MAX/SAMPLE unbound (§18.5.1.2/.5/.6/.7)."""
    from jena_spark.ops.sparql import sparql_select

    tri = spark.createDataFrame(
        [("<http://e/s>", "<http://e/p>", '"x"')], ["subj", "pred", "obj"]
    )
    q = "SELECT " + AGG_SELECT + " WHERE { ?s <http://e/nope> ?v }"
    got = sparql_select(tri, q).collect()
    assert len(got) == 1
    _check_group(_expected_aggs([]), got[0], ("empty",))
