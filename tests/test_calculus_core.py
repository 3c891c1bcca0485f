"""1:1 ports of the reference's core unit tests
(core/src/test/java/org/conceptoriented/bistro/core/Tests.java) to the
PySpark calculus: calc, link (incl. miss→null), project, accu (incl. empty
group → default), roll (rows + range frames), prod+where, range binning.

Fixtures follow FIXTURES.md F2 — tiny literal tables, hand-computed expected
values, exactly as the reference asserts via getValue(id).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bistro_spark import Schema


def _by(rows, key):
    return {r[key]: r for r in (x.asDict() for x in rows)}


# ---------------------------------------------------------------- calc ----


def test_calc_column(spark):
    """Tests.java calc case: T(a,b); c = a + b (per-row)."""
    s = Schema(spark)
    t = s.table(
        "T",
        spark.createDataFrame(
            [(1, 1.0, 10.0), (2, 2.0, 20.0), (3, 3.0, 30.0), (4, 4.0, 40.0)],
            "id long, a double, b double",
        ),
    )
    t.calc("c", "a + b")
    got = _by(t.df().collect(), "id")
    assert [got[i]["c"] for i in (1, 2, 3, 4)] == [11.0, 22.0, 33.0, 44.0]


def test_calc_pandas_udf(spark):
    """calc with an arbitrary vectorized lambda (the reference's Evaluator
    lambda, Arrow path instead of per-row Java)."""
    s = Schema(spark)
    t = s.table(
        "T",
        spark.createDataFrame([(1, 2.0), (2, 5.0)], "id long, a double"),
    )
    t.calc_pandas("sq", lambda a: a * a, ["a"], "double")
    got = _by(t.df().collect(), "id")
    assert got[1]["sq"] == 4.0 and got[2]["sq"] == 25.0


# ---------------------------------------------------------------- link ----


@pytest.fixture()
def groups_facts(spark):
    s = Schema(spark)
    groups = s.table(
        "GROUPS",
        spark.createDataFrame(
            [("g1", 10.0), ("g2", 20.0), ("g3", 30.0)], "name string, v double"
        ),
        key=["name"],
    )
    facts = s.table(
        "FACTS",
        spark.createDataFrame(
            [
                (1, "g1", 1.0),
                (2, "g1", 2.0),
                (3, "g2", 3.0),
                (4, "g2", 4.0),
                (5, "g2", 5.0),
                (6, "gX", 6.0),  # unmatched group: link miss -> null
            ],
            "fid long, grp string, measure double",
        ),
    )
    return s, groups, facts


def test_link_column(spark, groups_facts):
    """Tests.java link case: facts.group -> GROUPS by name; miss -> null."""
    s, groups, facts = groups_facts
    facts.link("group", groups, on={"grp": "name"})
    got = _by(facts.df().collect(), "fid")
    assert got[1]["group"] == "g1"
    assert got[5]["group"] == "g2"
    assert got[6]["group"] is None  # unresolved link (reference: null id)


def test_link_path_hop(spark, groups_facts):
    """ColumnPath hop facts.group.v (ColumnPath.java#getValue)."""
    s, groups, facts = groups_facts
    facts.link("group", groups, on={"grp": "name"}).bring("group", "v")
    facts.calc("scaled", "measure * group__v")
    got = _by(facts.df().collect(), "fid")
    assert got[1]["scaled"] == 10.0  # 1.0 * g1.v(10)
    assert got[3]["scaled"] == 60.0  # 3.0 * g2.v(20)
    assert got[6]["scaled"] is None


# ------------------------------------------------------------- project ----


def test_project_column(spark):
    """Tests.java project case: target populated with distinct keys, link
    never misses (ColumnDefinitionProj.java)."""
    s = Schema(spark)
    facts = s.table(
        "FACTS",
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "a"), (4, "c")], "fid long, k string"
        ),
    )
    facts.project("dim", "DIM", keys={"k": "k"})
    dim_rows = sorted(r["k"] for r in s.table("DIM").df().collect())
    assert dim_rows == ["a", "b", "c"]
    got = _by(facts.df().collect(), "fid")
    assert [got[i]["dim"] for i in (1, 2, 3, 4)] == ["a", "b", "a", "c"]


# ---------------------------------------------------------------- accu ----


def test_accu_column(spark, groups_facts):
    """Tests.java accu case: sum(measure) per group; g3 has no facts ->
    default (0.0); facts with unresolved link do not contribute."""
    s, groups, facts = groups_facts
    facts.link("group", groups, on={"grp": "name"})
    groups.accu("total", facts, "group", "sum(measure)", default=0.0)
    got = _by(groups.df().collect(), "name")
    assert got["g1"]["total"] == 3.0
    assert got["g2"]["total"] == 12.0
    assert got["g3"]["total"] == 0.0  # empty group -> initial/default value


def test_accu_count(spark, groups_facts):
    s, groups, facts = groups_facts
    facts.link("group", groups, on={"grp": "name"})
    groups.accu("n", facts, "group", "count(*)", default=0)
    got = _by(groups.df().collect(), "name")
    assert (got["g1"]["n"], got["g2"]["n"], got["g3"]["n"]) == (2, 3, 0)


# ---------------------------------------------------------------- roll ----


def test_roll_rows_window(spark):
    """Tests.java roll case: moving sum over rowsBetween(-2, 0) in id order
    (count-based window, sizePast=2, sizeFuture=0)."""
    s = Schema(spark)
    t = s.table(
        "T",
        spark.createDataFrame(
            [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0)], "id long, a double"
        ),
    )
    t.roll("msum", "sum(a)", order_by="id", size_past=2, size_future=0)
    got = _by(t.df().collect(), "id")
    assert [got[i]["msum"] for i in (1, 2, 3, 4, 5)] == [1.0, 3.0, 6.0, 9.0, 12.0]


def test_roll_range_window(spark):
    """roll distance-based variant: rangeBetween over a numeric distance
    column (ColumnDefinitionRoll distance path)."""
    s = Schema(spark)
    t = s.table(
        "T",
        spark.createDataFrame(
            [(0, 1.0), (10, 2.0), (15, 3.0), (40, 4.0)], "ts long, a double"
        ),
    )
    t.roll("rsum", "sum(a)", order_by="ts", size_past=10, size_future=0, mode="range")
    got = _by(t.df().collect(), "ts")
    assert got[0]["rsum"] == 1.0
    assert got[10]["rsum"] == 3.0  # rows at ts 0,10
    assert got[15]["rsum"] == 5.0  # rows at ts 10,15 (0 outside [5,15])
    assert got[40]["rsum"] == 4.0


# -------------------------------------------------------- prod + where ----


def test_prod_where(spark):
    """Tests.java prod case: product table over two dims + where predicate
    (TableDefinitionProd.java#populate)."""
    s = Schema(spark)
    a = s.table("A", spark.createDataFrame([(1,), (2,), (3,)], "x long"))
    b = s.table("B", spark.createDataFrame([(10,), (20,)], "y long"))
    p = s.prod("P", a, b, where="x + y < 23")
    rows = sorted((r["x"], r["y"]) for r in p.df().collect())
    assert rows == [(1, 10), (1, 20), (2, 10), (2, 20), (3, 10)]


# --------------------------------------------------------------- range ----


def test_range_table_numeric(spark):
    """TableDefinitionRange.java: numeric intervals [o+k*p, o+(k+1)*p)."""
    s = Schema(spark)
    r = s.range("R", origin=0.0, period=10.0, length=3)
    rows = sorted(
        (x["interval_start"], x["interval_end"]) for x in r.df().collect()
    )
    assert rows == [(0.0, 10.0), (10.0, 20.0), (20.0, 30.0)]


def test_project_to_range_binning(spark):
    """Project facts into a range table (interval membership) then accu per
    bin — the reference's group-by-interval pattern (range + proj + accu)."""
    s = Schema(spark)
    r = s.range("R", origin=0.0, period=10.0, length=3)
    facts = s.table(
        "F",
        spark.createDataFrame(
            [(1, 1.0, 5.0), (2, 9.9, 6.0), (3, 10.0, 7.0), (4, 25.0, 8.0), (5, 99.0, 9.0)],
            "fid long, v double, m double",
        ),
    )
    s.project_to_range(facts, "bin", r, value="v")
    got = _by(facts.df().collect(), "fid")
    assert got[1]["bin"] == 0.0
    assert got[2]["bin"] == 0.0
    assert got[3]["bin"] == 10.0
    assert got[4]["bin"] == 20.0
    assert got[5]["bin"] is None  # outside the range population

    r.accu("msum", facts, "bin", "sum(m)", default=0.0)
    bins = _by(r.df().collect(), "interval_start")
    assert bins[0.0]["msum"] == 11.0
    assert bins[10.0]["msum"] == 7.0
    assert bins[20.0]["msum"] == 8.0


# ------------------------------------------------- deeper path semantics --


def test_two_hop_column_path(spark):
    """ColumnPath with two link hops (ColumnPath.java#getValue walks any
    depth): facts.mid.top.v — the middle table's own link column compiles
    inside the dim side of the first link."""
    s = Schema(spark)
    top = s.table(
        "TOP",
        spark.createDataFrame([("c1", 100.0), ("c2", 200.0)], "cat string, v double"),
        key=["cat"],
    )
    mid = s.table(
        "MID",
        spark.createDataFrame(
            [("g1", "c1"), ("g2", "c2"), ("g3", "c1")], "name string, cat string"
        ),
        key=["name"],
    )
    mid.link("t", top, on={"cat": "cat"}).bring("t", "v")
    facts = s.table(
        "FACTS",
        spark.createDataFrame(
            [(1, "g1"), (2, "g2"), (3, "g3"), (4, "gX")], "fid long, grp string"
        ),
    )
    facts.link("m", mid, on={"grp": "name"}).bring("m", "t__v")
    got = _by(facts.df().collect(), "fid")
    assert got[1]["m__t__v"] == 100.0
    assert got[2]["m__t__v"] == 200.0
    assert got[3]["m__t__v"] == 100.0
    assert got[4]["m__t__v"] is None  # miss propagates through the path


def test_multi_key_link(spark):
    """Link on a composite key (Column.java#link takes Column[] keys)."""
    s = Schema(spark)
    dim = s.table(
        "DIM",
        spark.createDataFrame(
            [("a", 1, "x"), ("a", 2, "y"), ("b", 1, "z")],
            "k1 string, k2 int, val string",
        ),
        key=["k1", "k2"],
    )
    facts = s.table(
        "FACTS",
        spark.createDataFrame(
            [(1, "a", 1), (2, "a", 2), (3, "b", 1), (4, "b", 9)],
            "fid long, f1 string, f2 int",
        ),
    )
    facts.link("d", dim, on={"f1": "k1", "f2": "k2"}).bring("d", "val")
    got = _by(facts.df().collect(), "fid")
    assert got[1]["d__val"] == "x"
    assert got[2]["d__val"] == "y"
    assert got[3]["d__val"] == "z"
    assert got[4]["d__val"] is None


def test_project_expression_keys(spark):
    """Project keyed on an expression of the source row (the reference's
    value-path variant, ColumnDefinitionProj with expressions)."""
    s = Schema(spark)
    facts = s.table(
        "FACTS",
        spark.createDataFrame(
            [(1, "Ab"), (2, "aB"), (3, "cd")], "fid long, k string"
        ),
    )
    facts.project("dim", "DIMU", keys={"upper(k)": "ku"})
    assert sorted(r["ku"] for r in s.table("DIMU").df().collect()) == ["AB", "CD"]
    got = _by(facts.df().collect(), "fid")
    assert got[1]["dim"] == "AB" and got[2]["dim"] == "AB" and got[3]["dim"] == "CD"


def test_accu_requires_key_error(spark):
    """Definition error surfaces eagerly (BistroError analog): accumulate
    into a table with no declared key is rejected at compile time."""
    s = Schema(spark)
    groups = s.table(
        "G", spark.createDataFrame([("g1",)], "name string")  # no key
    )
    facts = s.table("F", spark.createDataFrame([(1, "g1")], "fid long, grp string"))
    groups.accu("n", facts, "grp", "count(*)", default=0)
    with pytest.raises(ValueError, match="needs a key"):
        groups.df().collect()


def test_formula_bracket_grammar(spark):
    """F1 formula bracket surface (formula/.../FormulaExp4j.java): bracketed
    column references — spaced names, chained formula columns, link-path
    hops — evaluate like their plain-SQL twins, and SQL subscripts are
    untouched by the shim."""
    from bistro_spark.schema import Schema, parse_formula

    assert parse_formula("[Column A] + [B]") == "`Column A` + `B`"
    assert parse_formula("sig[0] + [A]") == "sig[0] + `A`"
    # Quoted spans are never rewritten: a '[' inside a string literal after
    # a space/comma/paren must survive (regex char-classes), as must
    # brackets inside backticked identifiers and ''-escaped literals.
    assert (
        parse_formula("regexp_replace(text, ' [a-z]+', '')")
        == "regexp_replace(text, ' [a-z]+', '')"
    )
    assert parse_formula("concat('[x]', [y])") == "concat('[x]', `y`)"
    assert parse_formula('concat("[x]", [y])') == 'concat("[x]", `y`)'
    assert parse_formula("`weird [name]` + [a]") == "`weird [name]` + `a`"
    assert parse_formula("'it''s [ok]' || [b]") == "'it''s [ok]' || `b`"

    base = spark.createDataFrame(
        [(1, 10.0, 4, "web"), (2, 30.0, 2, "code")],
        ["id", "unit price", "pack size", "source"],
    )
    s = Schema(spark, "formula")
    dim = s.table(
        "dim",
        spark.createDataFrame(
            [("web", 2.0), ("code", 0.5)], ["source", "weight"]
        ),
        key=["source"],
    )
    t = s.table("t", base)
    t.calc("density", "[unit price] / ([pack size] + 1)")
    t.calc("double_density", "[density] * 2")
    t.link("src", dim, on={"source": "source"}).bring("src", "weight")
    t.calc("weighted", "[density] * [src.weight]")
    t.calc("consonants", "regexp_replace(source, '[aeiou]', '')")
    got = {r["id"]: r.asDict() for r in t.df().collect()}
    assert got[1]["consonants"] == "wb"
    assert got[2]["consonants"] == "cd"
    assert got[1]["density"] == 2.0
    assert got[1]["double_density"] == 4.0
    assert got[1]["weighted"] == 4.0
    assert got[2]["density"] == 10.0
    assert got[2]["weighted"] == 5.0
