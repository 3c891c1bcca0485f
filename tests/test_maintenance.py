"""Lakehouse compaction planning: greedy fold semantics (oversize
singletons, offset prefix, target respected), report math, and the
recursive-CTE SQL twins."""

from __future__ import annotations

import duckdb

from bistro_spark.operators.maintenance import (
    compaction_plan,
    compaction_plan_sql,
    compaction_report,
    compaction_report_sql,
)


def _manifest():
    rows = []
    for p in ("a", "b"):
        for i in range(40):
            rows.append((p, i, 10 + (i * 37) % 120))
    rows.append(("a", 100, 900))  # oversize: gets a singleton group
    rows.append(("a", 101, 5))  # small file after the giant
    return rows


def test_plan_semantics(spark):
    df = spark.createDataFrame(
        _manifest(), "part string, file_id long, bytes long"
    )
    plan = compaction_plan(df, partition_col="part", target_bytes=200)
    rows = sorted(
        (r["part"], r["file_id"], r["bytes"], r["group_id"], r["group_offset"])
        for r in plan.collect()
    )
    assert len(rows) == len(_manifest())
    # replay the fold per partition and compare exactly
    by_part: dict[str, list] = {}
    for p, f, b, g, o in rows:
        by_part.setdefault(p, []).append((f, b, g, o))
    for p, fs in by_part.items():
        fs.sort()
        gid, fill, first = 0, 0, True
        for f, b, g, o in fs:
            if not first and fill + b > 200:
                gid, fill = gid + 1, 0
            assert (g, o) == (gid, fill), (p, f)
            fill += b
            first = False
    # every non-oversize group respects the target
    groups: dict[tuple, int] = {}
    for p, f, b, g, o in rows:
        groups[(p, g)] = groups.get((p, g), 0) + b
    for (p, g), tot in groups.items():
        members = [r for r in rows if r[0] == p and r[3] == g]
        if len(members) > 1:
            assert tot <= 200
    # the 900-byte file is alone in its group
    giant = next(r for r in rows if r[2] == 900)
    assert sum(1 for r in rows if r[0] == "a" and r[3] == giant[3]) == 1


def test_plan_sql_twin(spark):
    rows = _manifest()
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    got = sorted(tuple(r) for r in compaction_plan(
        df, partition_col="part", target_bytes=200).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE files(part VARCHAR, file_id BIGINT, bytes BIGINT)")
    con.executemany("INSERT INTO files VALUES (?,?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        compaction_plan_sql("files", partition_col="part", target_bytes=200)
    ).fetchall())
    assert got == want


def test_report_math_and_twin(spark):
    rows = _manifest()
    df = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    rep = {r["part"]: r for r in compaction_report(
        df, partition_col="part", target_bytes=200).collect()}
    assert rep["a"]["n_files"] == 42 and rep["b"]["n_files"] == 40
    assert rep["a"]["bytes_total"] == sum(b for p, f, b in rows if p == "a")
    # small = target // 2 = 100 by default
    assert rep["a"]["n_small_files"] == sum(
        1 for p, f, b in rows if p == "a" and b < 100
    )
    for p in ("a", "b"):
        assert rep[p]["n_files_after"] + rep[p]["files_removed"] == rep[p]["n_files"]
        assert rep[p]["n_files_after"] <= rep[p]["n_files"]
    got = sorted(tuple(r) for r in compaction_report(
        df, partition_col="part", target_bytes=200).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE files(part VARCHAR, file_id BIGINT, bytes BIGINT)")
    con.executemany("INSERT INTO files VALUES (?,?,?)", rows)
    want = sorted(tuple(r) for r in con.execute(
        compaction_report_sql("files", partition_col="part", target_bytes=200)
    ).fetchall())
    assert got == want
