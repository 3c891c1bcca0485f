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


# ---------------------------------------------------------------------------
# snapshot expiry + orphan files
# ---------------------------------------------------------------------------


def _snaps(spark):
    # one table, six daily snapshots (day 1..6 of 2024-01)
    from pyspark.sql import functions as F

    rows = [("t", i, f"2024-01-0{i} 12:00:00") for i in range(1, 7)]
    return spark.createDataFrame(
        rows, "tbl string, snapshot_id long, committed_at string"
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))


def test_snapshot_expiry_worked_example(spark):
    from bistro_spark.operators.maintenance import snapshot_expiry_plan

    got = {
        r["snapshot_id"]: (r["recency_rank"], r["status"])
        for r in snapshot_expiry_plan(
            _snaps(spark), retain_last=2, older_than="2024-01-04"
        ).collect()
    }
    # ranks newest-first: day6=1, day5=2 kept as recent regardless of age;
    # day4 is old-rank but at/after the cutoff; days 3,2,1 expire
    assert got == {
        6: (1, "retained_recent"),
        5: (2, "retained_recent"),
        4: (3, "retained_age"),
        3: (4, "expired"),
        2: (5, "expired"),
        1: (6, "expired"),
    }


def test_snapshot_expiry_rank_tie_deterministic(spark):
    from pyspark.sql import functions as F

    from bistro_spark.operators.maintenance import snapshot_expiry_plan

    df = spark.createDataFrame(
        [("t", 1, "2024-01-05 00:00:00"), ("t", 2, "2024-01-05 00:00:00")],
        "tbl string, snapshot_id long, committed_at string",
    ).withColumn("committed_at", F.col("committed_at").cast("timestamp"))
    got = {
        r["snapshot_id"]: r["recency_rank"]
        for r in snapshot_expiry_plan(df, retain_last=1).collect()
    }
    # equal timestamps: the higher snapshot_id ranks first (documented tie)
    assert got == {2: 1, 1: 2}


def test_orphan_files_worked_example(spark):
    from bistro_spark.operators.maintenance import (
        orphan_files,
        snapshot_expiry_plan,
    )

    plan = snapshot_expiry_plan(
        _snaps(spark), retain_last=2, older_than="2024-01-04"
    )
    refs = spark.createDataFrame(
        [
            ("t", 1, 100),  # file 100: referenced only by expired snaps
            ("t", 2, 100),
            ("t", 3, 200),  # file 200: one live ref (day 4) keeps it
            ("t", 4, 200),
            ("t", 6, 300),  # file 300: live only
        ],
        "tbl string, snapshot_id long, file_id long",
    )
    got = {
        r["file_id"]: (r["n_refs"], r["n_live_refs"], r["deletable"])
        for r in orphan_files(refs, plan).collect()
    }
    assert got == {
        100: (2, 0, True),
        200: (2, 1, False),
        300: (1, 1, False),
    }


def test_orphan_files_empty_refs_schema_stable(spark):
    from bistro_spark.operators.maintenance import (
        orphan_files,
        snapshot_expiry_plan,
    )

    plan = snapshot_expiry_plan(_snaps(spark))
    refs = spark.createDataFrame(
        [], "tbl string, snapshot_id long, file_id long"
    )
    out = orphan_files(refs, plan)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "tbl",
        "file_id",
        "n_refs",
        "n_live_refs",
        "deletable",
    ]


def test_maintenance_report_consistent_with_parts(spark):
    from bistro_spark.operators.maintenance import (
        maintenance_report,
        orphan_files,
        snapshot_expiry_plan,
    )

    snaps = _snaps(spark)
    refs = spark.createDataFrame(
        [("t", d, (d // 2) * 10) for d in range(1, 7)],
        "tbl string, snapshot_id long, file_id long",
    )
    rep = {
        r["tbl"]: r
        for r in maintenance_report(
            snaps, refs, retain_last=2, older_than="2024-01-04"
        ).collect()
    }
    plan = snapshot_expiry_plan(snaps, retain_last=2, older_than="2024-01-04")
    orph = orphan_files(refs, plan).collect()
    n_expired = sum(
        1 for r in plan.collect() if r["status"] == "expired"
    )
    assert rep["t"]["n_snapshots"] == 6
    assert rep["t"]["n_expired"] == n_expired
    assert rep["t"]["n_files"] == len(orph)
    assert rep["t"]["n_deletable"] == sum(1 for r in orph if r["deletable"])
    assert rep["t"]["n_refs"] == sum(r["n_refs"] for r in orph)
