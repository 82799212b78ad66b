"""Unit tests for the sources layer (SURVEY.md §2.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_script_spark.sources import excel, readers, writers


def test_sniff_encoding_utf8(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,hello\n", encoding="utf-8")
    assert readers.sniff_encoding(str(p)) == "utf-8"


def test_sniff_encoding_bom(tmp_path):
    p = tmp_path / "a.csv"
    p.write_bytes(b"\xef\xbb\xbfx,y\n1,2\n")
    assert readers.sniff_encoding(str(p)) == "utf-8-sig"


def test_sniff_encoding_cp874(tmp_path):
    p = tmp_path / "a.csv"
    p.write_text("x,y\n1,ประเทศไทย\n", encoding="cp874")
    assert readers.sniff_encoding(str(p)) == "cp874"


def test_sniff_encoding_probe_boundary_splits_multibyte(tmp_path):
    """A valid utf-8 file whose 64 KiB probe boundary lands mid-
    character must still sniff as utf-8 (not fall through to cp874
    and mojibake the Thai text)."""
    p = tmp_path / "big.csv"
    # place a 3-byte Thai char straddling the probe boundary
    filler = b"a" * (readers.PROBE_BYTES - 1)
    p.write_bytes(filler + "ไทยไทยไทย".encode("utf-8") + b"\n")
    assert readers.sniff_encoding(str(p)) == "utf-8"


def test_csv_fallback_mixed_encodings(spark, tmp_path):
    (tmp_path / "u8.csv").write_text("k,v\n1,alpha\n", encoding="utf-8")
    (tmp_path / "th.csv").write_text("k,v\n2,ไทย\n", encoding="cp874")
    df = readers.read_csv_fallback(
        spark, [str(tmp_path / "u8.csv"), str(tmp_path / "th.csv")], header=True
    )
    rows = {r["k"]: r["v"] for r in df.collect()}
    assert rows == {"1": "alpha", "2": "ไทย"}


def test_distributed_probe_many_files_matches_driver_probe(spark, tmp_path):
    """600 files in a 4-encoding rotation: the executor-side probe must
    agree with the driver-side cascade on every file, and the auto
    (>256 files) distributed path of read_csv_fallback must read all
    rows back losslessly."""
    paths, expect = [], {}
    for i in range(600):
        p = tmp_path / f"f{i}.csv"
        if i % 4 == 0:
            p.write_bytes(f"\ufeffk,v\n{i},bom\n".encode("utf-8"))
            expect[str(p)] = "utf-8-sig"
        elif i % 4 == 1:
            p.write_bytes(f"k,v\n{i},plain\n".encode("utf-8"))
            expect[str(p)] = "utf-8"
        elif i % 4 == 2:
            p.write_bytes(f"k,v\n{i},ไทย\n".encode("cp874"))
            expect[str(p)] = "cp874"
        else:
            p.write_bytes(f"k,v\n{i},x\x81\n".encode("latin1"))
            expect[str(p)] = "latin1"
        paths.append(str(p))
    probed = {
        r["path"]: r["encoding"]
        for r in readers.sniff_encodings_distributed(spark, paths).collect()
    }
    assert probed == expect
    # and identical to the driver probe, file by file (shared cascade)
    for pth in paths[:16]:
        assert probed[pth] == readers.sniff_encoding(pth)
    df = readers.read_csv_fallback(spark, paths, header=True)
    assert df.count() == 600


def test_json_pointer_object(spark, tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"meta": 1, "records": [{"a": 1}, {"a": 2}]}', encoding="utf-8")
    df = readers.read_json_records(spark, str(p), pointer="/records")
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_json_top_level_array(spark, tmp_path):
    p = tmp_path / "d.json"
    p.write_text('[{"a": 10}, {"a": 20}]', encoding="utf-8")
    df = readers.read_json_records(spark, str(p))
    assert sorted(r["a"] for r in df.collect()) == [10, 20]


def test_excel_sniff_kinds():
    assert excel.sniff_excel_kind(b"PK\x03\x04rest") == "xlsx"
    assert excel.sniff_excel_kind(b"\xd0\xcf\x11\xe0rest") == "xls"
    assert excel.sniff_excel_kind(b"<html><table>") == "html"


def test_excel_gated_import_error(tmp_path):
    """A corrupt payload still raises a clear ImportError (never a
    silent wrong parse) — the stdlib xlsx floor rejects non-zip
    bytes, and legacy .xls has no engine in this container."""
    payload = b"PK\x03\x04" + b"\x00" * 64
    with pytest.raises(ImportError):
        excel._parse_excel_bytes(payload, header=0, dtype_str=True)
    with pytest.raises(ImportError):
        excel._parse_excel_bytes(
            b"\xd0\xcf\x11\xe0" + b"\x00" * 64, header=0, dtype_str=True
        )


def test_xlsx_stdlib_roundtrip_driver(spark, tmp_path):
    """write_xlsx_simple → read_excel_driver with NO optional engine
    installed: the stdlib OOXML floor makes S2 real in this container.
    Dates round-trip as Excel serials (F2's input contract)."""
    p = tmp_path / "book.xlsx"
    excel.write_xlsx_simple(
        [
            ["id", "name", "เมือง", "serial"],
            [1, "alpha", "กรุงเทพ", 45000],
            [2, "beta", None, 45001.5],
        ],
        str(p),
    )
    df = excel.read_excel_driver(spark, [str(p)])
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["name"] for r in rows] == ["alpha", "beta"]
    assert rows[0]["เมือง"] == "กรุงเทพ" and rows[1]["เมือง"] is None
    assert rows[0]["serial"] == "45000"  # raw serial literal
    assert rows[0]["source_sheet"] == "Sheet1"


def test_xlsx_stdlib_shared_strings_and_gaps():
    """Hand-built workbook using sharedStrings + sparse cell refs:
    gaps become None, shared strings resolve, header=None stays
    positional."""
    import io
    import zipfile

    buf = io.BytesIO()
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships">'
            '<sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>',
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            'relationships"><Relationship Id="rId1" Type="t" '
            'Target="worksheets/sheet1.xml"/></Relationships>',
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}"><si><t>hello</t></si>'
            "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>",
        )
        zf.writestr(
            "xl/worksheets/sheet1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="3"><c r="B3"><v>7.5</v></c></row>'
            "</sheetData></worksheet>",
        )
    sheets = excel.parse_xlsx_stdlib(buf.getvalue(), header=None)
    assert len(sheets) == 1
    pdf = sheets[0][1]
    assert pdf.iloc[0].tolist() == ["hello", None, "rich"]  # A1, gap, rich text C1
    assert pdf.iloc[1].isna().all()  # skipped row r=2
    assert pdf.iloc[2].tolist() == [None, "7.5", None]  # sparse B3


def test_xls_stdlib_roundtrip_driver(spark, tmp_path):
    """write_xls_simple → read_excel_driver with NO optional engine:
    the from-scratch CFB+BIFF8 floor makes legacy .xls real in this
    container. Thai strings (16-bit SST chars) and serial literals
    round-trip identically to the xlsx path."""
    from etl_script_spark.sources import xls_biff

    p = tmp_path / "book.xls"
    xls_biff.write_xls_simple(
        [
            ["id", "name", "เมือง", "serial"],
            [1, "alpha", "กรุงเทพ", 45000],
            [2, "beta", None, 45001.5],
        ],
        str(p),
    )
    with open(p, "rb") as f:
        assert excel.sniff_excel_kind(f.read(8)) == "xls"
    df = excel.read_excel_driver(spark, [str(p)])
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["name"] for r in rows] == ["alpha", "beta"]
    assert rows[0]["เมือง"] == "กรุงเทพ" and rows[1]["เมือง"] is None
    assert rows[0]["serial"] == "45000"  # raw serial literal
    assert rows[1]["serial"] == "45001.5"
    assert rows[0]["source_sheet"] == "Sheet1"


def test_xls_biff_records(tmp_path):
    """Hand-built BIFF8 stream exercising every cell-record decoder:
    RK in all four encodings, MULRK runs, FORMULA cached number /
    string / bool results, BOOLERR, and an SST string split across a
    CONTINUE boundary with a grbit flip (compressed → 16-bit)."""
    import struct

    from etl_script_spark.sources import xls_biff as xb

    def rec(op, data):
        return xb._rec(op, data)

    def bof(dt):
        return rec(
            xb._BOF, struct.pack("<HHHHII", 0x0600, dt, 0, 0, 1, 0x0600)
        )

    # SST with 2 strings; the second splits mid-string at a CONTINUE
    # whose continuation restarts 16-bit (grbit=1)
    s0 = "plain"
    sst_data = struct.pack("<II", 2, 2)
    sst_data += struct.pack("<HB", len(s0), 0) + s0.encode("latin-1")
    #   second string: cch=6, starts compressed with "ab", continues
    #   utf-16 with "cดef"
    sst_data += struct.pack("<HB", 6, 0) + b"ab"
    cont = bytes([1]) + "cดef".encode("utf-16-le")
    sst = rec(xb._SST, sst_data) + rec(xb._CONTINUE, cont)

    cells = b""
    r = 0
    # RK: int30, int30/100, double-bits, double-bits/100
    for rk, want in [
        ((7 << 2) | 2, "7"),
        ((1250 << 2) | 3, "12.5"),
        (struct.unpack("<I", struct.pack("<d", 2.5)[4:])[0] & 0xFFFFFFFC, "2.5"),
        ((struct.unpack("<I", struct.pack("<d", 250.0)[4:])[0] & 0xFFFFFFFC) | 1, "2.5"),
    ]:
        cells += rec(xb._RK, struct.pack("<HHHI", r, 0, 15, rk))
        r += 1
    # MULRK: two RKs in one record (cols 1-2 of row 0)
    cells += rec(
        xb._MULRK,
        struct.pack("<HH", 0, 1)
        + struct.pack("<HI", 15, (3 << 2) | 2)
        + struct.pack("<HI", 15, (45 << 2) | 3)
        + struct.pack("<H", 2),
    )
    # LABELSST both strings
    cells += rec(xb._LABELSST, struct.pack("<HHHI", 4, 0, 15, 0))
    cells += rec(xb._LABELSST, struct.pack("<HHHI", 4, 1, 15, 1))
    # FORMULA cached number
    cells += rec(
        xb._FORMULA,
        struct.pack("<HHH", 5, 0, 15) + struct.pack("<d", 9.25) + b"\x00" * 6,
    )
    # FORMULA cached string (STRING record follows)
    cells += rec(
        xb._FORMULA,
        struct.pack("<HHH", 5, 1, 15)
        + b"\x00" * 6
        + b"\xff\xff"
        + b"\x00" * 6,
    )
    cells += rec(
        xb._STRING, struct.pack("<HB", 3, 0) + b"fml"
    )
    # FORMULA cached bool TRUE
    cells += rec(
        xb._FORMULA,
        struct.pack("<HHH", 5, 2, 15)
        + bytes([1, 0, 1])
        + b"\x00" * 3
        + b"\xff\xff"
        + b"\x00" * 6,
    )
    # BOOLERR false + error (error cell stays empty)
    cells += rec(xb._BOOLERR, struct.pack("<HHHBB", 6, 0, 15, 0, 0))
    cells += rec(xb._BOOLERR, struct.pack("<HHHBB", 6, 1, 15, 0x17, 1))

    sheet = bof(0x0010) + cells + rec(xb._EOF, b"")
    name = b"S"
    bs_rec_len = 4 + 6 + 2 + len(name)  # header + IBB + BB + name
    globals_len = len(bof(0x0005)) + bs_rec_len + len(sst) + 4
    bs = rec(
        xb._BOUNDSHEET,
        struct.pack("<IBB", globals_len, 0, 0)
        + struct.pack("<BB", len(name), 0)
        + name,
    )
    workbook = bof(0x0005) + bs + sst + rec(xb._EOF, b"") + sheet
    if len(workbook) < 4096:
        workbook += rec(0x0897, b"\x00" * (4096 - len(workbook) - 4))

    sheets = xb.parse_xls_stdlib(xb._cfb_wrap(workbook), header=None)
    assert len(sheets) == 1 and sheets[0][0] == "S"
    pdf = sheets[0][1]
    assert pdf.iloc[0].tolist() == ["7", "3", "0.45"]
    assert pdf.iloc[1, 0] == "12.5"
    assert pdf.iloc[2, 0] == "2.5"
    assert pdf.iloc[3, 0] == "2.5"
    assert pdf.iloc[4].tolist()[:2] == ["plain", "abcดef"]
    assert pdf.iloc[5].tolist()[:3] == ["9.25", "fml", "True"]
    assert pdf.iloc[6].tolist()[:2] == ["False", None]


def test_union_files_with_lineage(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([(2,)], ["k"])  # missing column v
    out = readers.union_files_with_lineage(spark, [("s1", a), ("s2", b)])
    rows = {r["k"]: (r["v"], r["source_sheet"]) for r in out.collect()}
    assert rows == {1: ("x", "s1"), 2: (None, "s2")}


def test_insert_only_append_counts(spark):
    existing = spark.createDataFrame([(1,), (2,)], ["k"])
    incoming = spark.createDataFrame([(2, "b"), (3, "c")], ["k", "v"])
    new_rows, dupes = writers.insert_only_append(existing, incoming, ["k"])
    assert [r["k"] for r in new_rows.collect()] == [3]
    assert dupes.count() == 1


def test_overwrite_partition(spark):
    full = spark.createDataFrame([(1, "old"), (2, "old")], ["p", "v"])
    repl = spark.createDataFrame([(1, "new"), (1, "new2")], ["p", "v"])
    out = writers.overwrite_partition(repl, full, "p", [1])
    got = sorted((r["p"], r["v"]) for r in out.collect())
    assert got == [(1, "new"), (1, "new2"), (2, "old")]


def test_http_push_sink_batches(spark, tmp_path):
    """S15: every row is delivered exactly once, in executor-side
    batches (poster writes to files — local mode shares the FS)."""
    import glob
    import json
    import os
    import uuid

    out_dir = str(tmp_path / "posts")
    os.makedirs(out_dir, exist_ok=True)

    def poster_factory():
        def post(batch):
            p = f"{out_dir}/{uuid.uuid4().hex}.json"
            with open(p, "w") as f:
                json.dump(batch, f)
        return post

    df = spark.range(10).selectExpr("id", "id * 2 as v").repartition(3)
    writers.http_push_sink(df, poster_factory, batch_size=2)

    seen = []
    for p in glob.glob(f"{out_dir}/*.json"):
        with open(p) as f:
            batch = json.load(f)
        assert len(batch) <= 2
        seen.extend(r["id"] for r in batch)
    assert sorted(seen) == list(range(10))


def test_atomic_overwrite_swap(spark, tmp_path):
    """Two snapshot writes; `current` always resolves to a complete
    table, and the second swap replaces the first."""
    table = str(tmp_path / "gold")
    writers.atomic_overwrite_parquet(spark.range(5), table)
    assert spark.read.parquet(f"{table}/current").count() == 5
    writers.atomic_overwrite_parquet(spark.range(9), table)
    assert spark.read.parquet(f"{table}/current").count() == 9


def test_concurrent_reader_survives_swap_and_vacuum_spares_current(
    spark, tmp_path
):
    """The concurrent-reader guarantee: a scan that resolved the OLD
    snapshot completes against its immutable files even after the
    symlink swaps; the next resolution sees the new snapshot; vacuum
    never removes the snapshot `current` resolves to."""
    import os

    table = str(tmp_path / "gold")
    writers.atomic_overwrite_parquet(spark.range(100), table)
    # reader pins the OLD snapshot the way a long scan does: by the
    # resolved physical path, not the symlink
    pinned = os.path.realpath(f"{table}/current")
    old_reader = spark.read.parquet(pinned)
    assert old_reader.count() == 100
    writers.atomic_overwrite_parquet(spark.range(250), table)
    # post-swap: the in-flight reader still sees v1 in full...
    assert old_reader.count() == 100
    assert sorted(r["id"] for r in old_reader.collect()) == list(range(100))
    # ...and a fresh resolution sees v2
    assert spark.read.parquet(f"{table}/current").count() == 250
    # a third snapshot, then vacuum keep=1: only non-current victims go
    writers.atomic_overwrite_parquet(spark.range(7), table)
    victims = writers.vacuum_snapshots(table, keep=1)
    assert len(victims) == 2
    cur = os.path.realpath(f"{table}/current")
    assert cur not in [os.path.realpath(v) for v in victims]
    assert spark.read.parquet(f"{table}/current").count() == 7


def test_write_audit_publish_gates_the_swap(spark, tmp_path):
    """write -> observe-metrics audit -> publish: a failing audit
    leaves the previous snapshot live and quarantines the rejected
    one; a passing audit swaps. Metrics come from the write pass
    itself (Observation API), not a re-read."""
    import os

    table = str(tmp_path / "gold")
    metrics = {
        "n_rows": F.count(F.lit(1)),
        "n_null_id": F.count(F.when(F.col("id").isNull(), 1)),
    }

    def expect_at_least_50(m):
        if m["n_null_id"] > 0:
            return f"{m['n_null_id']} null ids"
        return True if m["n_rows"] >= 50 else f"only {m['n_rows']} rows"

    ok = writers.write_audit_publish(
        spark.range(80), table, metrics, expect_at_least_50
    )
    assert ok["published"] and ok["metrics"]["n_rows"] == 80
    assert spark.read.parquet(f"{table}/current").count() == 80

    bad = writers.write_audit_publish(
        spark.range(3), table, metrics, expect_at_least_50
    )
    assert not bad["published"] and bad["reason"] == "only 3 rows"
    # previous snapshot still live; rejected one quarantined on disk
    assert spark.read.parquet(f"{table}/current").count() == 80
    assert os.path.isdir(bad["snapshot"])
    assert os.path.realpath(f"{table}/current") != os.path.realpath(
        bad["snapshot"]
    )


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the same key join with ZERO exchanges —
    the physical plan proof that bucketing co-locates the join."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(1000).selectExpr("id AS k", "id * 2 AS va")
        b = spark.range(1000).selectExpr("id AS k", "id * 3 AS vb")
        writers.write_bucketed_table(a, "bt_a", ["k"], n_buckets=4)
        writers.write_bucketed_table(b, "bt_b", ["k"], n_buckets=4)
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_insert_only_append_counts_intra_batch_dupes(spark):
    """appended + skipped must equal incoming row-for-row: intra-batch
    duplicates count as skips, not silent disappearances."""
    from etl_script_spark.sources.writers import insert_only_append

    ex = spark.createDataFrame([(1, "a")], "k long, v string")
    inc = spark.createDataFrame(
        [(2, "b"), (2, "b2"), (1, "dup")], "k long, v string"
    )
    new, skipped = insert_only_append(ex, inc, ["k"])
    assert new.count() == 1
    assert skipped.count() == 2


def test_insert_only_append_map_payload_and_agreement(spark):
    """ADVICE r3: map-typed payload columns must work (the old
    exceptAll formulation threw at analysis time), and appended +
    skipped must partition the batch even when the intra-batch winner
    is arbitrary — both outputs come from one pinned plan."""
    from etl_script_spark.sources.writers import insert_only_append

    ex = spark.createDataFrame([(1, {"a": "1"})], "k long, m map<string,string>")
    inc = spark.createDataFrame(
        [(1, {"x": "1"}), (2, {"y": "2"}), (2, {"z": "3"}), (3, {"w": "4"})],
        "k long, m map<string,string>",
    )
    new, skipped = insert_only_append(ex, inc, ["k"])
    new_rows = new.collect()
    skip_rows = skipped.collect()
    assert sorted(r["k"] for r in new_rows) == [2, 3]
    assert sorted(r["k"] for r in skip_rows) == [1, 2]
    # row-for-row partition: the k=2 winner appears exactly once across
    # the two outputs and the loser in the other
    k2 = sorted(
        (dict(r["m"]) for r in new_rows + skip_rows if r["k"] == 2),
        key=str,
    )
    assert k2 == [{"y": "2"}, {"z": "3"}]
    assert new.columns == inc.columns


def test_insert_only_append_order_col_deterministic(spark):
    """With order_col, keep-first is by the stamped ordinal."""
    from etl_script_spark.sources.writers import insert_only_append

    ex = spark.createDataFrame([], "k long, v string, ord long")
    inc = spark.createDataFrame(
        [(1, "late", 9), (1, "early", 1)], "k long, v string, ord long"
    )
    new, skipped = insert_only_append(ex, inc, ["k"], order_col="ord")
    assert [r["v"] for r in new.collect()] == ["early"]
    assert [r["v"] for r in skipped.collect()] == ["late"]


def test_merge_into_partitioned_rewrites_only_touched(spark, tmp_path):
    """VERDICT r3 #4: a partition-scoped upsert must leave untouched
    partitions' files byte-identical (not rewritten), update/insert
    within the touched partition, and leave a same-key row in an
    UNtouched partition alone (key identity is scoped to the
    partitions the batch names — the documented Delta-MERGE-like
    contract)."""
    import glob
    import hashlib
    import os

    table = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, 1995 + i % 3, float(i)) for i in range(300)],
        "k long, yr int, v double",
    )
    df.write.partitionBy("yr").parquet(table)

    def snap(year):
        return [
            (os.path.basename(f), hashlib.md5(open(f, "rb").read()).hexdigest())
            for f in sorted(glob.glob(f"{table}/yr={year}/*.parquet"))
        ]

    before_95, before_96 = snap(1995), snap(1996)
    batch = spark.createDataFrame(
        # k=2 lives in yr=1997 (update); k=10000 is new (insert);
        # k=0 lives in yr=1995 — batch claims 1997, so 1995 keeps its row
        [(2, 1997, 999.0), (10000, 1997, 5.0), (0, 1997, 111.0)],
        "k long, yr int, v double",
    )
    parts = writers.merge_into_partitioned(spark, table, batch, ["k"], "yr")
    assert parts == [1997]
    assert snap(1995) == before_95
    assert snap(1996) == before_96
    out = {(r["k"], r["yr"]): r["v"] for r in spark.read.parquet(table).collect()}
    assert out[(2, 1997)] == 999.0
    assert out[(10000, 1997)] == 5.0
    assert out[(0, 1997)] == 111.0
    assert out[(0, 1995)] == 0.0  # untouched partition keeps its row
    assert len(out) == 302


def test_merge_into_partitioned_sync_strategy(spark, tmp_path):
    """strategy='sync': the batch is the new truth for the partitions
    it names — keys missing from the batch are deleted THERE, other
    partitions keep every row."""
    table = str(tmp_path / "tbl2")
    df = spark.createDataFrame(
        [(1, 1997, 1.0), (2, 1997, 2.0), (3, 1998, 3.0)],
        "k long, yr int, v double",
    )
    df.write.partitionBy("yr").parquet(table)
    batch = spark.createDataFrame([(1, 1997, 10.0)], "k long, yr int, v double")
    parts = writers.merge_into_partitioned(
        spark, table, batch, ["k"], "yr", strategy="sync"
    )
    assert parts == [1997]
    out = {(r["k"], r["yr"]): r["v"] for r in spark.read.parquet(table).collect()}
    assert out == {(1, 1997): 10.0, (3, 1998): 3.0}  # k=2 deleted in 1997


def test_range_clustered_layout_disjoint_and_pruned(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_script_spark.sources import layout

    df = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 997).alias("payload")
    )
    out = str(tmp_path / "clustered")
    layout.write_range_clustered(df, out, "k", 6)
    ranges = sorted(
        (r["min_key"], r["max_key"], r["rows"])
        for r in layout.file_ranges(spark, out, "k").collect()
    )
    assert len(ranges) == 6
    # disjoint, covering, ordered intervals — the property pruning needs
    for (lo1, hi1, _), (lo2, hi2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert ranges[0][0] == 0 and ranges[-1][1] == 9999
    assert sum(r[2] for r in ranges) == 10000
    # the range filter reaches the scan as a pushed filter
    got = spark.read.parquet(out).filter(F.col("k").between(100, 200))
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(k,100)" in plan
    assert got.count() == 101


def test_compact_files_collapses_count_and_preserves_rows(spark, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F

    from etl_script_spark.sources import layout
    from etl_script_spark.sources.writers import atomic_overwrite_parquet

    df = spark.range(5000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    table = str(tmp_path / "t")
    atomic_overwrite_parquet(df.repartition(32), table)
    before = len(
        glob.glob(os.path.realpath(os.path.join(table, "current")) + "/*.parquet")
    )
    assert before == 32
    layout.compact_files(spark, table)
    after_dir = os.path.realpath(os.path.join(table, "current"))
    after = len(glob.glob(after_dir + "/*.parquet"))
    assert after < before
    got = spark.read.parquet(os.path.join(table, "current"))
    assert got.count() == 5000
    assert got.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_compact_files_clustered_restores_skipping(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_script_spark.sources import layout
    from etl_script_spark.sources.writers import atomic_overwrite_parquet

    df = spark.range(20000).select(F.col("id").alias("k"))
    table = str(tmp_path / "t2")
    atomic_overwrite_parquet(df.repartition(16), table)
    # tiny target so the clustered rewrite produces several files
    layout.compact_files(spark, table, target_file_bytes=16 << 10, cluster_col="k")
    import os

    ranges = sorted(
        (r["min_key"], r["max_key"])
        for r in layout.file_ranges(
            spark, os.path.join(table, "current"), "k"
        ).collect()
    )
    assert len(ranges) > 1
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2


def test_paged_feed_datasource_partitions_and_content(spark, tmp_path):
    import json

    from etl_script_spark.sources import pyds

    feed = tmp_path / "feed"
    feed.mkdir()
    for p in range(8):
        recs = [
            {"doc_no": f"D{p}_{i}", "amount": float(p * 10 + i)}
            for i in range(5)
        ]
        (feed / f"page_{p:04d}.json").write_text(json.dumps(recs))
    # a skipped page number must not shift attribution
    (feed / "page_0003.json").unlink()
    pyds.register(spark)
    df = spark.read.format("paged_feed").option("path", str(feed)).load()
    rows = df.collect()
    assert len(rows) == 35
    assert df.rdd.getNumPartitions() >= 1
    by_page = {}
    for r in rows:
        by_page.setdefault(r["page"], set()).add(r["doc_no"])
    assert 3 not in by_page
    assert by_page[7] == {f"D7_{i}" for i in range(5)}
    # schema projection works through the custom source
    assert df.select("amount").schema[0].dataType.typeName() == "double"


def test_zorder_files_have_tight_bounding_boxes(spark, tmp_path):
    """Z-order clustering must localize BOTH dimensions: per-file
    (x, y) bounding boxes should cover a small fraction of the global
    grid area, which is what lets footer stats prune a box filter on
    either dimension. A random layout's boxes each cover ~the whole
    grid."""
    from pyspark.sql import functions as F

    from etl_script_spark.sources import layout

    df = spark.range(20_000).select(
        (F.col("id") % 256).alias("x"),
        ((F.col("id") * 7919) % 256).alias("y"),
    )
    out = str(tmp_path / "z")
    layout.write_zorder_clustered(df, out, ["x", "y"], 16, bits=8)
    files = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name())
        .agg(
            F.min("x").alias("x0"), F.max("x").alias("x1"),
            F.min("y").alias("y0"), F.max("y").alias("y1"),
        )
        .collect()
    )
    assert len(files) >= 8
    area = sum(
        (r["x1"] - r["x0"] + 1) * (r["y1"] - r["y0"] + 1) for r in files
    ) / len(files)
    # global grid is 256x256 = 65,536; z-ordered 16-file boxes must
    # average well under a quarter of it (measured ~1/8th)
    assert area < 65_536 / 4, area


def test_zorder_key_matches_reference_bits(spark):
    """Pin the interleave convention: dim j occupies bit positions
    b*k + j — x gets the even bits, y the odd bits (k=2)."""
    from pyspark.sql import functions as F

    from etl_script_spark.sources.layout import zorder_key

    rows = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255)], "x long, y long"
    ).select("x", "y", zorder_key(["x", "y"], bits=8).alias("z")).collect()
    def ref(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z
    for r in rows:
        assert r["z"] == ref(r["x"], r["y"]), (r["x"], r["y"])


def test_paged_feed_stream_incremental_offsets(spark, tmp_path):
    """SimpleDataSourceStreamReader contract: wave 2 through the SAME
    checkpoint consumes only the pages that appeared after wave 1's
    committed offset, and a committed range replays bit-identically
    (readBetweenOffsets)."""
    import json

    from etl_script_spark.sources import pyds

    pyds.register(spark)
    feed = tmp_path / "feed"
    feed.mkdir()
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def page(p, recs):
        (feed / f"page_{p:04d}.json").write_text(json.dumps(recs))

    def drain():
        q = (
            spark.readStream.format("paged_feed")
            .option("path", str(feed))
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    page(0, [{"doc_no": "A", "amount": 1.0}])
    page(1, [{"doc_no": "B", "amount": 2.0}])
    drain()
    got1 = {
        (r["doc_no"], r["page"]) for r in spark.read.parquet(sink).collect()
    }
    assert got1 == {("A", 0), ("B", 1)}
    page(2, [{"doc_no": "C", "amount": 3.0}])
    drain()
    got2 = {
        (r["doc_no"], r["page"]) for r in spark.read.parquet(sink).collect()
    }
    # wave 2 appended ONLY page 2 — no replays of pages 0/1
    assert got2 == {("A", 0), ("B", 1), ("C", 2)}
    # replay determinism for recovery
    rd = pyds.PagedFeedStreamReader({"path": str(feed)})
    replay = rd.readBetweenOffsets({"page": 0}, {"page": 2})
    assert [t[0] for t in replay] == ["B", "C"]
