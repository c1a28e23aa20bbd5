"""Cookbook file_formats / database_integration surfaces (sources/io.py
tail + sources/excel_io.py): text, SQLite (distributed rowid ranges),
DuckDB database files, HTTP import against a LIVE local server, and the
stdlib OOXML excel reader/writer — every path runs for real here."""

from __future__ import annotations

import os
import sqlite3
import threading

import duckdb
import pytest

from serenedb_spark.sources import io as IO


def test_read_text(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("alpha\nbravo\ncharlie\n")
    got = [r.line for r in IO.read_text(spark, str(p), col="line")
           .collect()]
    assert sorted(got) == ["alpha", "bravo", "charlie"]


def test_read_sqlite_distributed_roundtrip(spark, tmp_path):
    db = str(tmp_path / "t.db")
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE items (id INTEGER, name TEXT, w REAL,"
                " blob BLOB)")
    con.executemany(
        "INSERT INTO items VALUES (?,?,?,?)",
        [(i, f"item{i}", i * 0.5, bytes([i % 256])) for i in range(1000)])
    con.commit()
    con.close()

    df = IO.read_sqlite(spark, db, "items", num_partitions=4)
    assert df.rdd.getNumPartitions() >= 1
    rows = sorted((r.id, r.name, r.w) for r in df.collect())
    assert len(rows) == 1000
    assert rows[0] == (0, "item0", 0.0) and rows[999] == (999, "item999",
                                                          499.5)
    assert dict(df.dtypes)["id"] == "bigint"
    assert dict(df.dtypes)["blob"] == "binary"

    with pytest.raises(ValueError):
        IO.read_sqlite(spark, db, "missing")


def test_write_sqlite_small_export(spark, tmp_path):
    db = str(tmp_path / "out.db")
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 2.5)], "id long, s string, x double")
    IO.write_sqlite(df, db, "exported")
    con = sqlite3.connect(db)
    rows = con.execute("SELECT * FROM exported ORDER BY id").fetchall()
    con.close()
    assert rows == [(1, "a", None), (2, "b", 2.5)]


def test_read_duckdb_file(spark, tmp_path):
    db = str(tmp_path / "d.duckdb")
    con = duckdb.connect(db)
    con.sql("CREATE TABLE nums AS SELECT range AS n, range * 2 AS d"
            " FROM range(100)")
    con.close()
    df = IO.read_duckdb(spark, db, "nums")
    assert df.count() == 100
    got = IO.read_duckdb(spark, db, "SELECT sum(n) AS s FROM nums") \
        .first().s
    assert got == sum(range(100))


def test_read_http_live_server(spark, tmp_path):
    """http_import.test against a REAL local HTTP server (stdlib
    http.server), serving a CSV Spark then reads with inference."""
    import http.server
    import socketserver

    (tmp_path / "data.csv").write_text("id,name\n1,alpha\n2,bravo\n")
    os_dir = str(tmp_path)

    class H(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *a, **kw):
            super().__init__(*a, directory=os_dir, **kw)

        def log_message(self, *a):
            pass

    with socketserver.TCPServer(("127.0.0.1", 0), H) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            df = IO.read_http(
                spark, f"http://127.0.0.1:{port}/data.csv", fmt="csv")
            rows = sorted((r.id, r.name) for r in df.collect())
            assert rows == [(1, "alpha"), (2, "bravo")]
        finally:
            srv.shutdown()


def test_excel_roundtrip(spark, tmp_path):
    p = str(tmp_path / "x.xlsx")
    df = spark.createDataFrame(
        [(1, "alpha & <co>", 1.5, True), (2, None, None, False)],
        "id long, name string, w double, flag boolean")
    IO.write_excel(df, p)
    back = IO.read_excel(spark, p)
    assert back.columns == ["id", "name", "w", "flag"]
    rows = sorted(back.collect(), key=lambda r: r.id)
    assert (rows[0].id, rows[0].name, rows[0].w, rows[0].flag) \
        == (1, "alpha & <co>", 1.5, True)
    assert (rows[1].name, rows[1].w, rows[1].flag) == (None, None, False)


def test_excel_reads_shared_strings(tmp_path):
    """Files from real producers use sharedStrings — hand-build one in
    that layout and read it."""
    import zipfile

    from serenedb_spark.sources import excel_io as X

    p = str(tmp_path / "ss.xlsx")
    X.write_xlsx(p, ["a"], [["placeholder"]])
    # rewrite sheet1 to use a shared-string cell + add the table
    with zipfile.ZipFile(p) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["xl/worksheets/sheet1.xml"] = (
        b'<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        b'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        b'<row r="1"><c r="A1" t="s"><v>0</v></c></row>'
        b'<row r="2"><c r="A2" t="s"><v>1</v></c></row>'
        b"</sheetData></worksheet>")
    parts["xl/sharedStrings.xml"] = (
        b'<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats'
        b'.org/spreadsheetml/2006/main" count="2" uniqueCount="2">'
        b"<si><t>head</t></si><si><t>body text</t></si></sst>")
    with zipfile.ZipFile(p, "w") as z:
        for n, data in parts.items():
            z.writestr(n, data)
    header, rows = X.read_xlsx(p)
    assert header == ["head"] and rows == [["body text"]]
