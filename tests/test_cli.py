"""CLI tests (presto-cli twin — Console.java / AlignedTablePrinter.java)."""

import io

from facebook_presto_spark import cli


def test_statement_splitter_respects_strings():
    stmts = list(cli.read_statements(iter([
        "SELECT 'a;b' AS x; SELECT 1",
        "+2 AS y; SELECT 'it''s;ok' AS z;",
    ])))
    assert stmts == [
        "SELECT 'a;b' AS x",
        "SELECT 1+2 AS y",
        "SELECT 'it''s;ok' AS z",
    ]


def test_aligned_printer_format():
    out = io.StringIO()
    n = cli.print_aligned(
        ["name", "n"], [("AFRICA", 1), ("ASIA", 22)], out
    )
    assert n == 2
    lines = out.getvalue().splitlines()
    assert lines[0] == "  name  | n"
    assert lines[1] == "--------+----"
    assert lines[2] == " AFRICA | 1"
    assert lines[3] == " ASIA   | 22"
    assert lines[4] == "(2 rows)"


def test_null_and_binary_rendering():
    out = io.StringIO()
    cli.print_aligned(["v"], [(None,), (b"\x01\xab",)], out)
    text = out.getvalue()
    assert "NULL" in text and "01 ab" in text


def test_formats_csv_tsv_vertical():
    rows = [("a,1", 1), ("b", None)]
    out = io.StringIO()
    cli.print_rows(["s", "n"], iter(rows), "CSV_HEADER", out)
    assert out.getvalue() == 's,n\n"a,1",1\nb,\n'
    out = io.StringIO()
    cli.print_rows(["s", "n"], iter(rows), "TSV", out)
    assert out.getvalue() == "a,1\t1\nb\t\n"
    out = io.StringIO()
    cli.print_rows(["s", "n"], iter(rows), "VERTICAL", out)
    assert "-[ RECORD 1 ]-" in out.getvalue()


def test_batch_execute_end_to_end(spark, capsys):
    rc = cli.main([
        "--sf-dir", "/root/testdata/sf0.001",
        "-e", "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
        "--output-format", "CSV_HEADER",
    ])
    assert rc == 0
    assert capsys.readouterr().out == "r_name\nAFRICA\nAMERICA\n"


def test_batch_error_exit_code(spark, capsys):
    rc = cli.main([
        "--sf-dir", "/root/testdata/sf0.001",
        "-e", "SELECT * FROM no_such_table",
    ])
    assert rc == 1
    assert "Query failed" in capsys.readouterr().err


def test_batch_connector_catalog_session(spark, capsys):
    """A multi-statement CLI batch driving the memory catalog end-to-end
    (Console.executeCommand splits on ';' and runs sequentially)."""
    rc = cli.main([
        "--sf-dir", "/root/testdata/sf0.001",
        "-e",
        "DROP TABLE IF EXISTS memory.default.cli_t; "
        "CREATE TABLE memory.default.cli_t AS "
        "SELECT r_regionkey, r_name FROM region; "
        "SELECT count(*) AS n FROM memory.default.cli_t; "
        "DROP TABLE memory.default.cli_t",
        "--output-format", "CSV_HEADER",
    ])
    assert rc == 0
    assert "n\n5\n" in capsys.readouterr().out


def test_batch_show_catalogs(spark, capsys):
    rc = cli.main([
        "--sf-dir", "/root/testdata/sf0.001",
        "-e", "SHOW CATALOGS LIKE 'mem%'",
        "--output-format", "CSV_HEADER",
    ])
    assert rc == 0
    assert capsys.readouterr().out == "Catalog\nmemory\n"
