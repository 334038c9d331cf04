"""Copy-CLI tests: the reference's invocation surface end to end."""

from __future__ import annotations

from copy_databasetables_spark.__main__ import main
from tests.conftest import SF_SMOKE

OUT = "/tmp/spark_graft_test_cli"


def test_cli_happy_path(spark, capsys):
    rc = main(
        ["--source", SF_SMOKE, "--target", OUT, "--tables", "orders", "region"]
    )
    out = capsys.readouterr().out
    assert rc == 0
    # FK order restored: region line printed before orders
    assert out.index("copied region") < out.index("copied orders")
    assert "1500 rows" in out and "verified" in out


def test_cli_unknown_table(spark, capsys):
    rc = main(["--source", SF_SMOKE, "--target", OUT, "--tables", "nope"])
    assert rc == 2
    assert "unknown table" in capsys.readouterr().err


def test_cli_unreadable_source(spark, capsys):
    rc = main(["--source", "/root/testdata/nope", "--target", OUT])
    assert rc == 3
    assert "FAILED" in capsys.readouterr().err
