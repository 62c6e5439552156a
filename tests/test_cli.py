"""CLI front door: the sparkless paths (list, arg errors) — the run
path is exercised by everything else and kept out of unit tests to
avoid a second SparkSession spin-up."""

from __future__ import annotations

import pytest

from pandas_analysis_with_postgres_spark.__main__ import main


def test_list_prints_every_query(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q01_pricing_summary" in out and "oracle" in out
    assert "q35_media_features" in out and "rows-only" in out
    from pandas_analysis_with_postgres_spark.plans import QUERIES

    assert len(out.strip().splitlines()) == len(QUERIES)


def test_requires_subcommand():
    with pytest.raises(SystemExit):
        main([])
