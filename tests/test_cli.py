"""CLI dispatch tests — including the negative-id form the module
docstring documents (``--sources=-5,-9``; argparse rejects a separate
``-5,-9`` token as an option string)."""

from __future__ import annotations

import json

from pysparkflow.cli import _ids, main


def test_ids_parses_negatives_and_whitespace():
    assert _ids("-5,-9") == [-5, -9]
    assert _ids(" -5, -9 ") == [-5, -9]
    assert _ids("1,2,3") == [1, 2, 3]


def test_cli_maxflow_negative_ids(spark, tmp_path, capsys):
    edges = spark.createDataFrame(
        [(-5, -4, 3), (-4, 12, 2), (12, -9, 5), (-5, -9, 1)],
        "src long, dst long, cap long",
    )
    path = str(tmp_path / "neg_edges.parquet")
    edges.write.parquet(path)
    rc = main(
        [
            "maxflow",
            "--edges", path,
            "--cap-col", "cap",
            "--sources=-5",
            "--sinks=-9",
            "--validate",
        ]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["max_flow"] == 3
