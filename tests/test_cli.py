"""CLI driver round-trip: generate → cc → output equals the
generator's ground truth (the reference's generator-as-oracle
pattern, CliquesGenerator.scala:71-72 / CCDriver.scala:74)."""

from __future__ import annotations

import os

from connected_component_spark.cli import main


def test_generate_and_cc_roundtrip(spark, tmp_path):
    gen = str(tmp_path / "gen.txt")
    out = str(tmp_path / "out")
    assert main([
        "generate", gen, "--cliques-count", "50",
        "--max-nodes-per-component", "40",
    ]) == 0
    assert os.path.exists(gen) and os.path.exists(gen + "_cc")

    # in-process: getOrCreate reuses the test session
    assert main(["cc", gen, out]) == 0
    produced = []
    for part in os.listdir(out):
        if part.startswith("part-"):
            with open(os.path.join(out, part)) as fh:
                produced += [ln.strip() for ln in fh if ln.strip()]
    with open(gen + "_cc") as fh:
        expected = [ln.strip() for ln in fh if ln.strip()]
    assert sorted(produced) == sorted(expected)
