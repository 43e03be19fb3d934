"""Command-line drivers mirroring the reference's two entry points.

* ``cc`` — the E2E components driver (reference CCDriver.scala:40-79):
  read whitespace-separated cliques text, run alternating-star CC,
  write ``"<size> <min> <sorted members...>"`` roster text.
* ``generate`` — the synthetic-data CLI (reference
  CliquesGenerator.scala:115-139): emit cliques text plus the
  ``<out>_cc`` ground-truth roster file.

Usage::

    python -m connected_component_spark.cli cc INPUT OUTPUT_DIR \
        [--max-iterations 20] [--master local[4]]
    python -m connected_component_spark.cli generate \
        --cliques-count 1000 --max-nodes-per-component 100 OUTPUT
"""

from __future__ import annotations

import argparse
import sys


def _cmd_cc(args: argparse.Namespace) -> int:
    from connected_component_spark.graph.cc import (
        component_rosters,
        connected_components,
    )
    from connected_component_spark.graph.cliques import (
        cliques_to_edges,
        format_rosters_text,
        read_cliques_text,
    )
    from connected_component_spark.session import get_spark

    spark = get_spark(app_name="cc-driver", master=args.master)
    cliques = read_cliques_text(spark, args.input)
    result = connected_components(
        cliques_to_edges(cliques), max_iterations=args.max_iterations
    )
    # reference returns null RDD + didConverge=false past the cap
    # (ConnectedComponent.scala:277); we fail loudly instead
    if not result.converged:
        print(
            f"did not converge within {args.max_iterations} iterations",
            file=sys.stderr,
        )
        return 2
    rosters = component_rosters(result.assignments)
    (
        format_rosters_text(rosters)
        .coalesce(max(1, args.output_partitions))
        .write.mode("overwrite")
        .text(args.output)
    )
    print(f"converged in {result.iterations} iterations -> {args.output}")
    return 0


def _cmd_generate(args: argparse.Namespace) -> int:
    from connected_component_spark.graph.generator import generate_clique_chains

    cliques, truth = generate_clique_chains(
        cliques_count=args.cliques_count,
        max_nodes_per_component=args.max_nodes_per_component,
        seed=args.seed,
    )
    with open(args.output, "w") as fh:
        for clique in cliques:
            fh.write(" ".join(str(n) for n in clique) + "\n")
    # ground-truth twin file (reference CliquesGenerator.scala:135-138)
    with open(args.output + "_cc", "w") as fh:
        for comp, members in truth:
            fh.write(
                f"{len(members)} {comp} " + " ".join(str(n) for n in members) + "\n"
            )
    print(f"{len(cliques)} cliques, {len(truth)} components -> {args.output}[_cc]")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="connected_component_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    cc = sub.add_parser("cc", help="cliques text -> component rosters text")
    cc.add_argument("input")
    cc.add_argument("output")
    cc.add_argument("--max-iterations", type=int, default=20)
    cc.add_argument("--master", default=None)
    cc.add_argument("--output-partitions", type=int, default=1)
    cc.set_defaults(func=_cmd_cc)

    gen = sub.add_parser("generate", help="synthetic clique chains + ground truth")
    gen.add_argument("output")
    gen.add_argument("--cliques-count", type=int, default=1000)
    gen.add_argument("--max-nodes-per-component", type=int, default=100)
    gen.add_argument("--seed", type=int, default=19345)
    gen.set_defaults(func=_cmd_generate)

    args = p.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
