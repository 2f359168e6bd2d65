"""Command-line entry point — the analogue of the reference's
``hadoop jar mf.jar main <variant> -D mf.k=v ...`` dispatch
(main.java:10-52): parse options, build the graph from the named input,
run the query, write/print results.

    python -m pysparkflow.cli maxflow --edges e.parquet --sources 1,2 --sinks 9 [--out DIR]
    python -m pysparkflow.cli maxflow --dimacs g.max [--out DIR]
    python -m pysparkflow.cli bfs     --adjacency crawl.tsv.gz --sources 1,2
    python -m pysparkflow.cli components --edges e.parquet

Negative vertex ids (id folding produces them): argparse rejects a
separate "-5,-9" token as an option, so use the ``=`` form —
``--sources=-5,-9`` — or quote a leading space: ``--sources ' -5,-9'``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ids(s: str) -> list[int]:
    return [int(x) for x in s.strip().split(",") if x.strip()]


def _build_graph(spark, args):
    from pysparkflow.io.adjacency import read_adjacency
    from pysparkflow.io.dimacs import read_dimacs
    from pysparkflow.io.edgelist import read_edgelist

    if args.dimacs:
        dg = read_dimacs(spark, args.dimacs)
        return dg.graph, dg.sources, dg.sinks
    if args.adjacency:
        g = read_adjacency(spark, args.adjacency, max_cap=args.max_cap)
        return g, None, None
    if args.edges:
        g = read_edgelist(
            spark, args.edges, cap_col=args.cap_col, max_cap=args.max_cap
        )
        return g, None, None
    raise SystemExit("one of --edges / --dimacs / --adjacency is required")


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pysparkflow")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name in ("maxflow", "bfs", "components"):
        c = sub.add_parser(name)
        c.add_argument("--edges", help="edge-list parquet (src,dst[,cap])")
        c.add_argument("--dimacs", help="DIMACS max-flow text file")
        c.add_argument("--adjacency", help="adjacency TSV[.gz] (Facebook-crawl format)")
        c.add_argument("--cap-col", default=None, help="capacity column in --edges")
        c.add_argument("--max-cap", type=int, default=1, help="deterministic random cap range (mf.* D2)")
        c.add_argument(
            "--sources", type=_ids, default=None,
            help="comma-separated ids; for negative ids use --sources=-5,-9",
        )
        c.add_argument(
            "--sinks", type=_ids, default=None,
            help="comma-separated ids; for negative ids use --sinks=-5,-9",
        )
        c.add_argument("--out", default=None, help="output directory (parquet + summary.json)")
        c.add_argument("--k", type=int, default=1, help="excess list max (mf.excess.list.max)")
        c.add_argument("--meet-extra-rounds", type=int, default=2)
        c.add_argument("--approx", type=float, default=None, help="mf.approx early stop")
        c.add_argument("--validate", action="store_true")
        c.add_argument("--master", default=None)

    q = sub.add_parser("query", help="run a named registry query")
    q.add_argument("name", help="query name from the registry (or 'list')")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--limit", type=int, default=20)
    q.add_argument("--master", default=None)

    args = p.parse_args(argv)
    from pysparkflow.session import get_spark

    if args.cmd == "query":
        from pysparkflow.relational.registry import QUERIES

        if args.name == "list":
            print("\n".join(sorted(QUERIES)))
            return 0
        if args.name not in QUERIES:
            raise SystemExit(
                f"unknown query {args.name!r}; try: python -m pysparkflow.cli query list"
            )
        spark = get_spark(app_name=f"pysparkflow-q-{args.name}", master=args.master)
        QUERIES[args.name](spark, args.sf_dir).show(args.limit, truncate=False)
        return 0

    spark = get_spark(app_name=f"pysparkflow-{args.cmd}", master=args.master)
    graph, file_sources, file_sinks = _build_graph(spark, args)
    sources = args.sources or file_sources
    sinks = args.sinks or file_sinks

    if args.cmd == "maxflow":
        from pysparkflow.algo.maxflow import MaxFlowConfig, max_flow
        from pysparkflow.io.writers import write_flow_result

        if not sources or not sinks:
            raise SystemExit("maxflow needs --sources and --sinks (or a DIMACS file)")
        res = max_flow(
            graph,
            sources,
            sinks,
            MaxFlowConfig(
                excess_list_max=args.k,
                meet_extra_rounds=args.meet_extra_rounds,
                approx=args.approx,
                validate=args.validate,
            ),
        )
        if args.out:
            write_flow_result(res, args.out)
        print(json.dumps({"max_flow": res.value, **res.metrics.as_dict()}))
    elif args.cmd == "bfs":
        from pysparkflow.algo.bfs import bfs_distances

        if not sources:
            raise SystemExit("bfs needs --sources")
        out = bfs_distances(graph, sources)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"reached": out.count()}))
    elif args.cmd == "components":
        from pysparkflow.algo.components import connected_components

        out = connected_components(graph)
        n_comp = out.select("component").distinct().count()
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"vertices": out.count(), "components": n_comp}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
