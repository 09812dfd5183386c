"""CLI entry points: build an index, query it, synth a corpus.

The reference's CLI surface is `python main.py --input_text ... / --file ...`
(reference: src/main.py:31-48) plus a Flask webservice (rest.py).  Here:

    python -m horus_ner_ray synth  --out DIR --convs N [--seed S]
    python -m horus_ner_ray build  --corpus DIR --index DIR [--shards N]
                                   [--positions] [--mode rank|hash|provided]
    python -m horus_ner_ray query  --index DIR --text "..." [-k 10]
                                   [--mode or|and|phrase]
    python -m horus_ner_ray stats  --index DIR

These own a Ray session (guarded init) — the importable library never
calls ray.init (driver contract).
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_up(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="horus_ner_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth")
    ps.add_argument("--out", required=True)
    ps.add_argument("--convs", type=int, default=1000)
    ps.add_argument("--seed", type=int, default=42)

    pb = sub.add_parser("build")
    pb.add_argument("--corpus", required=True)
    pb.add_argument("--index", required=True)
    pb.add_argument("--shards", type=int, default=16)
    pb.add_argument("--positions", action="store_true")
    pb.add_argument("--mode", default="rank", choices=["rank", "hash", "provided"])

    pq_ = sub.add_parser("query")
    pq_.add_argument("--index", required=True)
    pq_.add_argument("--text", required=True)
    pq_.add_argument("-k", type=int, default=10)
    pq_.add_argument("--mode", default="or",
                     choices=["or", "and", "phrase",
                              "prefix", "fuzzy", "contains"])
    pq_.add_argument("--exclude", default=None,
                     help="boolean-NOT terms (or/and modes)")

    pv = sub.add_parser("serve")
    pv.add_argument("--index", required=True)
    pv.add_argument("--host", default="127.0.0.1")
    pv.add_argument("--port", type=int, default=0)
    pv.add_argument("--actors", type=int, default=4)

    pst = sub.add_parser("stats")
    pst.add_argument("--index", required=True)

    a = p.parse_args(argv)

    if a.cmd == "synth":
        from horus_ner_ray.synth import synth_transcripts

        out = synth_transcripts(a.out, n_convs=a.convs, seed=a.seed)
        print(json.dumps({"corpus": str(out), "n_convs": a.convs}))
        return 0

    if a.cmd == "build":
        import ray

        from horus_ner_ray.config import PipelineConfig
        from horus_ner_ray.pipelines.build_index import build_index
        from horus_ner_ray.synth import transcript_files

        files = transcript_files(a.corpus)
        if not files:
            import glob

            files = sorted(glob.glob(f"{a.corpus}/*.parquet"))
        if not files:
            print(f"error: no parquet files found in {a.corpus!r}", file=sys.stderr)
            return 2
        _ray_up(a.num_cpus)
        cfg = PipelineConfig(
            num_shards=a.shards, with_positions=a.positions, doc_id_mode=a.mode
        )
        res = build_index(files, a.index, cfg)
        print(json.dumps(res.__dict__))
        ray.shutdown()
        return 0

    if a.cmd == "query":
        from horus_ner_ray.pipelines.query import QueryEngine

        eng = QueryEngine(a.index)  # pure mmap reads — no Ray needed
        if a.mode == "phrase":
            hits = eng.search_phrase(a.text, a.k)
        elif a.mode == "prefix":
            hits = eng.search_prefix(a.text, a.k)
        elif a.mode == "fuzzy":
            hits = eng.search_fuzzy(a.text, a.k)
        elif a.mode == "contains":
            hits = eng.search_contains(a.text, a.k)
        else:
            hits = eng.search(a.text, a.k, mode=a.mode, exclude=a.exclude)
        print(json.dumps([{"rank": i + 1, "doc_id": d, "score": s}
                          for i, (d, s) in enumerate(hits)]))
        return 0

    if a.cmd == "serve":
        import ray

        from horus_ner_ray.serve import make_http_server

        _ray_up(a.num_cpus)
        server, service = make_http_server(
            a.index, host=a.host, port=a.port, n_actors=a.actors)
        print(json.dumps({"listening": server.server_address}), flush=True)
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            pass
        server.shutdown()
        service.close()
        ray.shutdown()
        return 0

    if a.cmd == "stats":
        from horus_ner_ray.state.shards import IndexPaths

        print(IndexPaths(a.index).stats_json.read_text())
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
