"""Command-line interface: index / dist / place / inspect / sketch / seek.

Mirrors the reference's CLI surface, defaults and validation
(ref: src/krepp.cpp:508-800) on top of the TPU-native engines.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

from . import REFERENCE_VERSION, __version__, configure


def _invocation() -> str:
    return " ".join(sys.argv)


def build_parser() -> argparse.ArgumentParser:
    # add_help=False frees -h for --num-positions, matching the reference
    # which only registers --help (ref: src/krepp.cpp:682)
    p = argparse.ArgumentParser(
        prog="krepp-tpu", add_help=False,
        description="krepp-tpu: TPU-native k-mer-based search, distance "
                    "estimation & phylogenetic placement.")
    p.add_argument("--help", action="help")
    # default=None mirrors the reference: the mt19937 is only reseeded when
    # --seed is explicitly given (ref: src/krepp.cpp:688-693); without it the
    # default-constructed generator (seed 5489) draws the LSH positions.
    p.add_argument("--seed", type=int, default=None,
                   help="Random seed for the LSH and other parts that require "
                        "randomness. [0]")
    p.add_argument("--num-threads", type=int, default=1,
                   help="Number of host worker threads for IO/parse. [1]")
    p.add_argument("--trace-dir", default=None,
                   help="Write a JAX profiler trace of the run to this "
                        "directory (view with TensorBoard / xprof).")
    p.add_argument("--verbose", action="store_true")
    sub_kw = dict(add_help=False)
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_sub(name, **kw):
        sc = sub.add_parser(name, add_help=False, **kw)
        sc.add_argument("--help", action="help")
        return sc

    def add_lsh_opts(sc, k_def, h_note):
        sc.add_argument("-k", "--kmer-len", type=int, default=k_def,
                        help=f"Length of k-mers. [{k_def}]")
        sc.add_argument("-w", "--win-len", type=int, default=None,
                        help="Length of minimizer window (w>=k). [k+6]")
        sc.add_argument("-h", "--num-positions", type=int, default=None,
                        dest="num_positions",
                        help=f"Number of positions for the LSH. [{h_note}]")
        sc.add_argument("-m", "--modulo-lsh", type=int, default=4,
                        help="Modulo value to partition LSH space. [4]")
        sc.add_argument("-r", "--residue-lsh", type=int, default=1,
                        help="A k-mer x will be included only if "
                             "r = LSH(x) mod m. [1]")
        frac = sc.add_mutually_exclusive_group()
        frac.add_argument("--frac", dest="frac", action="store_true",
                          default=True,
                          help="Include k-mers with r <= LSH(x) mod m. [true]")
        frac.add_argument("--no-frac", dest="frac", action="store_false")
        sc.add_argument("--sdust-t", type=int, default=0,
                        help="SDUST threshold (NCBI dustmasker: 20). [0]")
        sc.add_argument("--sdust-w", type=int, default=0,
                        help="SDUST window (NCBI dustmasker: 64). [0]")

    sc = add_sub("index",
                 help="Build an index from k-mers of reference genomes.")
    sc.add_argument("-i", "--input-file", required=True,
                    help="TSV file mapping reference IDs to paths.")
    sc.add_argument("-o", "--index-dir", required=True,
                    help="Directory in which the index will be stored.")
    sc.add_argument("-t", "--nwk-file", default=None,
                    help="Newick file for the guide tree (must be rooted).")
    add_lsh_opts(sc, 29, "k-16")
    sc.add_argument("--export-reference-format", action="store_true",
                    help="Also write the reference binary artifact files.")
    sc.add_argument("--mesh", type=int, default=0, dest="mesh",
                    help="Winnow genomes data-parallel across this many "
                         "devices (0 = sequential single-device build).")
    sc.add_argument("--partial", action="store_true",
                    help="Write a suffixed partial artifact so independently"
                         " built residues (e.g. -r 0/-r 1 with --no-frac) "
                         "can share one directory and combine at load.")

    sc = add_sub("dist",
                 help="Estimate distances of queries to genomes in an index.")
    _add_query_opts(sc)
    sc.add_argument("--dist-max", type=float, default=math.nan,
                    help="Maximum distance to report for matching references.")
    _add_multi_filter(sc, multi_def=True, filter_def=False)

    sc = add_sub("place",
                 help="Place queries on a tree with respect to an index.")
    _add_query_opts(sc)
    sc.add_argument("-t", "--nwk-file", default=None,
                    help="Newick file for the (rooted) placement tree.")
    sc.add_argument("-l", "--lineage-file", default=None,
                    help="GTDB-style taxonomic lineage file.")
    sc.add_argument("--tau", type=int, default=2,
                    help="Highest Hamming distance for placement threshold. [2]")
    _add_multi_filter(sc, multi_def=True, filter_def=True)
    tab = sc.add_mutually_exclusive_group()
    tab.add_argument("--tabular", dest="tabular", action="store_true",
                     default=False,
                     help="Output per-query placements in TSV. [false]")
    tab.add_argument("--no-tabular", dest="tabular", action="store_false")

    sc = add_sub("inspect",
                 help="Display statistics and information for an index.")
    sc.add_argument("-i", "--index-dir", required=True)

    sc = add_sub("sketch",
                 help="Create a sketch from k-mers in a single FASTA/FASTQ file.")
    sc.add_argument("-i", "--input-file", required=True)
    sc.add_argument("-o", "--output-path", required=True,
                    help="Path to store the resulting binary sketch file.")
    add_lsh_opts(sc, 26, "k-16")

    sc = add_sub("seek",
                 help="Seek query sequences in a sketch and estimate distances.")
    sc.add_argument("-q", "--query", required=True)
    sc.add_argument("-i", "--sketch-path", required=True)
    sc.add_argument("-o", "--output-path", default=None)
    sc.add_argument("--hdist-th", type=int, default=4,
                    help="Maximum Hamming distance for a k-mer to match. [4]")
    return p


def _mh_context():
    """(process_index, process_count); (0, 1) when not distributed."""
    import jax

    try:
        return jax.process_index(), jax.process_count()
    except Exception:  # noqa: BLE001 - backend without process support
        return 0, 1


def _mesh_factory(spec):
    """--mesh DATAxSHARD -> engine factory.

    Single process: ShardedQueryEngine over the local devices. Under
    jax.distributed (KREPP_NUM_PROCESSES/KREPP_COORDINATOR env — one
    process per host): MultiHostQueryEngine over the GLOBAL device mesh,
    every process running the same SPMD program (SURVEY §5.8)."""
    if not spec:
        return None
    nd, ns = (int(x) for x in spec.lower().split("x"))

    def factory(dindex, hdist_th):
        import jax

        from .parallel.mesh import ShardedQueryEngine, make_query_mesh

        if _mh_context()[1] > 1:
            from .parallel.multihost import MultiHostQueryEngine

            return MultiHostQueryEngine(
                dindex, make_query_mesh(nd, ns, devices=jax.devices()),
                hdist_th)
        return ShardedQueryEngine(dindex, make_query_mesh(nd, ns), hdist_th)

    return factory


def _add_query_opts(sc):
    sc.add_argument("-q", "--query", required=True,
                    help="Query FASTA/FASTQ file.")
    sc.add_argument("-i", "--index-dir", required=True,
                    help="Directory containing the reference index.")
    sc.add_argument("-o", "--output-path", default=None,
                    help="Write output to a file. [stdout]")
    sc.add_argument("--hdist-th", type=int, default=4,
                    help="Maximum Hamming distance for a k-mer to match. [4]")
    sc.add_argument("--chisq", type=float, default=2.706, dest="chisq_value",
                    help="Chi-square value for the distinguishability test. [2.706]")
    sc.add_argument("--mesh", default=None,
                    help="Device mesh DATAxSHARD for multi-chip querying "
                         "(e.g. 2x4: reads data-parallel over 2, index "
                         "row-sharded over 4). [single device]")
    sm = sc.add_mutually_exclusive_group()
    sm.add_argument("--summarize", dest="summarize", action="store_true",
                    default=False,
                    help="Summarize results into a table of read counts.")
    sm.add_argument("--no-summarize", dest="summarize", action="store_false")


def _add_multi_filter(sc, multi_def, filter_def):
    mg = sc.add_mutually_exclusive_group()
    mg.add_argument("--multi", dest="multi", action="store_true",
                    default=multi_def)
    mg.add_argument("--no-multi", dest="multi", action="store_false")
    fg = sc.add_mutually_exclusive_group()
    fg.add_argument("--filter", dest="filter", action="store_true",
                    default=filter_def)
    fg.add_argument("--no-filter", dest="filter", action="store_false")


def _load_index(index_dir: str):
    """Native format preferred; falls back to reference binary format."""
    import os

    from .index import artifact

    if (os.path.exists(os.path.join(index_dir, "meta.json"))
            or artifact._scan_native_partials(index_dir)):
        return artifact.load_native_device(index_dir)
    return artifact.load_index_reference(index_dir)


def _out_stream(path):
    return open(path, "w") if path else sys.stdout


def main(argv=None) -> int:
    print(f"krepp-tpu version: {__version__} "
          f"(reference-compatible: krepp {REFERENCE_VERSION})", file=sys.stderr)
    args = build_parser().parse_args(argv)
    if os.environ.get("KREPP_NUM_PROCESSES") or os.environ.get(
            "KREPP_COORDINATOR"):
        # multi-host run: one process per host; must precede any call that
        # initialises the XLA backend
        from .parallel.boot import init_distributed

        init_distributed()
    configure()
    inv = _invocation()
    t0 = time.time()
    print(f"Invocation: {inv}", file=sys.stderr)

    if getattr(args, "dist_max", None) is not None and not (
            args.dist_max != args.dist_max):  # not NaN
        if not (1e-8 <= args.dist_max <= 0.33):
            raise SystemExit("--dist-max must be in [1e-08, 0.33]")
    import contextlib

    trace = contextlib.nullcontext()
    if args.trace_dir:
        import jax

        trace = jax.profiler.trace(args.trace_dir)
    with trace:
        if args.cmd == "index":
            cmd_index(args)
        elif args.cmd == "dist":
            cmd_dist(args, inv)
        elif args.cmd == "place":
            cmd_place(args, inv)
        elif args.cmd == "inspect":
            cmd_inspect(args)
        elif args.cmd == "sketch":
            cmd_sketch(args)
        elif args.cmd == "seek":
            cmd_seek(args, inv)
    print(f"Done, elapsed: {time.time() - t0:.2f} sec", file=sys.stderr)
    return 0


def _make_params(args, sketch=False):
    from .params import IndexParams, LSHParams, validate_lsh_config

    k = args.kmer_len
    w = args.win_len if args.win_len is not None else k + 6
    h = args.num_positions if args.num_positions is not None else k - 16
    validate_lsh_config(k, h, w)
    return IndexParams(lsh=LSHParams.generate(k, h, args.modulo_lsh,
                                              seed=args.seed),
                       w=w, r=args.residue_lsh, frac=args.frac,
                       sdust_t=args.sdust_t, sdust_w=args.sdust_w)


def cmd_index(args):
    from .index import artifact
    from .index.build import build_index
    from .tree.newick import Tree

    params = _make_params(args)
    input_map = []
    with open(args.input_file) as f:
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 2:
                if line.strip():
                    raise SystemExit(
                        "Failed to read the reference name to path/URL mapping!")
                continue
            input_map.append((parts[0], parts[1]))
    tree = None
    if args.nwk_file:
        tree = Tree.parse(open(args.nwk_file).read())
        tree.nwk_str = open(args.nwk_file).read()
    print("Building the index...", file=sys.stderr)
    if getattr(args, "mesh", 0):
        import jax

        from .parallel.build import build_index_sharded

        built = build_index_sharded(input_map, params, tree,
                                    devices=jax.devices()[: args.mesh])
    else:
        built = build_index(input_map, params, tree,
                            num_threads=max(1, args.num_threads))
    print(f"\nTotal number of k-mers indexed: {built.nkmers}", file=sys.stderr)
    artifact.save_native(built, args.index_dir, seed=args.seed or 0,
                         partial=getattr(args, "partial", False))
    if args.export_reference_format:
        artifact.save_index_reference(built, args.index_dir,
                                      seed=args.seed or 0)


def _mh_output(args, sliceable: bool):
    """Multi-host emission policy: with -o and a sliceable report each rank
    writes its read-slice to PATH.rank{pid}; otherwise rank 0 emits the
    full output and other ranks stay silent."""
    pid, pcount = _mh_context()
    if pcount <= 1:
        return args.output_path, None
    if args.output_path and sliceable:
        return f"{args.output_path}.rank{pid}", (pid, pcount)
    return (args.output_path if pid == 0 else os.devnull), None


def cmd_dist(args, inv):
    from .query.dist import DistConfig, run_dist

    di = _load_index(args.index_dir)
    out_path, emit_slice = _mh_output(args, sliceable=not args.summarize)
    cfg = DistConfig(hdist_th=args.hdist_th, chisq_value=args.chisq_value,
                     dist_max=args.dist_max, multi=args.multi,
                     no_filter=not args.filter, summarize=args.summarize,
                     emit_slice=emit_slice)
    out = _out_stream(out_path)
    try:
        n = run_dist(di, args.query, out, inv, cfg,
                     engine_factory=_mesh_factory(args.mesh))
    finally:
        if out is not sys.stdout:
            out.close()
    print(f"Total number of sequences queried: {n}", file=sys.stderr)


def cmd_place(args, inv):
    from .query.place import PlaceConfig, run_place
    from .tree.newick import Tree

    di = _load_index(args.index_dir)
    qtree = None
    if args.lineage_file:
        qtree = Tree.parse_lineages(open(args.lineage_file).read())
    elif args.nwk_file:
        qtree = Tree.parse(open(args.nwk_file).read())
    elif not di.wbackbone:
        raise SystemExit(
            "Given index lacks a tree and no backbone tree is provided...")
    if args.hdist_th < args.tau:
        raise SystemExit("The threshold tau must be less than --hdist-th!")
    out_path, emit_slice = _mh_output(args, sliceable=not args.summarize)
    cfg = PlaceConfig(hdist_th=args.hdist_th, chisq_value=args.chisq_value,
                      tau=args.tau, multi=args.multi,
                      no_filter=not args.filter, summarize=args.summarize,
                      tabular=args.tabular, emit_slice=emit_slice)
    out = _out_stream(out_path)
    try:
        n = run_place(di, args.query, out, inv, cfg, qtree=qtree,
                      engine_factory=_mesh_factory(args.mesh))
    finally:
        if out is not sys.stdout:
            out.close()
    print(f"Total number of sequences queried: {n}", file=sys.stderr)


def cmd_inspect(args):
    from .inspect import display_info

    di = _load_index(args.index_dir)
    display_info(di, sys.stdout)


def cmd_sketch(args):
    from .index import artifact
    from .index.build import build_sketch

    params = _make_params(args, sketch=True)
    built = build_sketch(args.input_file, params)
    artifact.save_sketch_reference(built, args.output_path)


def cmd_seek(args, inv):
    from .index import artifact
    from .query.seek import run_seek

    sk = artifact.load_sketch_reference(args.sketch_path)
    out = _out_stream(args.output_path)
    try:
        n = run_seek(sk, args.query, out, inv, hdist_th=args.hdist_th)
    finally:
        if out is not sys.stdout:
            out.close()
    print(f"Total number of sequences queried: {n}", file=sys.stderr)


if __name__ == "__main__":
    sys.exit(main())
