"""Command-line interface mirroring the reference `bonsai` subcommands
(/root/reference/bin/bonsai.cpp:521-540): classify, build/phase2,
prebuild/phase1, hist, plus the standalone lca/taxmap tools
(bin/lca.cpp, bin/taxmap.cpp).  Flags mirror the reference getopt strings
1:1 where they exist (-k, -w, -S spacing, -e/-t/-f minimization mode, -C
no-canonicalize, -T nodes.dmp, -M nameidmap, -z gzip, -F paths-file, -o out).
"""

from __future__ import annotations

import argparse
import sys
from typing import List

import numpy as np


def _add_classify(sub):
    p = sub.add_parser("classify", help="classify reads against a database")
    p.add_argument("db")
    p.add_argument("tax_path")
    p.add_argument("reads")
    p.add_argument("mate", nargs="?", default=None)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("-c", "--chunk-size", type=int, default=4096)
    p.add_argument("-a", "--emit-all", action="store_true")
    p.add_argument("-k", "--kraken", dest="kraken", action="store_true", default=True)
    p.add_argument("-K", "--no-kraken", dest="kraken", action="store_false")
    p.add_argument("-f", "--fastq", action="store_true")
    p.add_argument("-C", "--no-canon", action="store_true")
    return p


def _add_build(sub, name, aliases):
    p = sub.add_parser(name, aliases=aliases, help="build phase-2 (classify) database")
    p.add_argument("out_path")
    p.add_argument("paths", nargs="*")
    p.add_argument("-k", type=int, default=31)
    p.add_argument("-w", type=int, default=-1)
    p.add_argument("-S", "--spacing", default="")
    p.add_argument("-T", "--tax-path", required=True, help="nodes.dmp")
    p.add_argument("-M", "--seq2tax", required=True, help="name<TAB>taxid map")
    p.add_argument("-F", "--paths-file", default=None)
    p.add_argument("-C", "--no-canon", action="store_true")
    p.add_argument("-e", "--entropy", action="store_true", help="entropy minimization")
    p.add_argument("-t", "--tax-depth", action="store_true", help="phase1-driven, tax-depth scores")
    p.add_argument("-f", "--feature-count", action="store_true", help="phase1-driven, feature-count scores")
    p.add_argument("-z", "--gzip", action="store_true")
    p.add_argument("--phase1-db", default=None, help="phase-1 DB for -t/-f modes")
    p.add_argument("--bonsai-format", action="store_true", help="write reference khash format")
    return p


def _add_prebuild(sub):
    p = sub.add_parser("prebuild", aliases=["p1", "phase1"], help="build phase-1 score map")
    p.add_argument("seq2tax")
    p.add_argument("tax_path")
    p.add_argument("out_path")
    p.add_argument("paths", nargs="*")
    p.add_argument("-k", type=int, default=31)
    p.add_argument("-S", "--spacing", default="")
    p.add_argument("-C", "--no-canon", action="store_true")
    p.add_argument("-t", "--tax-depth", action="store_true")
    p.add_argument("-f", "--feature-count", action="store_true")
    p.add_argument("-F", "--paths-file", default=None)
    return p


def _paths(args) -> List[str]:
    if getattr(args, "paths_file", None):
        with open(args.paths_file) as fh:
            return [l.strip() for l in fh if l.strip()]
    return list(args.paths)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="bonsai-tpu")
    ap.add_argument("-v", "--version", action="store_true")
    sub = ap.add_subparsers(dest="cmd")
    _add_classify(sub)
    _add_build(sub, "build", ["p2", "phase2"])
    _add_prebuild(sub)

    p = sub.add_parser("hist", help="taxid -> kmer-count histogram of a database")
    p.add_argument("db")
    p.add_argument("out", nargs="?", default=None)

    p = sub.add_parser("lca", help="LCA of taxids")
    p.add_argument("tax_path")
    p.add_argument("taxids", nargs="+", type=int)

    p = sub.add_parser("taxmap", help="build + save a name->taxid map")
    p.add_argument("nameidmap")
    p.add_argument("out")

    args = ap.parse_args(argv)
    if args.version:
        from . import __version__

        print(f"bonsai-tpu|{__version__}")
        return 0
    if args.cmd is None:
        ap.print_help()
        return 1
    return globals()[f"_cmd_{args.cmd}"](args)


def _cmd_classify(args):
    from .classify.pipeline import Classifier
    from .db.formats import load_database, import_bonsai_database
    from .taxonomy.tree import TaxTree

    try:
        db = load_database(args.db)
    except ValueError:
        db = import_bonsai_database(args.db)
    tree = TaxTree.from_nodes_dmp(args.tax_path)
    clf = Classifier(
        db,
        tree,
        canonicalize=not args.no_canon,
        emit_all=args.emit_all,
        emit_kraken=args.kraken,
        emit_fastq=args.fastq,
    )
    out = open(args.out, "w") if args.out else sys.stdout
    try:
        clf.process_dataset(args.reads, out, mate_path=args.mate,
                            batch_size=args.chunk_size)
    finally:
        if args.out:
            out.close()
    print(
        f"classified: {clf.n_classified}  unclassified: {clf.n_unclassified}",
        file=sys.stderr,
    )
    return 0


def _cmd_build(args):
    from .core.spacer import Spacer, parse_spacing
    from .db.build import lca_map, minimized_map
    from .db.formats import Database, save_database, write_bonsai_database, load_database, import_bonsai_database
    from .taxonomy.tree import TaxTree

    k = args.k
    w = max(args.w, k)
    gaps = parse_spacing(args.spacing, k)
    sp = Spacer(k, w, gaps)
    tree = TaxTree.from_nodes_dmp(args.tax_path)
    paths = _paths(args)
    if not paths:
        print("no input genomes", file=sys.stderr)
        return 1
    canon = not args.no_canon
    if args.tax_depth or args.feature_count:
        if not args.phase1_db:
            print("-t/-f build requires --phase1-db", file=sys.stderr)
            return 1
        try:
            p1 = load_database(args.phase1_db)
        except ValueError:
            p1 = import_bonsai_database(args.phase1_db)
        table = minimized_map(paths, p1.table, tree, args.seq2tax, sp, canon)
        scheme = "hash"
    else:
        scheme = "entropy" if args.entropy else "lex"
        table = lca_map(paths, tree, args.seq2tax, sp, canon, scheme)
    db = Database(table=table, k=k, w=w, gaps=gaps, canonicalize=canon, scheme=scheme)
    if args.bonsai_format:
        write_bonsai_database(db, args.out_path, compress=args.gzip)
    else:
        save_database(db, args.out_path, compress="gz" if args.gzip else None)
    print(f"wrote {len(table)} kmers to {args.out_path}", file=sys.stderr)
    return 0


def _cmd_prebuild(args):
    from .core.spacer import Spacer, parse_spacing
    from .db.build import taxdepth_map, ftct_map
    from .db.formats import Database, save_database
    from .taxonomy.tree import TaxTree

    k = args.k
    gaps = parse_spacing(args.spacing, k)
    sp = Spacer(k, k, gaps)
    tree = TaxTree.from_nodes_dmp(args.tax_path)
    paths = _paths(args)
    canon = not args.no_canon
    if args.feature_count:
        table = ftct_map(paths, tree, args.seq2tax, sp, canon)
        scheme = "feature_count"
    else:
        table = taxdepth_map(paths, tree, args.seq2tax, sp, canon)
        scheme = "tax_depth"
    db = Database(table=table, k=k, w=k, gaps=gaps, canonicalize=canon, scheme=scheme)
    save_database(db, args.out_path)
    print(f"wrote {len(table)} kmers to {args.out_path}", file=sys.stderr)
    return 0


def _cmd_hist(args):
    """Histogram of kmers per taxid (bin/bonsai.cpp:351-374)."""
    from collections import Counter

    from .db.formats import load_database, import_bonsai_database

    try:
        db = load_database(args.db)
    except ValueError:
        db = import_bonsai_database(args.db)
    vals, counts = np.unique(db.table.vals_sorted, return_counts=True)
    order = np.argsort(counts, kind="stable")
    out = open(args.out, "w") if args.out else sys.stdout
    out.write("Name\tCount\n")
    for i in order:
        out.write(f"{vals[i]}\t{counts[i]}\n")
    if args.out:
        out.close()
    return 0


def _cmd_lca(args):
    from .taxonomy.tree import TaxTree

    tree = TaxTree.from_nodes_dmp(args.tax_path)
    acc = args.taxids[0]
    for t in args.taxids[1:]:
        acc = tree.lca(acc, t)
    print(acc)
    return 0


def _cmd_taxmap(args):
    import json

    from .taxonomy.ncbi import parse_nameid_map

    nm = parse_nameid_map(args.nameidmap)
    with open(args.out, "w") as fh:
        json.dump(nm, fh)
    print(f"wrote {len(nm)} names", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
