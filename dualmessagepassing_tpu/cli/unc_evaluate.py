"""UNC downstream evaluation CLI — reference Evaluate/evaluate.py.

Evaluates saved embeddings (emb.dat) on node classification (5-fold
LinearSVC, single- or multi-label) and/or link prediction (AUC + MRR).
The reference hardcodes an HNE folder layout and keys multi-label on
dataset == Yelp (evaluate.py:8-28, node_classification.py:18-29); here
every file is an explicit flag and multi-label is ``--multi True``.

python -m dualmessagepassing_tpu.cli.unc_evaluate \\
    --task both --emb_file emb.dat --label_file label.dat \\
    --label_test_file label.dat.test --link_test_file link.dat.test
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from ..unc.evaluate import load_emb_dict, lp_evaluate, nc_evaluate
    from ..utils.io import str2bool

    p = argparse.ArgumentParser("unc-evaluate")
    p.add_argument("--task", type=str, required=True,
                   choices=["nc", "lp", "both"])
    p.add_argument("--emb_file", type=str, required=True)
    p.add_argument("--label_file", type=str, default="")
    p.add_argument("--label_test_file", type=str, default="")
    p.add_argument("--link_test_file", type=str, default="")
    p.add_argument("--supervised", type=str2bool, default=False)
    p.add_argument("--multi", type=str2bool, default=False,
                   help="multi-label nc (the reference's Yelp protocol)")
    p.add_argument("--record_file", type=str, default="")
    args = p.parse_args(argv)

    emb_dict = load_emb_dict(args.emb_file)
    results = {}
    if args.task in ("nc", "both"):
        if not (args.label_file and args.label_test_file):
            p.error("nc requires --label_file and --label_test_file")
        macro, micro = nc_evaluate(args.label_file, args.label_test_file,
                                   emb_dict, supervised=args.supervised,
                                   multi=args.multi)
        results["nc"] = {"Macro-F1": macro, "Micro-F1": micro}
        print(f"Macro-F1={macro:.4f}, Micro-F1={micro:.4f}")
    if args.task in ("lp", "both"):
        if not args.link_test_file:
            p.error("lp requires --link_test_file")
        auc, mrr = lp_evaluate(args.link_test_file, emb_dict)
        results["lp"] = {"AUC": auc, "MRR": mrr}
        print(f"AUC={auc:.4f}, MRR={mrr:.4f}")
    if args.record_file:
        with open(args.record_file, "a") as f:
            f.write(json.dumps({"emb_file": args.emb_file, **results}) + "\n")
    return results


if __name__ == "__main__":
    main()
