"""UNC downstream evaluation CLI — reference Evaluate/evaluate.py.

Evaluates saved embeddings (emb.dat) on node classification (5-fold
LinearSVC, single- or multi-label) and/or link prediction (AUC + MRR).
The reference hardcodes an HNE folder layout and keys multi-label on
dataset == Yelp (evaluate.py:8-28, node_classification.py:18-29); here
every file can be an explicit flag and multi-label is ``--multi True``.
The reference's own command shape also parses verbatim: ``--dataset`` /
``--model`` derive the HNE-layout default paths (evaluate.py:117-133,
overridable via --data_folder/--model_folder) and ``--dataset Yelp``
selects the multi-label protocol when --multi is left on auto.

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
    p.add_argument("--emb_file", type=str, default="")
    p.add_argument("--label_file", type=str, default="")
    p.add_argument("--label_test_file", type=str, default="")
    p.add_argument("--link_test_file", type=str, default="")
    p.add_argument("--supervised", type=str2bool, default=False)
    p.add_argument("--multi", type=str, default="auto",
                   help="multi-label nc (the reference's Yelp protocol); "
                        "auto = True iff --dataset Yelp")
    p.add_argument("--record_file", type=str, default="")
    # reference-command compatibility (evaluate.py:14-47): --dataset and
    # --model derive the HNE folder-layout default paths for any file
    # flag left empty
    p.add_argument("--dataset", type=str, default="")
    p.add_argument("--model", type=str, default="")
    p.add_argument("--attributed", type=str, default="False",
                   help="accepted for reference-command compatibility "
                        "(recorded in --record_file lines only)")
    p.add_argument("--data_folder", type=str, default="../Data",
                   help="HNE layout root for --dataset-derived paths "
                        "(the reference hardcodes ../Data)")
    p.add_argument("--model_folder", type=str, default="../Model")
    args = p.parse_args(argv)

    # HNE-layout path derivation (reference evaluate.py:117-133)
    if not args.emb_file:
        if args.dataset and args.model:
            args.emb_file = (f"{args.model_folder}/{args.model}/data/"
                             f"{args.dataset}/emb.dat")
        else:
            p.error("--emb_file (or --dataset with --model) is required")
    if args.dataset:
        if not args.label_file:
            args.label_file = f"{args.data_folder}/{args.dataset}/label.dat"
        if not args.label_test_file:
            args.label_test_file = (f"{args.data_folder}/{args.dataset}/"
                                    "label.dat.test")
        if not args.link_test_file:
            args.link_test_file = (f"{args.data_folder}/{args.dataset}/"
                                   "link.dat.test")
    # Yelp = multi-label single-class protocol (node_classification.py:18-29)
    args.multi = (args.dataset == "Yelp" if args.multi == "auto"
                  else str2bool(args.multi))

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
        meta = {"emb_file": args.emb_file}
        if args.dataset:
            meta.update(dataset=args.dataset, model=args.model,
                        attributed=args.attributed,
                        supervised=str(args.supervised))
        with open(args.record_file, "a") as f:
            f.write(json.dumps({**meta, **results}) + "\n")
    return results


if __name__ == "__main__":
    main()
