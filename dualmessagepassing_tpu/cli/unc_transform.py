"""HIN dataset transform CLI — reference Transform/transform.py.

Converts an HNE-style dataset directory (meta.dat, link.dat[,.test],
label.dat[,.test], node.dat) into the model input format (link.dat with
header + seed_node.dat). The reference takes ``-dataset``/``-model`` and
derives paths from its repo layout (transform.py:5-38); here the input
and output directories are explicit.

python -m dualmessagepassing_tpu.cli.unc_transform \\
    --data_dir data/PubMed --out_dir Model/DMPNN/data/PubMed \\
    --attributed False --supervised False
"""

from __future__ import annotations

import argparse


def main(argv=None):
    from ..unc.transform import transform
    from ..utils.io import str2bool

    p = argparse.ArgumentParser("unc-transform")
    p.add_argument("--data_dir", type=str, required=True,
                   help="HNE dataset dir containing meta.dat/link.dat/...")
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--attributed", type=str2bool, default=False)
    p.add_argument("--supervised", type=str2bool, default=False)
    args = p.parse_args(argv)

    transform(args.data_dir, args.out_dir, attributed=args.attributed,
              supervised=args.supervised)
    print(f"transformed {args.data_dir} -> {args.out_dir}")


if __name__ == "__main__":
    main()
