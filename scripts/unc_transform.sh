#!/bin/bash
# HIN transform — mirrors the reference's Transform/transform.sh, with
# explicit dirs instead of a hardcoded repo layout.
set -e
for dataset in "PubMed" "Yelp"; do
    python -m dualmessagepassing_tpu.cli.unc_transform \
        --data_dir "rawdata/${dataset}" \
        --out_dir "data/${dataset}" \
        --attributed False --supervised False
done
