#!/bin/bash
# Downstream evaluation — mirrors the reference's Evaluate/evaluate.sh.
# Pass --multi True for multi-label datasets (the reference's Yelp).
set -e
dataset=${1:?usage: unc_evaluate.sh <dataset> <emb_file> [multi]}
emb=${2:?}
multi=${3:-False}
folder="rawdata/${dataset}/"

python -m dualmessagepassing_tpu.cli.unc_evaluate \
    --task both \
    --emb_file "${emb}" \
    --label_file "${folder}label.dat" \
    --label_test_file "${folder}label.dat.test" \
    --link_test_file "${folder}link.dat.test" \
    --supervised False --multi ${multi}
