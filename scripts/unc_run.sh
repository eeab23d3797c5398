#!/bin/bash
# UNC hyperparameter sweep — mirrors the reference's Model/DMPNN/run.sh.
# Expects transformed datasets under data/<dataset>/ (see unc_transform.sh).
set -e
attributed="False"
supervised="False"
negative_sample=5
dropout=0.2
n_hidden=50
n_epochs=50
graph_batch_size=10000
sample_depth=3
sample_width=10
label_batch_size=64
grad_norm=1.0
sampler=randomwalk

for dataset in "PubMed" "Yelp"; do
    folder="data/${dataset}/"
    for lr in 1e-2 1e-3; do
        for reg in 1e-2 1e-3; do
            for n_layers in 1 2; do
                for graph_split_size in 0.5 0.7 0.9; do
                    emb_file="${folder}emb_noattr_unsup_${sampler}_lr${lr}_reg${reg}_nlayer${n_layers}_gsplit${graph_split_size}_hidden${n_hidden}.dat"
                    python -m dualmessagepassing_tpu.cli.unc_train \
                        --link "${folder}link.dat" \
                        --node "${folder}node.dat" \
                        --label "${folder}label.dat" \
                        --output "${emb_file}" \
                        --n_hidden ${n_hidden} \
                        --negative_sample ${negative_sample} \
                        --lr ${lr} \
                        --dropout ${dropout} \
                        --n_layers ${n_layers} \
                        --n_epochs ${n_epochs} \
                        --regularization ${reg} \
                        --grad_norm ${grad_norm} \
                        --graph_batch_size ${graph_batch_size} \
                        --graph_split_size ${graph_split_size} \
                        --label_batch_size ${label_batch_size} \
                        --sampler ${sampler} \
                        --sample_depth ${sample_depth} \
                        --sample_width ${sample_width} \
                        --attributed ${attributed} \
                        --supervised ${supervised}
                done
            done
        done
    done
done
