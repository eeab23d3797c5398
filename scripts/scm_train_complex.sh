#!/bin/bash
# SCM training on the Complex dataset — mirrors the reference's README
# launch (SubgraphCountingMatching/README.md "For Complex"). Point the
# data flags at GML pattern/graph dirs + metadata CSVs, or replace them
# with "--synthetic True --synthetic_pairs N" for generated data.
set -e
DATA=${DATA:-data/Complex}

python -m dualmessagepassing_tpu.cli.scm_train \
    --pattern_dir ${DATA}/patterns \
    --graph_dir ${DATA}/graphs \
    --metadata_dir ${DATA}/metadata_withoutloop \
    --save_data_dir ${DATA}/datasets \
    --save_model_dir dumps/Complex \
    --add_rev True \
    --hid_dim 64 --node_pred True --edge_pred False \
    --match_weights node \
    --enc_net Multihot --enc_base 2 \
    --emb_net Equivariant --share_emb_net True \
    --rep_net DMPNN \
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3 \
    --rep_residual True --rep_dropout 0.0 --share_rep_net True \
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0 \
    --max_npv 8 --max_npe 8 --max_npvl 8 --max_npel 8 \
    --max_ngv 64 --max_nge 256 --max_ngvl 16 --max_ngel 16 \
    --train_grad_steps 1 --train_batch_size 512 \
    --eval_batch_size 512 \
    --lr 1e-3 --train_epochs 100 \
    --seed 0 --gpu_id 0
