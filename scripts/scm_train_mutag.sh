#!/bin/bash
# SCM training on MUTAG — mirrors the reference README's MUTAG launch.
set -e
DATA=${DATA:-data/MUTAG}

python -m dualmessagepassing_tpu.cli.scm_train \
    --pattern_dir ${DATA}/patterns \
    --graph_dir ${DATA}/graphs \
    --metadata_dir ${DATA}/metadata \
    --save_data_dir ${DATA}/datasets \
    --save_model_dir dumps/MUTAG \
    --add_rev True \
    --hid_dim 64 --node_pred True --edge_pred False \
    --match_weights node \
    --enc_net Multihot --enc_base 2 \
    --emb_net Equivariant --share_emb_net True \
    --rep_net DMPNN \
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3 \
    --rep_residual True --rep_dropout 0.0 --share_rep_net True \
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0 \
    --max_npv 4 --max_npe 3 --max_npvl 2 --max_npel 2 \
    --max_ngv 28 --max_nge 66 --max_ngvl 7 --max_ngel 4 \
    --train_grad_steps 1 --train_batch_size 32 \
    --eval_batch_size 32 \
    --lr 1e-3 --train_epochs 200 \
    --seed 0 --gpu_id 0
