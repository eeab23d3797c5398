#!/bin/bash
# SCM evaluation — mirrors the reference README's Stage 3. The run dir is
# the timestamped directory created under --save_model_dir by training.
set -e
RUN_DIR=${1:?usage: scm_evaluate.sh dumps/MUTAG/DMPNN_SumPredictNet_<timestamp>}

python -m dualmessagepassing_tpu.cli.scm_evaluate --load_model_dir "${RUN_DIR}"
