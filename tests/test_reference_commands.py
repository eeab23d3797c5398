"""The reference's published commands parse verbatim against our CLIs.

Migration evidence: every command the reference README / sweep scripts
tell a user to run (SubgraphCountingMatching/README.md:21-131,
UnsupervisedNodeClassification/Model/DMPNN/run.sh,
Transform/transform.sh, Evaluate/evaluate.sh) is fed — flags unchanged,
only the entry point swapped — to the corresponding parser here. Flag
values must land where the reference semantics put them.

These are parse-level tests on purpose: the data directories in the
commands are external downloads (reference Data/README.md), so
execution is covered by the synthetic/fixture e2e tests instead
(test_cli.py, test_train_e2e.py, test_loader_fixtures.py).
"""

import pytest

from dualmessagepassing_tpu.cli.config import (get_train_config,
                                               process_model_config,
                                               to_model_config)


def _split(cmd):
    return cmd.replace("\\\n", " ").split()


# SubgraphCountingMatching/README.md Stage-2 commands, flags verbatim
# (README.md:22-43, 47-68, 71-92, 96-117 minus the "python train.py").
ERDOS_RENYI = """--pattern_dir data/Erdos-Renyi/patterns
    --graph_dir data/Erdos-Renyi/graphs
    --metadata_dir data/Erdos-Renyi/metadata
    --save_data_dir data/Erdos-Renyi/datasets
    --save_model_dir dumps/Erdos-Renyi
    --add_rev True
    --hid_dim 64 --node_pred True --edge_pred False
    --match_weights node
    --enc_net Multihot --enc_base 2
    --emb_net Equivariant --share_emb_net True
    --rep_net DMPNN
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3
    --rep_residual True --rep_dropout 0.0 --share_rep_net True
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0
    --max_npv 4 --max_npe 10 --max_npvl 1 --max_npel 1
    --max_ngv 10 --max_nge 48 --max_ngvl 1 --max_ngel 1
    --train_grad_steps 1 --train_batch_size 64
    --train_log_steps 10 --eval_batch_size 64
    --lr 1e-3 --train_epochs 100
    --seed 0 --gpu_id 0"""

REGULAR = """--pattern_dir data/Regular/patterns
    --graph_dir data/Regular/graphs
    --metadata_dir data/Regular/metadata
    --save_data_dir data/Regular/datasets
    --save_model_dir dumps/Regular
    --add_rev True
    --hid_dim 64 --node_pred True --edge_pred False
    --match_weights node
    --enc_net Multihot --enc_base 2
    --emb_net Equivariant --share_emb_net True
    --rep_net DMPNN
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3
    --rep_residual True --rep_dropout 0.0 --share_rep_net True
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0
    --max_npv 4 --max_npe 10 --max_npvl 1 --max_npel 1
    --max_ngv 30 --max_nge 90 --max_ngvl 1 --max_ngel 1
    --train_grad_steps 1 --train_batch_size 64
    --train_log_steps 10 --eval_batch_size 64
    --lr 1e-3 --train_epochs 100
    --seed 0 --gpu_id 0"""

COMPLEX = """--pattern_dir data/Complex/patterns
    --graph_dir data/Complex/graphs
    --metadata_dir data/Complex/metadata_withoutloop
    --save_data_dir data/Complex/datasets
    --save_model_dir dumps/Complex
    --add_rev True
    --hid_dim 64 --node_pred True --edge_pred False
    --match_weights node
    --enc_net Multihot --enc_base 2
    --emb_net Equivariant --share_emb_net True
    --rep_net DMPNN
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3
    --rep_residual True --rep_dropout 0.0 --share_rep_net True
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0
    --max_npv 8 --max_npe 8 --max_npvl 8 --max_npel 8
    --max_ngv 64 --max_nge 256 --max_ngvl 16 --max_ngel 16
    --train_grad_steps 1 --train_batch_size 512
    --train_log_steps 100 --eval_batch_size 512
    --lr 1e-3 --train_epochs 100
    --seed 0 --gpu_id 0"""

MUTAG = """--pattern_dir data/MUTAG/patterns
    --graph_dir data/MUTAG/graphs
    --metadata_dir data/MUTAG/metadata
    --save_data_dir data/MUTAG/datasets
    --save_model_dir dumps/MUTAG
    --add_rev True
    --hid_dim 64 --node_pred True --edge_pred False
    --match_weights node
    --enc_net Multihot --enc_base 2
    --emb_net Equivariant --share_emb_net True
    --rep_net DMPNN
    --rep_num_pattern_layers 3 --rep_num_graph_layers 3
    --rep_residual True --rep_dropout 0.0 --share_rep_net True
    --pred_net SumPredictNet --pred_hid_dim 64 --pred_dropout 0.0
    --max_npv 4 --max_npe 3 --max_npvl 2 --max_npel 2
    --max_ngv 28 --max_nge 66 --max_ngvl 7 --max_ngel 4
    --train_grad_steps 1 --train_batch_size 32
    --train_log_steps 10 --eval_batch_size 32
    --lr 1e-3 --train_epochs 200
    --seed 0 --gpu_id 0"""


@pytest.mark.parametrize("cmd,ngv,nge,bsz,epochs", [
    (ERDOS_RENYI, 10, 48, 64, 100),
    (REGULAR, 30, 90, 64, 100),
    (COMPLEX, 64, 256, 512, 100),
    (MUTAG, 28, 66, 32, 200),
], ids=["erdos-renyi", "regular", "complex", "mutag"])
def test_scm_readme_train_commands_parse(cmd, ngv, nge, bsz, epochs):
    cfg = get_train_config(_split(cmd))
    assert cfg["rep_net"] == "DMPNN"
    assert cfg["pred_net"] == "SumPredictNet"
    assert cfg["emb_net"] == "Equivariant"
    assert cfg["enc_net"] == "Multihot" and cfg["base"] == 2
    assert cfg["max_ngv"] == ngv and cfg["max_nge"] == nge
    assert cfg["train_batch_size"] == bsz
    assert cfg["train_epochs"] == epochs
    assert cfg["match_weights"] == "node"
    assert cfg["node_pred"] is True and cfg["edge_pred"] is False
    assert cfg["lr"] == pytest.approx(1e-3)
    # --train_log_steps lands on the driver's in-epoch logging knob
    assert cfg["log_every"] == cfg["train_log_steps"] > 0
    # and the derived model config builds (add_rev doubling applied)
    mc = to_model_config(process_model_config(cfg))
    assert mc.max_nge == 2 * nge


def test_scm_readme_evaluate_command_parses():
    # README.md Stage-3 (minus "python evaluate.py"); our evaluate CLI
    # keeps the same flag names
    from dualmessagepassing_tpu.cli.scm_evaluate import build_parser
    argv = _split("""--pattern_dir data/MUTAG/patterns
        --graph_dir data/MUTAG/graphs
        --metadata_dir data/MUTAG/metadata
        --save_data_dir data/MUTAG/datasets
        --load_model_dir dumps/MUTAG/DMPNN_SumPredictNet_2021_12_09_14_11_52
        --eval_batch_size 64""")
    args = build_parser().parse_args(argv)
    assert args.load_model_dir.endswith("DMPNN_SumPredictNet_2021_12_09_14_11_52")
    assert args.eval_batch_size == 64


def test_unc_run_sh_command_parses():
    # Model/DMPNN/run.sh inner command, flags verbatim (dash-style as the
    # reference main.py:221-304 registers them)
    from dualmessagepassing_tpu.cli.unc_train import get_args
    argv = _split("""--link data/PubMed/link.dat
        --node data/PubMed/node.dat
        --label data/PubMed/label.dat
        --output data/PubMed/emb.dat
        --n-hidden 50
        --negative-sample 5
        --lr 1e-2
        --dropout 0.2
        --gpu 1
        --n-layers 2
        --n-epochs 50
        --regularization 1e-2
        --grad-norm 1.0
        --graph-batch-size 10000
        --graph-split-size 0.5
        --label-batch-size 64
        --sampler randomwalk
        --sample-depth 3
        --sample-width 10
        --attributed False
        --supervised False""")
    args = get_args(argv)
    assert args.n_hidden == 50 and args.n_layers == 2
    assert args.negative_sample == 5
    assert args.graph_batch_size == 10000
    assert args.graph_split_size == pytest.approx(0.5)
    assert args.label_batch_size == 64
    assert args.sample_depth == 3 and args.sample_width == 10
    assert args.n_epochs == 50
    assert args.grad_norm == pytest.approx(1.0)
    assert args.sampler == "randomwalk"
    assert args.attributed == "False" and args.supervised == "False"


def test_unc_transform_sh_command_parses(tmp_path, monkeypatch):
    # Transform/transform.sh inner command (single-dash flags); path
    # derivation mirrors transform_model.py:7's HNE layout
    import dualmessagepassing_tpu.cli.unc_transform as m

    seen = {}
    monkeypatch.setattr(
        "dualmessagepassing_tpu.unc.transform.transform",
        lambda data_dir, out_dir, attributed, supervised:
            seen.update(data_dir=data_dir, out_dir=out_dir,
                        attributed=attributed, supervised=supervised))
    m.main(_split("-dataset PubMed -model DMPNN "
                  "-attributed False -supervised False"))
    assert seen["data_dir"] == "../Data/PubMed"
    assert seen["out_dir"] == "../Model/DMPNN/data/PubMed"
    assert seen["attributed"] is False and seen["supervised"] is False


def test_unc_evaluate_sh_command_derives_paths(monkeypatch):
    # Evaluate/evaluate.sh inner command; the HNE default paths come from
    # evaluate.py:117-133, Yelp selects the multi-label protocol
    import dualmessagepassing_tpu.cli.unc_evaluate as m

    calls = {}
    monkeypatch.setattr(
        "dualmessagepassing_tpu.unc.evaluate.load_emb_dict",
        lambda path: calls.update(emb=path) or {})
    monkeypatch.setattr(
        "dualmessagepassing_tpu.unc.evaluate.nc_evaluate",
        lambda label, label_test, emb, supervised, multi:
            calls.update(label=label, label_test=label_test,
                         supervised=supervised, multi=multi) or (0.0, 0.0))
    res = m.main(_split("""--dataset Yelp --model DMPNN --task nc
        --attributed False --supervised False
        --emb_file emb_noattr.dat"""))
    assert calls["emb"] == "emb_noattr.dat"
    assert calls["label"] == "../Data/Yelp/label.dat"
    assert calls["label_test"] == "../Data/Yelp/label.dat.test"
    assert calls["multi"] is True          # Yelp protocol
    assert "nc" in res
