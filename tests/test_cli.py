"""Tests for the SCM CLI: config parsing, process_model_config, smoke run."""

import os

import numpy as np
import pytest

from dualmessagepassing_tpu.cli.config import (
    get_train_config,
    process_model_config,
    to_model_config,
)


def test_config_defaults():
    cfg = get_train_config([])
    assert cfg["rep_net"] == "DMPNN"
    assert cfg["base"] == 2
    assert cfg["neg_pred_slp"] == "anneal_cosine$1.0$0.01"
    assert cfg["scheduler"] == "cosine_with_warmup_and_restart"


def test_process_model_config_add_rev():
    cfg = get_train_config(["--add_rev", "True"])
    mc = process_model_config(cfg)
    assert mc["max_nge"] == 2 * cfg["max_nge"]
    assert mc["max_ngel"] == 2 * cfg["max_ngel"]
    assert mc["max_npe"] == 2 * cfg["max_npe"]


def test_process_model_config_dual():
    cfg = get_train_config([
        "--add_rev", "False", "--convert_dual", "True",
        "--max_ngv", "10", "--max_nge", "48",
        "--max_npv", "4", "--max_npe", "10",
    ])
    mc = process_model_config(cfg)
    # dual V = primal E; label fields swap (train.py:50-63)
    assert mc["max_ngv"] == 48
    assert mc["max_npv"] == 10
    assert mc["max_ngvl"] == cfg["max_ngel"]


def test_to_model_config():
    cfg = get_train_config(["--match_weights", "node,edge",
                            "--rep_cnn_kernel_sizes", "2,3"])
    mc = to_model_config(process_model_config(cfg))
    assert mc.pred_return_weights == "node,edge"
    assert mc.rep_cnn_kernel_sizes == (2, 3)


def test_cli_end_to_end(tmp_path):
    """Tiny synthetic run through the real CLI entry point + evaluate."""
    from dualmessagepassing_tpu.cli.scm_train import main as train_main
    from dualmessagepassing_tpu.cli.scm_evaluate import main as eval_main

    save_dir = train_main([
        "--synthetic", "True", "--synthetic_pairs", "16",
        "--max_npv", "3", "--max_npvl", "2", "--max_npe", "3",
        "--max_npel", "2",
        "--max_ngv", "6", "--max_ngvl", "2", "--max_nge", "10",
        "--max_ngel", "2",
        "--hid_dim", "8", "--pred_hid_dim", "8",
        "--rep_num_pattern_layers", "1", "--rep_num_graph_layers", "1",
        "--train_epochs", "2", "--train_batch_size", "8",
        "--eval_batch_size", "8",
        "--save_model_dir", str(tmp_path),
    ])
    files = os.listdir(save_dir)
    assert "config.json" in files
    assert "log.txt" in files
    assert any(f.startswith("dev_results") for f in files)
    assert any(f.startswith("epoch") for f in files)
    eval_main(["--load_model_dir", save_dir])
    files = os.listdir(save_dir)
    assert any(f.startswith("eval_test_results") for f in files)


def test_unc_cli(tmp_path, rng):
    from dualmessagepassing_tpu.cli.unc_train import main as unc_main

    link = tmp_path / "link.dat"
    with open(link, "w") as f:
        f.write("20 2\n")
        for _ in range(80):
            s = rng.integers(0, 20)
            d = (s + rng.integers(1, 20)) % 20
            f.write(f"{s} {rng.integers(0, 2)} {d}\n")
    out = tmp_path / "emb.dat"
    unc_main(["--link", str(link), "--output", str(out), "--model", "DMPNN",
              "--n_hidden", "8", "--n_layers", "1",
              "--graph_batch_size", "40", "--n_epochs", "1",
              "--sample_depth", "2", "--sample_width", "4",
              "--graph_split_size", "0.9"])
    lines = open(out).read().splitlines()
    assert len(lines) == 21  # header + 20 nodes
    vec = lines[1].split("\t")[1].split(" ")
    assert len(vec) == 8


def test_finetune_flow(tmp_path):
    from dualmessagepassing_tpu.cli.scm_train import main as train_main

    common = ["--synthetic", "True", "--synthetic_pairs", "8",
              "--max_npv", "3", "--max_npe", "3",
              "--max_ngv", "6", "--max_nge", "10",
              "--hid_dim", "8", "--pred_hid_dim", "8",
              "--rep_num_pattern_layers", "1", "--rep_num_graph_layers", "1",
              "--train_epochs", "1", "--train_batch_size", "8",
              "--eval_batch_size", "8"]
    d1 = train_main(common + ["--max_npvl", "2", "--max_npel", "2",
                              "--max_ngvl", "2", "--max_ngel", "2",
                              "--save_model_dir", str(tmp_path / "a")])
    d2 = train_main(common + ["--max_npvl", "5", "--max_npel", "5",
                              "--max_ngvl", "5", "--max_ngel", "5",
                              "--load_model_dir", d1,
                              "--save_model_dir", str(tmp_path / "b")])
    assert os.path.exists(os.path.join(d2, "log.txt"))
