"""SCM held-out MATCHING quality gates (round 5, VERDICT r4 item 1).

The round-4 dissection settled that held-out matching cannot beat the
zero predictor on the planted-Complex envelope (sparse gold weights —
the floor is generator-intrinsic). Round 5 added the reference's ER
envelope (unlabeled, README.md:38-39), where gold weights are DENSE
(~63% nodes / ~52% edges nonzero) and the zero predictor is weak — and
there held-out matching DOES beat the floor (SCM_CONVERGENCE_ER.json:
dev MNED 0.52x / MEED 0.76x of the zero floor on chip, AUC 0.86).

Two tiers:

* test_er_artifact_pins_dev_beats_zero — always runs (<1 s): the pinned
  chip artifact must keep claiming dev_beats_zero; scripts/
  scm_convergence.py --check gates full reruns against it (a rerun that
  loses dev_beats_zero fails the check — capability regression).

* test_er_matching_beats_zero_small — gated by SCM_MATCHING=1 (~2-4 min
  CPU): a reduced-scale ER run (384 pairs, 12 epochs) must already push
  dev MNED well below the zero floor. This is the harness-behavior
  guard: the generator, the dense-weight regime, and the matching losses
  together produce held-out skill, not just train fit.
"""

import json
import os
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT / "scripts"))


def test_er_artifact_pins_dev_beats_zero():
    path = ROOT / "SCM_CONVERGENCE_ER.json"
    assert path.exists(), "pinned ER matching artifact missing"
    with open(path) as f:
        art = json.load(f)
    ml = art["matching_learned"]
    assert art["config"]["family"] == "er"
    assert ml["ok"] and ml["head_learns"]
    assert ml["dev_beats_zero"], ml
    # margins as measured on chip (0.52 / 0.76) with generous headroom
    assert ml["dev_MNED_vs_zero"] < 0.8, ml
    assert ml["dev_MEED_vs_zero"] < 0.95, ml
    # MUTAG-like envelope (intermediate gold-weight density): also
    # beats the zero predictor on chip (MNED 0.65x / MEED 0.92x)
    with open(ROOT / "SCM_CONVERGENCE_MUTAG.json") as f:
        mutag = json.load(f)
    assert mutag["config"]["family"] == "mutag"
    assert mutag["matching_learned"]["dev_beats_zero"]
    assert mutag["matching_learned"]["dev_MNED_vs_zero"] < 0.85
    # the Complex artifact stays the documented negative (regime, not
    # machinery): its floor ratios must still be recorded honestly
    with open(ROOT / "SCM_CONVERGENCE.json") as f:
        complex_ml = json.load(f)["matching_learned"]
    assert complex_ml["head_learns"]
    assert not complex_ml["dev_beats_zero"]


@pytest.mark.skipif(not os.environ.get("SCM_MATCHING"),
                    reason="~2-4 min CPU; set SCM_MATCHING=1")
def test_er_matching_beats_zero_small():
    from scm_convergence import run

    result = run(pairs=384, max_epochs=12, early_stop=12, bsz=64,
                 lr=1e-3, amp=True, seed=0, probe_steps=60,
                 family="er", log=lambda s: None)
    ml = result["matching_learned"]
    # observed at this scale: MNED 0.77 / MEED 0.97 vs zero — gate with
    # headroom (MEED converges later; the full-scale artifact pins 0.76)
    assert ml["dev_MNED_vs_zero"] < 0.9, ml
    assert ml["dev_MEED_vs_zero"] < 1.05, ml
    assert ml["dev_beats_zero"] or ml["dev_MNED_vs_zero"] < 0.9, ml
