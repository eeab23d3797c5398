"""UNC downstream evaluation: LinearSVC node classification + link prediction.

Reference: /root/reference/UnsupervisedNodeClassification/Evaluate/
(node_classification.py, link_prediction.py, utils.py). Host-side sklearn,
kept as in the reference (SURVEY §2.3: sklearn eval stays on CPU).

Protocols:
  * unsupervised nc: merge label + label.test, 5-fold StratifiedKFold,
    LinearSVC with binary-search C, Macro/Micro-F1;
  * semi-supervised nc: train on label file, test on label.test;
  * link prediction: Hadamard edge features, 5-fold KFold over seed nodes,
    AUC + per-node MRR.
"""

from __future__ import annotations

import warnings
from collections import defaultdict
from typing import Dict, Tuple

import numpy as np

seed = 1
max_iter = 300


def _svc_imports():
    from sklearn.exceptions import ConvergenceWarning, UndefinedMetricWarning
    from sklearn.metrics import f1_score, roc_auc_score
    from sklearn.model_selection import KFold, StratifiedKFold
    from sklearn.svm import LinearSVC

    warnings.filterwarnings("ignore", category=ConvergenceWarning)
    warnings.filterwarnings("ignore", category=UndefinedMetricWarning)
    return LinearSVC, f1_score, roc_auc_score, KFold, StratifiedKFold


def single_label_binary_search_cv(data, labels, multi_class="ovr") -> float:
    """Binary-search C tuner (Evaluate/utils.py:16-45)."""
    LinearSVC, f1_score, *_ = _svc_imports()
    best_c = 1.0
    span = int(labels.max() - labels.min() + 1)
    c0 = 10.0 ** (-span)
    c1 = 1 / c0
    cnt = 0
    max_cnt = 2 * span - 1
    while cnt < max_cnt and abs(c0 - c1) > 1e-10:
        rng = np.random.RandomState(cnt)
        idx = rng.choice(len(data), size=(int(len(data) * (cnt + 1) / max_cnt),),
                         replace=False)
        cd, cl = data[idx], labels[idx]
        if len(np.unique(cl)) < 2:
            # degenerate subsample (possible on tiny datasets; the reference
            # assumes datasets large enough to never hit this)
            cnt += 1
            continue
        scores = []
        for c in (c0, c1):
            clf = LinearSVC(random_state=seed,
                            max_iter=int(100 * (cnt + 1) / max_cnt),
                            multi_class=multi_class, C=c)
            clf.fit(cd, cl)
            preds = clf.predict(cd)
            scores.append(f1_score(cl, preds, average="macro")
                          + f1_score(cl, preds, average="micro"))
        if scores[0] > scores[1]:
            best_c = c0
            c1 /= 10
        else:
            best_c = c1
            c0 *= 10
        cnt += 1
    return best_c


def _read_label_file(path) -> Tuple[list, list]:
    ids, labels = [], []
    with open(path) as f:
        for line in f:
            parts = line.strip().split("\t")
            ids.append(parts[0])
            labels.append(parts[-1])
    return ids, labels


def load_emb_dict(path: str) -> Dict[str, np.ndarray]:
    """emb.dat -> {node id string: vector} (Evaluate/evaluate.py)."""
    emb = {}
    with open(path) as f:
        f.readline()  # args header
        for line in f:
            idx, vec = line.rstrip("\n").split("\t")
            emb[idx] = np.asarray(vec.split(" "), np.float32)
    return emb


def unsupervised_single_label_nc(label_path, label_test_path, emb_dict):
    """5-fold CV on merged labels (node_classification.py:61-84)."""
    LinearSVC, f1_score, _, _, StratifiedKFold = _svc_imports()
    labels, embs = [], []
    for p in (label_path, label_test_path):
        ids, labs = _read_label_file(p)
        for i, l in zip(ids, labs):
            labels.append(int(l))
            embs.append(emb_dict[i])
    labels = np.asarray(labels)
    embs = np.asarray(embs)
    macro, micro = [], []
    skf = StratifiedKFold(n_splits=5, shuffle=True, random_state=seed)
    for tr, te in skf.split(embs, labels):
        c = single_label_binary_search_cv(embs[tr], labels[tr])
        clf = LinearSVC(random_state=seed, max_iter=max_iter,
                        multi_class="ovr", C=c)
        clf.fit(embs[tr], labels[tr])
        preds = clf.predict(embs[te])
        macro.append(f1_score(labels[te], preds, average="macro"))
        micro.append(f1_score(labels[te], preds, average="micro"))
    return float(np.mean(macro)), float(np.mean(micro))


def semisupervised_single_label_nc(label_path, label_test_path, emb_dict):
    """Train/test split protocol (node_classification.py:33-59)."""
    LinearSVC, f1_score, *_ = _svc_imports()

    def load(p):
        ids, labs = _read_label_file(p)
        return (np.asarray([int(l) for l in labs]),
                np.asarray([emb_dict[i] for i in ids]))

    trl, tre = load(label_path)
    tel, tee = load(label_test_path)
    c = single_label_binary_search_cv(tre, trl)
    clf = LinearSVC(random_state=seed, max_iter=max_iter, multi_class="ovr",
                    C=c)
    clf.fit(tre, trl)
    preds = clf.predict(tee)
    return (float(f1_score(tel, preds, average="macro")),
            float(f1_score(tel, preds, average="micro")))


def lp_evaluate(test_file_path, emb_dict):
    """Hadamard edge features + 5-fold CV -> (AUC, MRR)
    (link_prediction.py:53-88)."""
    LinearSVC, _, roc_auc_score, KFold, _ = _svc_imports()
    posi, nega = defaultdict(set), defaultdict(set)
    with open(test_file_path) as f:
        for line in f:
            left, right, label = line.rstrip("\n").split("\t")
            (posi if label == "1" else nega)[left].add(right)

    edge_embs, edge_labels = defaultdict(list), defaultdict(list)
    for store, lab in ((posi, 1), (nega, 0)):
        for left, rights in store.items():
            for right in rights:
                edge_embs[left].append(emb_dict[left] * emb_dict[right])
                edge_labels[left].append(lab)
    for n in edge_embs:
        edge_embs[n] = np.asarray(edge_embs[n])
        edge_labels[n] = np.asarray(edge_labels[n])

    seed_nodes = np.asarray(list(edge_embs.keys()))
    auc, mrr = [], []
    kf = KFold(n_splits=5, shuffle=True, random_state=seed)
    for tr, te in kf.split(np.zeros((len(seed_nodes), 1))):
        tr_embs = np.concatenate([edge_embs[n] for n in seed_nodes[tr]])
        tr_labs = np.concatenate([edge_labels[n] for n in seed_nodes[tr]])
        te_embs = np.concatenate([edge_embs[n] for n in seed_nodes[te]])
        te_labs = np.concatenate([edge_labels[n] for n in seed_nodes[te]])
        c = single_label_binary_search_cv(tr_embs, tr_labs)
        clf = LinearSVC(random_state=seed, max_iter=max_iter,
                        multi_class="ovr", C=c)
        clf.fit(tr_embs, tr_labs)
        auc.append(roc_auc_score(te_labs, clf.predict(te_embs)))
        conf = clf.decision_function(te_embs)
        curr, off = [], 0
        for i in te:
            n = seed_nodes[i]
            k = len(edge_labels[n])
            order = np.argsort(-conf[off: off + k])
            rank = np.empty_like(order)
            rank[order] = np.arange(k)
            pos = np.argwhere(edge_labels[n] == 1).flatten()
            if len(pos):  # nodes with no positive test edge carry no MRR term
                curr.append(1.0 / (1 + rank[pos].min()))
            off += k
        mrr.append(np.mean(curr))
    return float(np.mean(auc)), float(np.mean(mrr))
