"""Run the ACTUAL reference label-only embedding trainers (PyTorch, CPU)
on the real 723-node ETHEC taxonomy — the A/B measurement VERDICT r2 asked
for: reference-measured val/test edge-F1 and reconstruction-F1 recorded
next to the rebuild's numbers in BASELINE.md.

What runs: /root/reference/network/order_embeddings.py (Euclidean order
embeddings + Euclidean cones, adam) and order_embeddings_h.py (hyperbolic
cones, the reference's manual Riemannian-SGD update) via their real
`order_embedding_train_model` drivers, with the same data the rebuild's
quality runs used — the shipped val+test splits merged as the train set
(train.json is gitignored upstream; the rebuild's `--graph_from all` built
its graph from the same records).

Environment shims (no training-semantics changes):
  * torchvision / git stubs (not installed; unused on the imageless path),
  * matplotlib forced to Agg and `plot_label_embeddings` no-op'd (pure
    per-epoch viz),
  * EmbeddingMetrics.calculate_metrics 'val' branch replaced by a
    vectorized numpy sweep computing the SAME argmax-F1 over the same
    candidate thresholds with the same (pos <= t, neg > t) counting and
    the same first-index tie rule — the original fans ~520k
    O(n)-per-threshold tasks over multiprocessing.Pool (n_proc>=4,
    order_embeddings.py:272-287), infeasible on this 1-core host. (The
    only behavioral difference: thresholds where precision's denominator
    is 0 score F1=0 instead of raising ZeroDivisionError.)

Usage:
  python tools/reference_ab.py order      [n_epochs]
  python tools/reference_ab.py euc_cones  [n_epochs]
  python tools/reference_ab.py hyp_cones  [n_epochs] [lr]
  python tools/reference_ab.py all        [n_epochs]

Results land in experiments/ref_ab/<run>/ (full stdout log + the
reference's own experiment dir) and experiments/ref_ab/results.json.
"""

import argparse
import io
import json
import os
import re
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
AB_ROOT = os.path.join(REPO, "experiments", "ref_ab")
REF = "/root/reference"


def setup_sandbox():
    """cwd layout the reference drivers expect: ../database/ETHEC/*.json
    relative to a run directory; train.json = shipped val+test merged."""
    db_dir = os.path.join(AB_ROOT, "database", "ETHEC")
    run_cwd = os.path.join(AB_ROOT, "run")
    os.makedirs(db_dir, exist_ok=True)
    os.makedirs(run_cwd, exist_ok=True)
    train_path = os.path.join(db_dir, "train.json")
    if not os.path.exists(train_path):
        def load_merged_format(split):
            # ETHECLabelMapMerged keys leaves as 'Genus_epithet'
            # (db.py:1848) and ETHECDBMerged passes the record's
            # specific_epithet straight through (db.py:3861) — the
            # reference's own (gitignored) DB stores the merged form;
            # the shipped splits store the raw epithet, so rewrite.
            with open(os.path.join(REF, "splits", "ETHEC",
                                   f"{split}.json")) as f:
                recs = json.load(f)
            for r in recs.values():
                if not r["specific_epithet"].startswith(r["genus"] + "_"):
                    r["specific_epithet"] = (r["genus"] + "_"
                                             + r["specific_epithet"])
            return recs

        val = load_merged_format("val")
        test = load_merged_format("test")
        merged = dict(val)
        merged.update(test)
        with open(train_path, "w") as f:
            json.dump(merged, f)
        with open(os.path.join(db_dir, "val.json"), "w") as f:
            json.dump(val, f)
        with open(os.path.join(db_dir, "test.json"), "w") as f:
            json.dump(test, f)
    return run_cwd


def setup_butterfly_db():
    """The upstream hyp-cone driver's last committed state is hardwired to
    Butterfly200 (`labelmap = Butterfly200LabelMap()` in every branch,
    order_embeddings_h.py:1358-1362, paths :1386-1415). No Butterfly200
    record DB ships with the repo, so synthesize one record per leaf from
    the hard-coded taxonomy dicts — the graph then covers the full
    5/23/116/200 = 344-node taxonomy, exactly like the rebuild's frozen
    `--taxonomy butterfly200` quality runs (BASELINE.md)."""
    db_dir = os.path.join(AB_ROOT, "database", "butterfly200")
    path = os.path.join(db_dir, "train.json")
    if os.path.exists(path):
        return
    os.makedirs(db_dir, exist_ok=True)
    from data.db import Butterfly200LabelMap   # after setup_modules()

    lm = Butterfly200LabelMap()
    genus_to_sf = {g: sf for sf, gs in lm.child_of_subfamily.items()
                   for g in gs}
    sf_to_fam = {sf: f for f, sfs in lm.child_of_family.items()
                 for sf in sfs}
    recs = {}
    for genus, leaves in lm.child_of_genus.items():
        for leaf in leaves:
            sf = genus_to_sf[genus]
            tok = f"b{len(recs)}"
            recs[tok] = {"token": tok, "image_path": "", "image_name":
                         f"{leaf}.jpg", "family": sf_to_fam[sf],
                         "subfamily": sf, "genus": genus,
                         "specific_epithet": leaf}
    for split in ("train", "val", "test"):
        with open(os.path.join(db_dir, f"{split}.json"), "w") as f:
            json.dump(recs, f)


def setup_modules():
    sys.path.insert(0, os.path.join(HERE, "ref_ab_stubs"))
    sys.path.insert(0, REF)
    # the reference mixes package ("network.experiment") and flat
    # ("from evaluation import ...") imports — it runs with cwd=network/
    sys.path.insert(0, os.path.join(REF, "network"))
    import matplotlib

    matplotlib.use("Agg")
    matplotlib.use = lambda *a, **k: None   # driver calls use('tkagg')

    # the reference was written for torch 1.0 (requirements.txt:37);
    # torch>=2.6 defaults torch.load(weights_only=True) which rejects its
    # numpy-scalar-bearing checkpoints in load_best_model
    import functools

    import torch

    torch.load = functools.partial(torch.load, weights_only=False)


def fast_sweep(metrics_cls):
    """Vectorized replacement for the 'val' branch of the reference's
    EmbeddingMetrics.calculate_metrics (order_embeddings.py:250-306):
    same candidate set (unique energies), same counting
    (pos <= t / neg > t), same argmax + first-index tie rule."""
    import numpy as np

    orig = metrics_cls.calculate_metrics

    def calculate_metrics(self):
        if self.phase != "val":
            return orig(self)
        pos = self.e_for_u_v_positive.detach().cpu().numpy().ravel()
        neg = self.e_for_u_v_negative.detach().cpu().numpy().ravel()
        ts = np.unique(np.concatenate([pos, neg]))
        ps, ns = np.sort(pos), np.sort(neg)
        cp = np.searchsorted(ps, ts, side="right").astype(np.float64)
        cn = (len(ns) - np.searchsorted(ns, ts, side="right")).astype(
            np.float64)
        acc = (cp + cn) / max(len(ps) + len(ns), 1)
        denom = cp + (len(ns) - cn)
        prec = np.where(denom > 0, cp / np.where(denom > 0, denom, 1.0), 0.0)
        rec = cp / max(len(ps), 1)
        s = prec + rec
        f1 = np.where(s > 0, 2 * prec * rec / np.where(s > 0, s, 1.0), 0.0)
        b = int(np.argmax(f1))
        return np.array([f1[b], ts[b], acc[b], prec[b], rec[b], cp[b], cn[b]])

    metrics_cls.calculate_metrics = calculate_metrics


class Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
            st.flush()
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def make_args(loss, experiment_name, n_epochs, lr, alpha):
    """Namespace with the reference __main__ defaults
    (order_embeddings.py:1350-1392 / order_embeddings_h.py:1486-1528)
    except: merged taxonomy, pick_per_level, dim 10 / ratio 5 / bs 10 and
    the run's (lr, alpha) — the exact config of the rebuild's quality runs
    (tools/quality_runs.py)."""
    return argparse.Namespace(
        debug=False, lr=lr, batch_size=10, evaluator="ML",
        experiment_name=experiment_name, experiment_dir=AB_ROOT + "/",
        image_dir="/nonexistent-images", n_epochs=n_epochs, n_workers=0,
        eval_interval=1, embedding_dim=10, neg_to_pos_ratio=5, alpha=alpha,
        prop_of_nb_edges=0.90, resume=False, weigh_pos_term=False,
        optimizer_method="adam", merged=True, weigh_neg_term=False,
        weight_strategy="inv", model="alexnet", loss=loss,
        use_grayscale=False,
        # class_weights=True swaps the G-building image loader from the
        # with-replacement WeightedResampler to plain shuffle — exact
        # taxonomy coverage (the resampler can miss 1-record leaves, and
        # create_splits indexes A by raw label id, crashing on gaps);
        # this driver uses no criterion weights, so nothing else changes
        class_weights=True, freeze_weights=False,
        pick_per_level=True, set_mode="train", level_weights=None,
        lr_step=[], lr_decay=1.0, random_seed=0, load_cosine_emb=None)


def parse_final(log_text):
    """Pull the headline numbers out of the reference's stdout."""
    out = {}
    m = re.findall(r"Best val score: ([0-9.]+)", log_text)
    if m:
        out["best_val_f1"] = float(m[-1])
    # final test pass (after best-model reload) prints last
    m = re.findall(r"test Loss: [0-9.eE+-]+ lr: [0-9.eE+-]+, "
                   r"F1-score: ([0-9.]+), Accuracy: ([0-9.]+)", log_text)
    if m:
        out["test_f1"], out["test_accuracy"] = map(float, m[-1])
    m = re.findall(r"val Loss: [0-9.eE+-]+ lr: [0-9.eE+-]+, "
                   r"F1-score: ([0-9.]+),", log_text)
    if m:
        out["last_val_f1"] = float(m[-1])
    m = re.findall(
        r"Reconstruction task: F1: ([0-9.]+),\s+Accuracy: ([0-9.]+), "
        r"Precision: ([0-9.]+), Recall: ([0-9.]+), Threshold: ([0-9.-]+)",
        log_text)
    if m:
        (out["reconstruction_f1"], out["reconstruction_accuracy"],
         out["reconstruction_precision"], out["reconstruction_recall"],
         out["reconstruction_threshold"]) = map(float, m[-1])
    return out


def run_one(kind, n_epochs, lr=None):
    """kind: order | euc_cones (order_embeddings.py, adam)
             hyp_cones (order_embeddings_h.py, manual RSGD update)."""
    run_cwd = setup_sandbox()
    setup_modules()
    os.chdir(run_cwd)

    name = f"{kind}_ep{n_epochs}" + (f"_lr{lr}" if lr else "")
    log_path = os.path.join(AB_ROOT, f"{name}.log")
    t0 = time.time()

    if kind == "hyp_cones":
        import network.order_embeddings_h as mod
        setup_butterfly_db()          # the upstream driver is hardwired to
        #                               Butterfly200 (see setup_butterfly_db)
        loss = "euc_cones_loss"       # EucConesLoss in _h IS the
        #                               hyperbolic cone (misnamed upstream)
        alpha = 0.05
        use_lr = lr if lr is not None else 0.001
    elif kind == "euc_cones":
        import network.order_embeddings as mod
        loss, alpha, use_lr = "euc_cones_loss", 0.05, 0.001
    elif kind == "order":
        import network.order_embeddings as mod
        loss, alpha, use_lr = "order_emb_loss", 1.0, 0.001
    else:
        raise SystemExit(f"unknown kind {kind}")

    fast_sweep(mod.EmbeddingMetrics)
    if hasattr(mod.OrderEmbedding, "plot_label_embeddings"):
        mod.OrderEmbedding.plot_label_embeddings = lambda self: None

    args = make_args(loss, name, n_epochs, use_lr, alpha)
    if kind == "hyp_cones":
        # the hyp trainer's train() accepts only 'sgd' (a dummy optimizer:
        # the real update is the manual RSGD in pass_samples,
        # order_embeddings_h.py:588-594, 765-778)
        args.optimizer_method = "sgd"
    log_f = open(log_path, "w")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = Tee(old_out, log_f)
    sys.stderr = Tee(old_err, log_f)
    status = "ok"
    try:
        mod.order_embedding_train_model(args)
    except Exception as e:  # post-train viz may fail; numbers print first
        import traceback

        status = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        print(f"== driver raised after/while training: {status}")
    finally:
        sys.stdout, sys.stderr = old_out, old_err
        log_f.close()

    with open(log_path) as f:
        results = parse_final(f.read())
    results.update(status=status, wall_s=round(time.time() - t0, 1),
                   kind=kind, loss=loss, lr=use_lr, alpha=alpha,
                   n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = {}
    if os.path.exists(res_path):
        with open(res_path) as f:
            blob = json.load(f)
    blob[name] = results
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {results}")
    return results


if __name__ == "__main__":
    kind = sys.argv[1] if len(sys.argv) > 1 else "all"
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    lr = float(sys.argv[3]) if len(sys.argv) > 3 else None
    if kind == "all":
        # separate processes: the reference modules seed global RNGs and
        # cache module state at import
        import subprocess
        for k in ("order", "euc_cones", "hyp_cones"):
            subprocess.run([sys.executable, os.path.abspath(__file__), k,
                            str(n_epochs)], check=False)
        # give RSGD its best measured lr too (rebuild's sweep peak)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "hyp_cones", str(n_epochs), "0.01"], check=False)
    else:
        run_one(kind, n_epochs, lr)
