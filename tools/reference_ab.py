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

# The A/B runs are CPU-only (reference = torch CPU; rebuild = jax CPU).
# The axon sitecustomize registers the TPU plugin at INTERPRETER START
# whenever PALLAS_AXON_POOL_IPS is non-empty, and JAX_PLATFORMS=cpu set
# in-process does not undo that — so re-exec with a clean environment
# (same guard as run_cpu_batch_r4.py; during a backend outage an
# accidental axon init hangs ~25 min before erroring).
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
        "LE_AB_TPU"):    # LE_AB_TPU=1: rebuild legs may use the TPU chip
    _env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    os.execve(sys.executable, [sys.executable] + sys.argv, _env)


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

    # networkx 3.x dropped the gpickle helpers the reference's combined
    # graph cache uses (oe.py:468-483)
    import pickle

    import networkx as nx

    if not hasattr(nx, "write_gpickle"):
        nx.write_gpickle = lambda G, path: pickle.dump(
            G, open(path, "wb"), pickle.HIGHEST_PROTOCOL)
        nx.read_gpickle = lambda path: pickle.load(open(path, "rb"))


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


def _install_joint_db():
    """Swap the reduced joint splits into database/ETHEC/{split}.json (the
    path the drivers hard-code), backing the full merged pool up as
    .labelonly. Idempotent; `restore_labelonly_db` is the inverse."""
    db_dir = os.path.join(AB_ROOT, "database", "ETHEC")
    jdir = os.path.join(AB_ROOT, "database", "ETHEC_joint")
    for split in ("train", "val", "test"):
        full = os.path.join(db_dir, f"{split}.json")
        if not os.path.exists(full + ".labelonly"):
            os.rename(full, full + ".labelonly")
        with open(os.path.join(jdir, f"{split}.json")) as f:
            blob = f.read()
        with open(full, "w") as f:
            f.write(blob)


def restore_labelonly_db():
    """Undo _install_joint_db's in-place swap: the label-only trainers
    must consume the FULL merged val+test pool, not the reduced 2/1/1
    joint DB a previous joint_fc7 run left installed."""
    db_dir = os.path.join(AB_ROOT, "database", "ETHEC")
    for split in ("train", "val", "test"):
        bak = os.path.join(db_dir, f"{split}.json.labelonly")
        if os.path.exists(bak):
            os.replace(bak, os.path.join(db_dir, f"{split}.json"))


def setup_joint_sandbox():
    """Reduced ETHEC DB + synthetic fc7 features for the JOINT fc7 A/B:
    2 train / 1 val / 1 test records per leaf (all 561 leaves; drawn from
    the shipped val+test pool, merged-format epithets) and per-image
    2048-d separable features (per-leaf gaussian cluster centers + noise,
    the same protocol as the rebuild's joint quality runs) written as the
    np.save dicts the reference loads (oe_h.py:2332-2339). Returns
    (db_dir, emb_dir) so the rebuild side can consume the SAME data."""
    import numpy as np

    db_dir = os.path.join(AB_ROOT, "database", "ETHEC")
    emb_dir = os.path.join(db_dir, "ETHEC_embeddings")
    done = os.path.join(emb_dir, "test.npy")
    if os.path.exists(done):
        _install_joint_db()   # a label-only run may have restored the
        #                       full pool since — re-swap the reduced DB
        return db_dir, emb_dir
    setup_sandbox()   # ensures the merged-format pool exists
    os.makedirs(emb_dir, exist_ok=True)
    with open(os.path.join(db_dir, "train.json")) as f:
        pool = json.load(f)   # merged val+test, epithets already merged
    by_leaf = {}
    for tok in sorted(pool):
        r = pool[tok]
        by_leaf.setdefault(r["specific_epithet"], []).append(r)
    def fkey(r):
        # the dataset's image_filename rule (db.py:3857): image_path wins
        # when it contains '.JPG'
        return (r["image_path"] if ".JPG" in r["image_path"]
                else r["image_name"])

    splits = {"train": {}, "val": {}, "test": {}}
    seen_keys = set()
    for leaf in sorted(by_leaf):
        rs = by_leaf[leaf]
        picks = [rs[i % len(rs)] for i in range(4)]
        for r, split in zip(picks, ("train", "train", "val", "test")):
            tok = f"{r['token']}_{split}_{len(splits[split])}"
            rec = dict(r, token=tok)
            if fkey(rec) in seen_keys:
                # a leaf with <4 records reuses images; give the copy a
                # distinct filename so graph nodes / fc7 keys stay unique
                if ".JPG" in rec["image_path"]:
                    rec["image_path"] = f"{split}{tok}_" + rec["image_path"]
                else:
                    rec["image_name"] = f"{split}{tok}_" + rec["image_name"]
            seen_keys.add(fkey(rec))
            splits[split][tok] = rec
    for split, recs in splits.items():
        # upstream bug guard: calculate_classification_metrics slices
        # images [ix : min(ix+10, len-1)] (oe_h.py:1995-2002) — a split
        # with n % 10 == 1 images makes the last slice EMPTY and
        # get_img_features(None).to() crashes; pad by one record
        while len(recs) % 10 == 1:
            tok0 = sorted(recs)[0]
            r = dict(recs[tok0])
            tok = f"{tok0}_pad{len(recs)}"
            r["token"] = tok
            if ".JPG" in r["image_path"]:
                r["image_path"] = f"pad{len(recs)}_" + r["image_path"]
            else:
                r["image_name"] = f"pad{len(recs)}_" + r["image_name"]
            recs[tok] = r
    jdir = os.path.join(AB_ROOT, "database", "ETHEC_joint")
    os.makedirs(jdir, exist_ok=True)
    for split, recs in splits.items():
        with open(os.path.join(jdir, f"{split}.json"), "w") as f:
            json.dump(recs, f)
    # swap the reduced splits into the path the driver reads, keeping the
    # label-only DB for the other runs
    _install_joint_db()

    # separable fc7 features, deterministic per image name
    sys.path.insert(0, REF)
    leaf_names = sorted(by_leaf)
    leaf_ix = {n: i for i, n in enumerate(leaf_names)}
    rng = np.random.RandomState(0)
    mu = rng.randn(len(leaf_names), 2048).astype(np.float32)
    for split, recs in splits.items():
        d = {}
        import zlib
        for tok in sorted(recs):
            r = recs[tok]
            key = (r["image_path"] if ".JPG" in r["image_path"]
                   else r["image_name"])
            nrng = np.random.RandomState(zlib.crc32(key.encode()) % (2**31))
            d[key] = (
                mu[leaf_ix[r["specific_epithet"]]]
                + 0.15 * nrng.randn(2048).astype(np.float32)).tolist()
        np.save(os.path.join(emb_dir, f"{split}.npy"),
                np.array(d, dtype=object), allow_pickle=True)
    return db_dir, emb_dir


def setup_joint_sandbox_full():
    """REAL-SCALE joint fc7 A/B data (VERDICT r4 #5): the full 723-node
    taxonomy with the shipped splits — train = the merged val+test pool
    (the label-only A/B's protocol: upstream train.json is gitignored,
    oe_h.py:2308-2316 reads ../database/ETHEC/train.json), val/test = the
    shipped splits verbatim — plus synthetic separable 2048-d fc7 dicts
    for every image (the reduced sandbox's per-leaf gaussian protocol,
    dict values as float32 arrays). Lives in its OWN tree
    (full/database/ETHEC + full/run) so the reduced sandbox and the
    label-only DB swaps are untouched. Returns (db_dir, emb_dir,
    run_cwd)."""
    import numpy as np
    import zlib

    root = os.path.join(AB_ROOT, "full")
    db_dir = os.path.join(root, "database", "ETHEC")
    emb_dir = os.path.join(db_dir, "ETHEC_embeddings")
    run_cwd = os.path.join(root, "run")
    os.makedirs(run_cwd, exist_ok=True)
    done = os.path.join(emb_dir, "test.npy")
    if os.path.exists(done):
        return db_dir, emb_dir, run_cwd
    os.makedirs(emb_dir, exist_ok=True)

    def load_merged_format(split):
        # same merged-epithet rewrite as setup_sandbox (db.py:1848/3861)
        with open(os.path.join(REF, "splits", "ETHEC",
                               f"{split}.json")) as f:
            recs = json.load(f)
        for r in recs.values():
            if not r["specific_epithet"].startswith(r["genus"] + "_"):
                r["specific_epithet"] = (r["genus"] + "_"
                                         + r["specific_epithet"])
        return recs

    def fkey(r):
        # the dataset's image_filename rule (db.py:3857)
        return (r["image_path"] if ".JPG" in r["image_path"]
                else r["image_name"])

    def dedupe(recs, split):
        # the shipped splits contain records sharing one image file (390
        # duplicate filenames in the merged pool, incl. 51 val/test
        # overlaps); the reference's graph keys image nodes by FILENAME
        # (oe_h.py:527-531), silently collapsing them, while the rebuild
        # builds one node per record. Drop duplicates (first token wins,
        # deterministic) so both sides train on the identical node set —
        # and log the cap (no-silent-caps rule).
        out, seen = {}, {}
        for tok in sorted(recs):
            r = recs[tok]
            k = fkey(r)
            if k in seen:
                assert seen[k] == r["specific_epithet"], (
                    f"duplicate {k} with conflicting labels")
                continue
            seen[k] = r["specific_epithet"]
            out[tok] = r
        print(f"[sandbox_full] {split}: {len(recs)} records -> "
              f"{len(out)} unique images "
              f"({len(recs) - len(out)} duplicate filenames dropped)",
              flush=True)
        return out

    val = dedupe(load_merged_format("val"), "val")
    test = dedupe(load_merged_format("test"), "test")
    train = dict(val)
    train.update(test)
    train = dedupe(train, "train(=val+test)")
    splits = {"train": train, "val": val, "test": test}
    for split, recs in splits.items():
        # upstream eval-slice guard (oe_h.py:1995-2002): n % 10 == 1
        # would crash the metric loop; the shipped splits are safe
        assert len(recs) % 10 != 1, (split, len(recs))
        with open(os.path.join(db_dir, f"{split}.json"), "w") as f:
            json.dump(recs, f)

    # separable fc7 features: per-leaf gaussian centers + per-image noise
    # deterministic in the filename (identical protocol/constants to
    # setup_joint_sandbox so scales are comparable)
    leaf_names = sorted({r["specific_epithet"] for r in train.values()})
    leaf_ix = {n: i for i, n in enumerate(leaf_names)}
    rng = np.random.RandomState(0)
    mu = rng.randn(len(leaf_names), 2048).astype(np.float32)
    for split, recs in splits.items():
        d = {}
        for tok in sorted(recs):
            r = recs[tok]
            key = fkey(r)
            nrng = np.random.RandomState(zlib.crc32(key.encode()) % (2**31))
            d[key] = (mu[leaf_ix[r["specific_epithet"]]]
                      + 0.15 * nrng.randn(2048).astype(np.float32))
        np.save(os.path.join(emb_dir, f"{split}.npy"),
                np.array(d, dtype=object), allow_pickle=True)
    return db_dir, emb_dir, run_cwd


def run_joint_fc7(n_epochs, lr=0.01, full=False):
    """A/B the reference's JOINT fc7 trainer (oe_h.py JointEmbeddings,
    hyperbolic cones, FeatNet on fc7, plain config: no curriculum, no
    half_half, pick_per_level, dim 10, ratio 5, bs 10, adam lr=0.01).
    full=True runs at REAL SCALE (shipped splits, 723 labels + 10335
    train images) instead of the reduced 2/1/1-per-leaf sandbox."""
    import numpy as np

    if full:
        db_dir, emb_dir, run_cwd = setup_joint_sandbox_full()
    else:
        db_dir, emb_dir = setup_joint_sandbox()
        run_cwd = os.path.join(AB_ROOT, "run")
    setup_modules()
    os.chdir(run_cwd)

    # the reference loads its fc7 dicts with bare np.load (numpy<1.16
    # semantics); modern numpy needs allow_pickle
    import functools

    np.load = functools.partial(np.load, allow_pickle=True)

    import network.oe_h as mod

    fast_sweep(mod.EmbeddingMetrics)

    name = f"joint_fc7{'_full' if full else ''}_ep{n_epochs}_lr{lr}"
    args = argparse.Namespace(
        debug=False, lr=lr, alpha=0.05, batch_size=10,
        load_G_from_disk=False, experiment_name=name,
        experiment_dir=AB_ROOT + "/", load_emb_from=None,
        load_cosine_emb=None, image_dir="/nonexistent-images",
        n_epochs=n_epochs, n_workers=0, eval_interval=5,
        embedding_dim=10, neg_to_pos_ratio=5, resume=False,
        optimizer_method="adam", merged=True, model="alexnet",
        loss="euc_cones_loss", use_CNN=False, pick_per_level=True,
        freeze_weights=False, half_half=False, hide_levels=False,
        set_mode="train", lr_step=[])

    log_path = os.path.join(AB_ROOT, f"{name}.log")
    t0 = time.time()
    log_f = open(log_path, "w")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = Tee(old_out, log_f)
    sys.stderr = Tee(old_err, log_f)
    status = "ok"
    try:
        mod.order_embedding_labels_with_images_train_model(args)
    except Exception as e:
        import traceback

        status = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        print(f"== driver raised after/while training: {status}")
    finally:
        sys.stdout, sys.stderr = old_out, old_err
        log_f.close()

    with open(log_path) as f:
        log_text = f.read()
    results = parse_joint_final(log_text)
    results.update(status=status, wall_s=round(time.time() - t0, 1),
                   kind="joint_fc7_full" if full else "joint_fc7",
                   lr=lr, n_epochs=n_epochs)
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


def parse_joint_final(log_text):
    """Headline numbers from the joint driver's stdout: per-phase
    'm-F1: X Accuracy: Y' blocks (oe_h.py:2167-2168; the LAST test block
    is the post-best-reload final pass), best val score, reconstruction."""
    out = {}
    m = re.findall(r"Best val score: ([0-9.]+)", log_text)
    if m:
        out["best_val_m_f1"] = float(m[-1])
    blocks = re.findall(
        r"=+ (\w+) - Classification metrics =+\s*\n"
        r"m-F1: ([0-9.]+) Accuracy: ([0-9.]+)", log_text)
    for phase, f1, acc in blocks:
        out[f"last_{phase}_m_f1"] = float(f1)
        out[f"last_{phase}_accuracy"] = float(acc)
    m = re.findall(r"Reconstruction task: F1: ([0-9.]+),\s+"
                   r"Accuracy: ([0-9.]+)", log_text)
    if m:
        out["reconstruction_f1"] = float(m[-1][0])
        out["reconstruction_accuracy"] = float(m[-1][1])
    return out


def run_rebuild_joint_fc7(n_epochs, lr=0.01, full=False):
    """The rebuild's fc7 joint trainer on the IDENTICAL sandbox data the
    reference joint_fc7 run consumes (same splits, same fc7 feature
    dicts, same hyperparameters) — the two-column joint A/B. full=True
    reads the real-scale tree (setup_joint_sandbox_full); set LE_AB_TPU=1
    to run this leg on the attached TPU chip (cwd must be /root/repo at
    launch) instead of forcing CPU."""
    import numpy as np

    if full:
        jdir, emb_dir, _ = setup_joint_sandbox_full()
    else:
        db_dir, emb_dir = setup_joint_sandbox()
        jdir = os.path.join(AB_ROOT, "database", "ETHEC_joint")
    if not os.environ.get("LE_AB_TPU"):
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    from learning_embeddings_tpu.hierarchy import labelmap_from_records
    from learning_embeddings_tpu.losses.joint_sampling import (
        build_joint_graph)
    from learning_embeddings_tpu.train.joint import JointTrainerConfig
    from learning_embeddings_tpu.train.runner import run_joint_embedding

    splits, feats = {}, {}
    for split in ("train", "val", "test"):
        with open(os.path.join(jdir, f"{split}.json")) as f:
            recs = list(json.load(f).values())
        for r in recs:
            # the sandbox stores the MERGED epithet the reference labelmap
            # expects; the rebuild's record loader merges itself
            if r["specific_epithet"].startswith(r["genus"] + "_"):
                r["specific_epithet"] = r["specific_epithet"][
                    len(r["genus"]) + 1:]
        splits[split] = recs
        d = np.load(os.path.join(emb_dir, f"{split}.npy"),
                    allow_pickle=True)[()]
        feats[split] = np.asarray(
            [d[(r["image_path"] if ".JPG" in r["image_path"]
                else r["image_name"])] for r in recs], np.float32)

    lm = labelmap_from_records(
        [r for rs in splits.values() for r in rs])
    assert lm.n_classes == 723, lm.levels

    def level_labels(recs):
        from learning_embeddings_tpu.data import encode_records

        return encode_records(recs, lm).level_labels

    ll = {s: level_labels(rs) for s, rs in splits.items()}
    graph, train_edges = build_joint_graph(lm, ll["train"])
    cfg = JointTrainerConfig(
        energy="hyp_cone", embedding_dim=10, feature_dim=2048,
        lr_labels=lr, lr_images=1e-3, batch_size=10, neg_to_pos_ratio=5,
        alpha=0.05, optimizer_labels="adam", pick_per_level=True, seed=0)
    name = f"rebuild_joint_fc7{'_full' if full else ''}_ep{n_epochs}_lr{lr}"
    t0 = time.time()
    res = run_joint_embedding(
        lm, graph, train_edges, feats["train"], cfg,
        experiment_dir=AB_ROOT, experiment_name=name,
        n_epochs=n_epochs, eval_interval=5,
        eval_features={s: feats[s] for s in ("val", "test")},
        eval_paths={s: ll[s] + np.asarray(lm.level_start)[None, :]
                    for s in ("val", "test")},
        manifest_args={"ab": "joint_fc7"})
    flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
    flat.update({f"test_{k}": v for k, v in res["test_metrics"].items()})
    flat.update(wall_s=round(time.time() - t0, 1),
                kind=("rebuild_joint_fc7_full" if full
                      else "rebuild_joint_fc7"),
                lr=lr, n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = json.load(open(res_path)) if os.path.exists(res_path) else {}
    blob[name] = flat
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {flat}")
    return flat


# --------------------------------------------------------------- use_CNN A/B
# the 12 species of the reference's own debug taxonomy
# (ETHECLabelMapMergedSmall, db.py:3661-3747): 5/6/9/12 = 32 nodes
SMALL_SPECIES = [
    "Ochlodes_venata", "Hesperia_comma", "Pyrgus_alveus",
    "Spialia_sertorius", "Hamearis_lucina", "Polycaena_tamerlana",
    "Agriades_lehanus", "Parnassius_jacquemonti", "Aporia_crataegi",
    "Aporia_procris", "Aporia_potanini", "Aporia_nabellica"]
CNN_PER_LEAF = (4, 2, 2)   # train/val/test records per species


def setup_cnn_sandbox():
    """Debug-taxonomy DB + REAL separable JPEGs for the `--use_CNN` pixel
    A/B: 4/2/2 records per species over the reference's own 12-species
    debug labelmap, one grayscale 8x8 pattern per species upsampled to
    64px + per-image noise, written as baseline JPEGs at the exact path
    BOTH sides resolve — the reference's imageless-joint rule
    `join(image_dir, image_path, image_path)` (db.py:3850-3854 with
    image_folder == image_path) and the rebuild's
    `join(image_dir, image_path, image_name)` (records.py:52) coincide
    when image_path == image_name. Channels are equal (R=G=B) so cv2's
    BGR read and PIL's RGB read return byte-identical tensors.

    Returns (jdir_merged, jdir_raw, img_dir): merged-epithet jsons for the
    reference (ETHECLabelMapMerged keying), raw-epithet jsons for the
    rebuild CLI (its loader merges genus+epithet itself), one image root.
    """
    import numpy as np
    from PIL import Image

    jdir_m = os.path.join(AB_ROOT, "database", "ETHEC_cnn")
    jdir_r = os.path.join(AB_ROOT, "database", "ETHEC_cnn_rebuild")
    img_dir = os.path.join(AB_ROOT, "images_cnn")
    emb_dir = os.path.join(AB_ROOT, "database", "ETHEC",
                           "ETHECSmall_embeddings")
    if os.path.exists(os.path.join(emb_dir, "test.npy")):
        return jdir_m, jdir_r, img_dir
    setup_sandbox()
    for d in (jdir_m, jdir_r, img_dir, emb_dir):
        os.makedirs(d, exist_ok=True)

    with open(os.path.join(AB_ROOT, "database", "ETHEC",
                           "train.json.labelonly")
              if os.path.exists(os.path.join(
                  AB_ROOT, "database", "ETHEC", "train.json.labelonly"))
              else os.path.join(AB_ROOT, "database", "ETHEC",
                                "train.json")) as f:
        pool = json.load(f)   # merged-epithet val+test pool
    by_leaf = {s: [] for s in SMALL_SPECIES}
    for tok in sorted(pool):
        r = pool[tok]
        if r["specific_epithet"] in by_leaf:
            by_leaf[r["specific_epithet"]].append(r)

    n_tr, n_va, n_te = CNN_PER_LEAF
    splits_m = {"train": {}, "val": {}, "test": {}}
    rng = np.random.RandomState(7)
    for li, leaf in enumerate(SMALL_SPECIES):
        rs = by_leaf[leaf]
        assert rs, f"no records for debug species {leaf}"
        pat8 = rng.randint(0, 256, (8, 8))
        picks = [(rs[i % len(rs)], split)
                 for i, split in enumerate(
                     ["train"] * n_tr + ["val"] * n_va + ["test"] * n_te)]
        for i, (r, split) in enumerate(picks):
            name = f"ab_cnn_{li:02d}_{i}_{split}.JPG"
            rec = dict(r, token=f"{leaf}_{split}_{i}",
                       image_path=name, image_name=name)
            splits_m[split][rec["token"]] = rec
            # the image: per-species pattern + per-image noise, R=G=B
            irng = np.random.RandomState(100003 * li + 17 * i + 1)
            up = np.kron(pat8, np.ones((8, 8), np.int64))
            img = np.clip(up + irng.randint(-25, 26, up.shape),
                          0, 255).astype(np.uint8)
            os.makedirs(os.path.join(img_dir, name), exist_ok=True)
            Image.fromarray(np.stack([img] * 3, axis=-1)).save(
                os.path.join(img_dir, name, name), quality=95)

    for split, recs in splits_m.items():
        with open(os.path.join(jdir_m, f"{split}.json"), "w") as f:
            json.dump(recs, f)
        raw = {}
        for tok, r in recs.items():
            rr = dict(r)
            if rr["specific_epithet"].startswith(rr["genus"] + "_"):
                rr["specific_epithet"] = rr["specific_epithet"][
                    len(rr["genus"]) + 1:]
            raw[tok] = rr
        with open(os.path.join(jdir_r, f"{split}.json"), "w") as f:
            json.dump(raw, f)
        # the debug driver np.loads fc7 dicts unconditionally even with
        # --use_CNN (oe_h.py:2334-2337); give it valid (unused) features
        d = {r["image_path"]: np.zeros(2048, np.float32).tolist()
             for r in recs.values()}
        np.save(os.path.join(emb_dir, f"{split}.npy"),
                np.array(d, dtype=object), allow_pickle=True)
    return jdir_m, jdir_r, img_dir


def _install_cnn_db():
    """Point ../database/ETHEC/{split}.json (the path the debug driver
    hard-codes) at the CNN sandbox jsons; returns a restore() handle."""
    db_dir = os.path.join(AB_ROOT, "database", "ETHEC")
    jdir_m = os.path.join(AB_ROOT, "database", "ETHEC_cnn")
    saved = {}
    for split in ("train", "val", "test"):
        full = os.path.join(db_dir, f"{split}.json")
        if os.path.exists(full):
            with open(full) as f:
                saved[split] = f.read()
        with open(os.path.join(jdir_m, f"{split}.json")) as f:
            blob = f.read()
        with open(full, "w") as f:
            f.write(blob)

    def restore():
        for split, blob in saved.items():
            with open(os.path.join(db_dir, f"{split}.json"), "w") as f:
                f.write(blob)

    return restore


def run_joint_cnn_ref(n_epochs, lr=0.01):
    """A/B the reference's `--use_CNN --debug` joint trainer: the REAL
    oe_h JointEmbeddings with FeatCNN18 (resnet18 tower on pixels,
    oe_h.py:281-328, 1403-1405), hyperbolic cones, adam, on the
    12-species debug taxonomy with real JPEGs.

    Harness shims beyond the fc7 run's (documented, semantics-neutral):
      * torchvision transforms + resnet18 are real implementations in the
        stub (torchvision isn't installed; both sides start from random
        init — no pretrained weights offline).
      * ETHECSmall's token filter predates the merged DB format: it tests
        `f"{genus}_{specific_epithet}"` (db.py:3653-3658), which on
        merged records gives 'Genus_Genus_epithet' and matches nothing —
        the debug DB the driver loads IS merged (oe_h.py:2318-2321).
        The shim filters by the merged epithet directly.
    Known upstream artifact carried through on purpose: the eval loop's
    `min(ix+bs, len-1)` clamp never embeds the LAST image and LAST label
    of each split (oe_h.py:1996-2017) — negligible at full scale (1/723),
    ~4% of a 24-image debug split; noted next to the numbers."""
    import numpy as np

    setup_cnn_sandbox()
    setup_modules()
    os.chdir(os.path.join(AB_ROOT, "run"))

    import functools

    np.load = functools.partial(np.load, allow_pickle=True)

    import data.db as dbmod

    def _small_init(self, path_to_json, single_level=False):
        lmap = dbmod.ETHECLabelMapMergedSmall(single_level)
        self.path_to_json = path_to_json
        with open(path_to_json) as json_file:
            self.data_dict = json.load(json_file)
        self.data_tokens = [
            tok for tok in self.data_dict
            if self.data_dict[tok]["specific_epithet"]
            in lmap.genus_specific_epithet]

    dbmod.ETHECSmall.__init__ = _small_init

    import network.oe_h as mod

    fast_sweep(mod.EmbeddingMetrics)

    name = f"joint_cnn_ep{n_epochs}_lr{lr}"
    args = argparse.Namespace(
        debug=True, lr=lr, alpha=0.05, batch_size=10,
        load_G_from_disk=False, experiment_name=name,
        experiment_dir=AB_ROOT + "/", load_emb_from=None,
        load_cosine_emb=None,
        image_dir=os.path.join(AB_ROOT, "images_cnn"),
        n_epochs=n_epochs, n_workers=0, eval_interval=5,
        embedding_dim=10, neg_to_pos_ratio=5, resume=False,
        optimizer_method="adam", merged=True, model="resnet18",
        loss="euc_cones_loss", use_CNN=True, pick_per_level=True,
        freeze_weights=False, half_half=False, hide_levels=False,
        set_mode="train", lr_step=[])

    restore = _install_cnn_db()
    log_path = os.path.join(AB_ROOT, f"{name}.log")
    t0 = time.time()
    log_f = open(log_path, "w")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = Tee(old_out, log_f)
    sys.stderr = Tee(old_err, log_f)
    status = "ok"
    try:
        mod.order_embedding_labels_with_images_train_model(args)
    except Exception as e:
        import traceback

        status = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        print(f"== driver raised after/while training: {status}")
    finally:
        sys.stdout, sys.stderr = old_out, old_err
        log_f.close()
        restore()

    with open(log_path) as f:
        results = parse_joint_final(f.read())
    results.update(status=status, wall_s=round(time.time() - t0, 1),
                   kind="joint_cnn", lr=lr, n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = json.load(open(res_path)) if os.path.exists(res_path) else {}
    blob[name] = results
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {results}")
    return results


def run_rebuild_joint_cnn(n_epochs, lr=0.01):
    """The rebuild's `--use_CNN` CLI (cli/oe_h.py, resnet18@224 tower) on
    the IDENTICAL sandbox: same 12-species debug splits, the same JPEG
    files, matched hyperparameters (bs 10, ratio 5, dim 10, alpha 0.05,
    adam; lr_images fixed at 1e-3 like the reference's hard-coded
    JointEmbeddings.lr_images, oe_h.py:1361)."""
    jdir_m, jdir_r, img_dir = setup_cnn_sandbox()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    from learning_embeddings_tpu.cli.oe_h import main as oe_h_main

    name = f"rebuild_joint_cnn_ep{n_epochs}_lr{lr}"
    t0 = time.time()
    res = oe_h_main([
        "--data_dir", jdir_r, "--image_dir", img_dir, "--debug",
        "--use_CNN", "--model", "resnet18", "--image_size", "224",
        "--loss", "euc_cones_loss", "--pick_per_level",
        "--batch_size", "10", "--neg_to_pos_ratio", "5",
        "--embedding_dim", "10", "--alpha", "0.05",
        "--lr", str(lr), "--lr_images", "0.001",
        "--n_epochs", str(n_epochs), "--eval_interval", "5",
        "--experiment_dir", AB_ROOT, "--experiment_name", name,
        "--set_mode", "train", "--merged"])
    flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
    flat.update({f"test_{k}": v for k, v in res["test_metrics"].items()})
    flat.update(wall_s=round(time.time() - t0, 1),
                kind="rebuild_joint_cnn", lr=lr, n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = json.load(open(res_path)) if os.path.exists(res_path) else {}
    blob[name] = flat
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {flat}")
    return flat


# ----------------------------------------------------------- classifier A/B
def _install_cnn_db_butterfly():
    """The debug classifier driver hard-codes
    ../database/butterfly200/{split}.json for ALL its branches
    (ethec_experiments.py:315-323) — point those at the CNN sandbox jsons;
    returns a restore() handle (the hyp-cones label A/B owns that dir)."""
    db_dir = os.path.join(AB_ROOT, "database", "butterfly200")
    os.makedirs(db_dir, exist_ok=True)
    jdir_m = os.path.join(AB_ROOT, "database", "ETHEC_cnn")
    saved = {}
    for split in ("train", "val", "test"):
        full = os.path.join(db_dir, f"{split}.json")
        if os.path.exists(full):
            with open(full) as f:
                saved[split] = f.read()
        with open(os.path.join(jdir_m, f"{split}.json")) as f:
            blob = f.read()
        with open(full, "w") as f:
            f.write(blob)

    def restore():
        for split, blob in saved.items():
            with open(os.path.join(db_dir, f"{split}.json"), "w") as f:
                f.write(blob)

    return restore


def _ref_level_metrics_from_npy(npy_dir):
    """Per-level metrics of the reference's final best-model test pass,
    computed by the REFERENCE'S OWN evaluator (MultiLevelEvaluation →
    MetricsMultiLevel) over the predicted_scores/correct_labels dumps
    load_best_model writes (finetuner.py:263-265; experiment.py:217-224).
    phase='train' skips the Summarize file-writing branch — the math is
    identical (evaluation.py:560-601)."""
    import numpy as np
    from data.db import ETHECLabelMapMergedSmall
    from network.evaluation import MultiLevelEvaluation

    lm = ETHECLabelMapMergedSmall()
    ev = MultiLevelEvaluation(os.path.join(AB_ROOT, "tmp_eval"), lm)
    ps = np.load(os.path.join(npy_dir, "predicted_scores.npy"))
    cl = np.load(os.path.join(npy_dir, "correct_labels.npy"))
    glob, level_wise = ev.evaluate(ps, cl, epoch=0, phase="train",
                                   save_to_tensorboard=True,
                                   samples_split=None)
    out = {"test_micro_f1": float(glob["micro"]["f1"]),
           "test_macro_f1": float(glob["macro"]["f1"]),
           "test_accuracy": float(glob["accuracy_score"])}
    for name, m in level_wise.items():
        out[f"test_{name}_micro_f1"] = float(m["micro"]["f1"])
        out[f"test_{name}_macro_f1"] = float(m["macro"]["f1"])
    return out


def _parse_ml_summary(exp_dir):
    """Per-level metrics for the multi_label leg from the reference's OWN
    MultiLabelEvaluation: the best-model test pass writes
    stats/best_test<epoch>/summary.md with a Global Metrics table and one
    table per level (evaluation.py:235-266). The thresholded decode lives
    only inside the training process (optimal_thresholds), so the npy
    re-evaluation used for the MLEVAL criteria does not apply here."""
    import glob

    dirs = sorted(glob.glob(os.path.join(exp_dir, "stats", "best_test*")),
                  key=os.path.getmtime)
    if not dirs:
        return {}
    text = open(os.path.join(dirs[-1], "summary.md")).read()
    out = {}
    # '## <name> Metrics' headings followed by a Macro/Micro table whose
    # columns are Precision | Recall | F1 | Accuracy
    for m in re.finditer(
            r"## (.+?) Metrics\s*\n\n(?:\|[^\n]*\n){2}"
            r"\| \*\*Macro\*\* \| ([0-9.e-]+) \| ([0-9.e-]+) \| "
            r"([0-9.e-]+) \| ([0-9.e-]+) \|"
            r"[^\n]*\n\| \*\*Micro\*\* \| ([0-9.e-]+) \| ([0-9.e-]+) \| "
            r"([0-9.e-]+) \|", text):
        key = m.group(1).strip().lower().replace(" ", "_")
        out[f"test_{key}_macro_f1"] = float(m.group(4))
        out[f"test_{key}_micro_f1"] = float(m.group(8))
    return out


def run_classifier_ref(n_epochs, loss="multi_level", lr=0.001,
                       use_2d=False, revive_ml=False):
    """A/B the reference's multi-head CNN classifier — the LAST family
    never run upstream: ETHEC_train_model --debug
    (ethec_experiments.py:243-434), the real CIFAR10/ETHECExperiment
    trainer (finetuner.py:199-307) with MultiLevelEvaluation
    (evaluation.py:555-660), resnet18 @448 (input size hard-coded,
    ethec_experiments.py:256-257), adam, WeightedResampler (inv), on the
    12-species debug taxonomy with the SAME separable JPEGs as the
    --use_CNN A/B (setup_cnn_sandbox). loss ∈ {multi_level, masked_loss,
    last_level, hsoftmax, multi_label}. Both sides random-init (no
    torchvision weights offline — stub prints the notice).

    use_2d=True drives the ETHEC2D variant instead
    (ethec_experiments.py:52-200): CNN2DFeat's bias-free 2-d bottleneck
    with per-level bias-free heads, label-representation plots every
    eval, PR plotting every 10th epoch — the same CIFAR10.train() /
    load_best_model() tail, so the npy-dump extractor applies."""
    setup_cnn_sandbox()
    setup_modules()
    os.chdir(os.path.join(AB_ROOT, "run"))

    import data.db as dbmod

    def _small_init(self, path_to_json, single_level=False):
        lmap = dbmod.ETHECLabelMapMergedSmall(single_level)
        self.path_to_json = path_to_json
        with open(path_to_json) as json_file:
            self.data_dict = json.load(json_file)
        self.data_tokens = [
            tok for tok in self.data_dict
            if self.data_dict[tok]["specific_epithet"]
            in lmap.genus_specific_epithet]

    dbmod.ETHECSmall.__init__ = _small_init

    import network.ethec_experiments as mod

    if revive_ml:
        # Upstream bitrot revival #2 (evaluator contract, one-line fix):
        # finetuner.py:267 unpacks `metrics, level_wise_metrics` from
        # eval.evaluate, but MultiLabelEvaluation.evaluate — the ML path
        # every multi_label run uses — returns ONLY global_metrics
        # (evaluation.py:196-287); MultiLevelEvaluation honors the
        # two-tuple contract. First recorded verbatim as
        # classifier_multi_label_ep1_lr0.001 (ValueError: too many values
        # to unpack). The upstream fix is `return global_metrics,
        # level_wise_metrics`; since level_wise_metrics is a local, the
        # shim re-runs the function's OWN per-level loop (same
        # MetricsMultiLevel over the same self.predicted_labels set by
        # the original call — byte-identical inputs, pure computation)
        # and returns the pair.
        import network.evaluation as ev

        _orig_evaluate = ev.MultiLabelEvaluation.evaluate

        def _evaluate_pair(self, predicted_scores, correct_labels,
                           *a, **kw):
            gm = _orig_evaluate(self, predicted_scores, correct_labels,
                                *a, **kw)
            level_wise, start = {}, 0
            for level_id, level_len in enumerate(self.labelmap.levels):
                calc = ev.MetricsMultiLevel(self.predicted_labels,
                                            correct_labels)
                level_wise[self.labelmap.level_names[level_id]] = (
                    calc.calculate_basic_metrics(
                        list(range(start, start + level_len))))
                start += level_len
            return gm, level_wise

        ev.MultiLabelEvaluation.evaluate = _evaluate_pair

    if use_2d:
        # Upstream bitrot revival (one class attribute): ETHEC2D skips
        # CIFAR10.__init__ so it never sets model_name, and the driver's
        # unconditional prepare_model() (ethec_experiments.py:427) reads
        # it (finetuner.py:142). Any 'resnet'/'alexnet' value would make
        # prepare_model CLOBBER the 2-d bottleneck head CNN2DFeat already
        # built (CNN2DFeat has no .fc → AttributeError); a non-matching
        # name skips the head surgery, which is the only behavior
        # consistent with ETHEC2D's own __init__. First recorded verbatim
        # as classifier2d_multi_level_ep1 (AttributeError) in
        # experiments/ref_ab/results.json.
        mod.ETHEC2D.model_name = "cnn2d"

    name = (f"classifier{'2d' if use_2d else ''}_{loss}"
            f"{'_revived' if revive_ml else ''}_ep{n_epochs}_lr{lr}")
    args = argparse.Namespace(
        debug=True, lr=lr, batch_size=10, evaluator="ML",
        experiment_name=name, experiment_dir=AB_ROOT + "/",
        image_dir=os.path.join(AB_ROOT, "images_cnn"),
        n_epochs=n_epochs, n_workers=0, eval_interval=5,
        resume=False, optimizer_method="adam", merged=True,
        model="resnet18", loss=loss, use_grayscale=False,
        class_weights=False, weight_strategy="inv",
        freeze_weights=False, set_mode="train", level_weights=None,
        lr_step=[], use_2d=use_2d)

    restore = _install_cnn_db_butterfly()
    log_path = os.path.join(AB_ROOT, f"{name}.log")
    t0 = time.time()
    log_f = open(log_path, "w")
    old_out, old_err = sys.stdout, sys.stderr
    sys.stdout = Tee(old_out, log_f)
    sys.stderr = Tee(old_err, log_f)
    status = "ok"
    try:
        mod.ETHEC_train_model(args)
    except Exception as e:
        import traceback

        status = f"{type(e).__name__}: {e}"
        traceback.print_exc()
        print(f"== driver raised after/while training: {status}")
    finally:
        sys.stdout, sys.stderr = old_out, old_err
        log_f.close()
        restore()

    with open(log_path) as f:
        log_text = f.read()
    results = {}
    m = re.findall(r"Best val score: ([0-9.]+)", log_text)
    if m:
        results["best_val_micro_f1"] = float(m[-1])
    # the finetuner's own per-phase print ('{} Loss: .. Score: ..',
    # finetuner.py:298); the LAST test line is the post-best-reload pass
    m = re.findall(r"test Loss: [0-9.eE+-]+ Score: ([0-9.]+)", log_text)
    if m:
        results["test_micro_f1_log"] = float(m[-1])
    try:
        if revive_ml:
            # npy re-evaluation decodes by argmax (MultiLevelEvaluation);
            # the multi_label leg's native decode is thresholded — parse
            # the reference evaluator's own summary.md tables instead
            results.update(_parse_ml_summary(os.path.join(AB_ROOT, name)))
        else:
            results.update(_ref_level_metrics_from_npy(
                os.path.join(AB_ROOT, name)))
    except Exception as e:
        results["level_metrics_error"] = repr(e)[:200]
    results.update(status=status, wall_s=round(time.time() - t0, 1),
                   kind="classifier2d_ref" if use_2d else "classifier_ref",
                   loss=loss, lr=lr, n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = json.load(open(res_path)) if os.path.exists(res_path) else {}
    blob[name] = results
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {results}")
    return results


def run_rebuild_classifier(n_epochs, loss="multi_level", lr=0.001,
                           use_2d=False):
    """The rebuild's classifier CLI (cli/ethec_experiments.py) on the
    IDENTICAL sandbox: same 12-species splits (raw-epithet jsons — the
    rebuild derives the taxonomy from records), the same JPEG files,
    matched hyperparameters (resnet18 @448, bs 10, adam, WeightedResampler
    inv — the reference's class_weights=False path). Reports the same
    per-level m-F1 axes from its own MLEVAL evaluator."""
    jdir_m, jdir_r, img_dir = setup_cnn_sandbox()
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)

    from learning_embeddings_tpu.cli.ethec_experiments import main as cls_main

    name = (f"rebuild_classifier{'2d' if use_2d else ''}_"
            f"{loss}_ep{n_epochs}_lr{lr}")
    t0 = time.time()
    res = cls_main([
        "--set_mode", "train", "--loss", loss,
        "--data_dir", jdir_r, "--image_dir", img_dir,
        "--model", "resnet18", "--image_size", "448",
        "--batch_size", "10", "--lr", str(lr),
        "--n_epochs", str(n_epochs), "--eval_interval", "5",
        "--experiment_dir", AB_ROOT, "--experiment_name", name,
        "--merged"] + (["--use_2d"] if use_2d else []))
    flat = {k: v for k, v in res.items() if isinstance(v, (int, float))}
    flat.update({f"test_{k.replace('/', '_')}": v
                 for k, v in res["test_metrics"].items()})
    flat.update(wall_s=round(time.time() - t0, 1),
                kind=("rebuild_classifier2d" if use_2d
                      else "rebuild_classifier"),
                loss=loss, lr=lr, n_epochs=n_epochs)
    res_path = os.path.join(AB_ROOT, "results.json")
    blob = json.load(open(res_path)) if os.path.exists(res_path) else {}
    blob[name] = flat
    with open(res_path, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"== {name}: {flat}")
    return flat


def run_one(kind, n_epochs, lr=None):
    """kind: order | euc_cones (order_embeddings.py, adam)
             hyp_cones (order_embeddings_h.py, manual RSGD update)."""
    run_cwd = setup_sandbox()
    restore_labelonly_db()   # a previous joint_fc7 run may have left the
    #                          reduced 2/1/1 DB swapped into place
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
        loss, alpha = "euc_cones_loss", 0.05
        use_lr = lr if lr is not None else 0.001
    elif kind == "order":
        import network.order_embeddings as mod
        loss, alpha = "order_emb_loss", 1.0
        use_lr = lr if lr is not None else 0.001
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
    if kind in ("joint_fc7", "joint_fc7_full"):
        run_joint_fc7(n_epochs, lr if lr is not None else 0.01,
                      full=kind.endswith("_full"))
        sys.exit(0)
    if kind in ("rebuild_joint_fc7", "rebuild_joint_fc7_full"):
        run_rebuild_joint_fc7(n_epochs, lr if lr is not None else 0.01,
                              full=kind.endswith("_full"))
        sys.exit(0)
    if kind == "joint_cnn":
        run_joint_cnn_ref(n_epochs, lr if lr is not None else 0.01)
        sys.exit(0)
    if kind == "rebuild_joint_cnn":
        run_rebuild_joint_cnn(n_epochs, lr if lr is not None else 0.01)
        sys.exit(0)
    if "classifier" in kind and ("_" in kind):
        # classifier[2d]_<loss> / rebuild_classifier[2d]_<loss>,
        # loss ∈ {multi_level, masked_loss, last_level, hsoftmax,
        #          multi_label}
        use_2d = "classifier2d_" in kind
        loss = kind.split("classifier2d_" if use_2d else "classifier_",
                          1)[1]
        kw = {}
        if loss == "multi_label_revived":     # evaluator-contract revival
            loss, kw = "multi_label", {"revive_ml": True}
        fn = (run_rebuild_classifier if kind.startswith("rebuild_")
              else run_classifier_ref)
        fn(n_epochs, loss=loss, lr=lr if lr is not None else 0.001,
           use_2d=use_2d, **kw)
        sys.exit(0)
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
