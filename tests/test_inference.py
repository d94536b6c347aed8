"""End-to-end inference harness tests: train a tiny experiment on a
synthetic ETHEC-schema dataset, then rebuild it from config_params.txt and
run the occlusion explainer + t-SNE feature dump on it (reference
inference.py:42-372)."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_experiment(tmp_path_factory):
    import cv2

    from learning_embeddings_tpu.cli.ethec_experiments import main as train_main

    root = tmp_path_factory.mktemp("inf")
    data_dir = root / "splits"
    img_dir = root / "images"
    os.makedirs(data_dir)
    rng = np.random.RandomState(0)

    recs = []
    t = 0
    for leaf in range(3):
        for _ in range(8):
            recs.append({
                "token": f"tok{t}",
                "image_path": "imgs",
                "image_name": f"im_{t}.jpg",
                "family": f"F{leaf % 2}",
                "subfamily": f"S{leaf % 2}",
                "genus": f"G{leaf % 2}",
                "specific_epithet": f"e{leaf}",
            })
            t += 1
    with open(data_dir / "val.json", "w") as f:
        json.dump({r["token"]: r for r in recs}, f)
    os.makedirs(img_dir / "imgs")
    for r in recs:
        cv2.imwrite(str(img_dir / "imgs" / r["image_name"]),
                    rng.randint(0, 255, (40, 48, 3), np.uint8))

    train_main((f"--set_mode train --data_dir {data_dir} "
                f"--image_dir {img_dir} --model resnet18 --loss multi_level "
                f"--n_epochs 1 --batch_size 4 --image_size 32 --lr 0.01 "
                f"--n_workers 2 --experiment_name exp "
                f"--experiment_dir {root / 'exps'}").split())
    return str(root / "exps" / "exp"), str(img_dir)


def test_occlusion_explainer_outputs(tiny_experiment):
    from learning_embeddings_tpu.cli.inference import run_occlusion

    exp_path, img_dir = tiny_experiment
    out_dir = run_occlusion(exp_path, img_dir, split="test", n_samples=2)
    assert os.path.exists(os.path.join(out_dir, "summary.md"))
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 2
    md = open(os.path.join(out_dir, "summary.md")).read()
    assert "Occlusion explanations" in md and "sample_1.png" in md


def test_lime_explainer_outputs(tiny_experiment):
    from learning_embeddings_tpu.cli.inference import run_lime

    exp_path, img_dir = tiny_experiment
    out_dir = run_lime(exp_path, img_dir, split="test", n_samples=1,
                       num_perturb=40, n_slic_segments=12)
    assert os.path.exists(os.path.join(out_dir, "summary.md"))
    md = open(os.path.join(out_dir, "summary.md")).read()
    assert "LIME explanations" in md and "Ground truth" in md
    assert "Predicted:" in md and "color:" in md
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    # 1 sample x 4 levels x top-k labels (k <= 5, bounded by level size)
    assert len(pngs) >= 4
    for f in pngs:
        import matplotlib.image as mpimg
        arr = mpimg.imread(os.path.join(out_dir, f))
        assert np.isfinite(arr).all()


def test_tsne_feature_dump(tiny_experiment):
    from learning_embeddings_tpu.cli.inference import run_tsne

    exp_path, img_dir = tiny_experiment
    out = run_tsne(exp_path, img_dir, splits=("val",), max_samples=8,
                   render=False)
    F, L = out["val"]
    assert F.shape[0] == L.shape[0] == 8
    assert F.shape[1] == 512  # resnet18 trunk features
    assert np.isfinite(F).all()
    stats = os.path.join(exp_path, "stats")
    assert os.path.exists(os.path.join(stats, "val_representations.npy"))


def test_post_process_confusion_cli(tiny_experiment):
    from learning_embeddings_tpu.cli.post_process import main

    exp_path, _ = tiny_experiment
    out = main(["--experiment_path", exp_path,
                "--predicted_level", "3", "--gt_level", "1"])
    assert os.path.exists(out)
