"""Tiny-config debug launchers — counterpart of the reference's (misnamed)
`network/profiling.py` (:7-108): canned CLI strings for quickly exercising
each workload. Each launcher runs a minimal end-to-end configuration on
synthetic/debug data; useful as living smoke tests.

    python -m learning_embeddings_tpu.cli.debug_launchers [ethec|toy|emb|joint|fmnist|cifar]
"""

from __future__ import annotations

import os
import sys
import tempfile


def toy():
    from .embed_toy import main

    with tempfile.TemporaryDirectory() as d:
        return main(("--pick_per_level --tree_levels 3 --tree_branching 2 "
                     "--n_epochs 50 --lr 0.03 --loss hyp_cones_loss "
                     "--embedding_dim 2 --neg_to_pos_ratio 5 --alpha 0.01 "
                     "--experiment_name toy_dbg --batch_size 10 "
                     f"--experiment_dir {d}").split())


def emb():
    from .order_embeddings import main

    with tempfile.TemporaryDirectory() as d:
        return main(("--debug --set_mode train --loss order_emb_loss "
                     "--n_epochs 20 --lr 0.01 --embedding_dim 6 "
                     "--experiment_name emb_dbg "
                     f"--experiment_dir {d}").split())


def _fixture_images(datasets):
    import cv2
    import numpy as np

    root = tempfile.mkdtemp(prefix="dbg_imgs_")
    rng = np.random.RandomState(0)
    for ds in datasets.values():
        for p in ds.image_paths:
            full = os.path.join(root, p)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            if not os.path.exists(full):
                cv2.imwrite(full, rng.randint(0, 255, (64, 80, 3), np.uint8))
    return root


def ethec():
    from .common import load_ethec_data
    from .ethec_experiments import main

    _, datasets, _ = load_ethec_data(
        os.environ.get("ETHEC_SPLITS_DIR", "/root/reference/splits/ETHEC"),
        debug=True)
    img_root = _fixture_images(datasets)
    with tempfile.TemporaryDirectory() as d:
        return main(("--debug --set_mode train --loss multi_level "
                     "--model resnet18 --n_epochs 1 --batch_size 8 "
                     "--image_size 64 --n_workers 2 --experiment_name e_dbg "
                     f"--experiment_dir {d} --image_dir {img_root}").split())


def joint():
    """fc7 precompute + oe_h on debug fixtures."""
    import json

    from ..data import save_ethec_json
    from .common import load_ethec_data
    from .image_emb import main as emb_main
    from .oe_h import main as oeh_main

    _, datasets, records = load_ethec_data(
        os.environ.get("ETHEC_SPLITS_DIR", "/root/reference/splits/ETHEC"),
        debug=True)
    img_root = _fixture_images(datasets)
    data_dir = tempfile.mkdtemp(prefix="dbg_data_")
    for s, rs in records.items():
        save_ethec_json(rs, os.path.join(data_dir, f"{s}.json"))
    emb_main(("--data_dir {} --image_dir {} --model resnet18 --image_size 64 "
              "--batch_size 16 --n_workers 2").format(data_dir, img_root).split())
    with tempfile.TemporaryDirectory() as d:
        return oeh_main(("--set_mode train --n_epochs 2 --batch_size 16 "
                         "--embedding_dim 6 --neg_to_pos_ratio 3 "
                         "--pick_per_level --experiment_name j_dbg "
                         f"--experiment_dir {d} --data_dir {data_dir} "
                         f"--image_dir {img_root}").split())


def fmnist():
    from .fashion_mnist import main

    with tempfile.TemporaryDirectory() as d:
        return main(("--debug --set_mode train --loss multi_level "
                     "--model resnet18 --n_epochs 1 --batch_size 16 "
                     "--image_size 32 --experiment_name f_dbg "
                     f"--experiment_dir {d}").split())


def cifar():
    from .cifar import main

    with tempfile.TemporaryDirectory() as d:
        return main(("--debug --set_mode train --dataset cifar10 "
                     "--loss hsoftmax --model resnet18 --n_epochs 1 "
                     "--batch_size 16 --image_size 32 --experiment_name c_dbg "
                     f"--experiment_dir {d}").split())


LAUNCHERS = {"toy": toy, "emb": emb, "ethec": ethec, "joint": joint,
             "fmnist": fmnist, "cifar": cifar}

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "toy"
    LAUNCHERS[which]()
    print(f"debug launcher '{which}' completed")
