"""Label-only hyperbolic embedding driver — counterpart of
`network/order_embeddings_h.py` __main__ (order_embeddings_h.py:1486-1528):
Poincaré-ball entailment cones with Riemannian SGD (or the conformal-adam
hybrid), optional cosine-embedding warm start."""

from __future__ import annotations

import argparse

import numpy as np

from ..hierarchy import label_graph_from_paths, split_edges
from ..train.embedding import EmbeddingTrainer, EmbeddingTrainerConfig
from ..train.runner import run_label_embedding
from .common import add_common_flags, load_ethec_data, manifest_from_args


def build_parser():
    parser = argparse.ArgumentParser()
    add_common_flags(parser)
    parser.add_argument("--embedding_dim", type=int, default=10)
    parser.add_argument("--neg_to_pos_ratio", type=int, default=5)
    parser.add_argument("--alpha", type=float, default=0.05)
    parser.add_argument("--prop_of_nb_edges", type=float, default=0.9)
    parser.add_argument("--loss", type=str, default="hyp_cones_loss")
    parser.add_argument("--pick_per_level", action="store_true")
    parser.add_argument("--taxonomy", type=str, default="ethec",
                        choices=("ethec", "butterfly200"),
                        help="butterfly200: label-only embedding on the "
                             "frozen 5/23/116/200 taxonomy (no dataset "
                             "json needed; reference db.py:17-1115)")
    parser.add_argument("--graph_from", type=str, default="train",
                        choices=("train", "all"),
                        help="Build the label graph from the train split "
                             "(reference semantics, order_embeddings.py:"
                             "363-371) or from all splits (covers the full "
                             "723-node taxonomy when train.json is absent)")
    parser.add_argument("--check_reconstr_every", type=int, default=10)
    parser.add_argument("--level_weights", nargs="*", default=None,
                        type=float,
                        help="Per-level edge weights for the margin loss "
                             "(reference order_embeddings.py:835-841).")
    parser.add_argument("--weigh_pos_term", action="store_true",
                        help="Apply level weights to the positive term "
                             "only (reference --weigh_pos_term).")
    parser.add_argument("--weigh_neg_term", action="store_true",
                        help="Weight negatives n_nodes/ratio x "
                             "1/deg_tc(corrupted node) (reference "
                             "--weigh_neg_term).")
    for flag in ("--class_weights", "--freeze_weights", "--use_grayscale"):
        parser.add_argument(flag, action="store_true",
                            help="Accepted for reference command-line "
                                 "compatibility; unused by the imageless "
                                 "label-only driver.")
    for flag in ("--evaluator", "--image_dir", "--model",
                 "--weight_strategy"):
        parser.add_argument(flag, type=str, default=None,
                            help="Accepted for reference command-line "
                                 "compatibility; unused by the imageless "
                                 "label-only driver.")

    parser.add_argument("--use_rsgd", action="store_true",
                        help="Full Riemannian SGD instead of the "
                             "conformal-rescaled adam hybrid.")
    parser.add_argument("--use_radam", action="store_true",
                        help="Riemannian Adam (Becigneul & Ganea) — manifold "
                             "step with adam moments; no reference "
                             "counterpart.")
    parser.add_argument("--load_cosine_emb", type=str, default=None,
                        help="Path to 2-D cosine embeddings .npy warm start "
                             "(order_embeddings.py:722-741)")
    return parser


def main(args=None):
    args = build_parser().parse_args(args)
    if args.taxonomy == "butterfly200":
        from ..hierarchy import butterfly200_labelmap

        labelmap = butterfly200_labelmap()
        level_labels = labelmap.leaf_paths()   # full taxonomy coverage
    else:
        labelmap, datasets, _ = load_ethec_data(args.data_dir, args.debug)
        level_labels = (np.concatenate([d.level_labels
                                        for d in datasets.values()])
                        if args.graph_from == "all"
                        else datasets["train"].level_labels)
    adj = label_graph_from_paths(level_labels, labelmap)
    splits = split_edges(adj,
                         proportion_of_nb_edges_in_train=args.prop_of_nb_edges,
                         seed=args.random_seed)
    cfg = EmbeddingTrainerConfig(
        energy="hyp_cone",
        embedding_dim=args.embedding_dim,
        lr=args.lr,
        batch_size=args.batch_size,
        neg_to_pos_ratio=args.neg_to_pos_ratio,
        alpha=args.alpha,
        optimizer=("rsgd" if args.use_rsgd
                   else "radam" if args.use_radam else args.optimizer_method),
        pick_per_level=args.pick_per_level,
        level_weights=(tuple(args.level_weights)
                       if args.level_weights else None),
        weigh_pos_term=args.weigh_pos_term,
        weigh_neg_term=args.weigh_neg_term,
        seed=args.random_seed,
        lr_steps=tuple(args.lr_step),
        lr_decay=args.lr_decay,
    )
    warm_start = None
    if args.load_cosine_emb:
        warm_start = np.load(args.load_cosine_emb)

    result = run_label_embedding(
        labelmap, splits, cfg,
        experiment_dir=args.experiment_dir,
        experiment_name=args.experiment_name,
        n_epochs=args.n_epochs,
        eval_interval=args.eval_interval,
        check_reconstr_every=args.check_reconstr_every,
        resume=args.resume,
        manifest_args=manifest_from_args(args),
        init_embeddings=warm_start,
    )
    print({k: v for k, v in result.items()
           if isinstance(v, (int, float, str))})
    return result


if __name__ == "__main__":
    main()
