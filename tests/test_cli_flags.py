"""CLI flag-name compatibility: our parsers must accept the reference's
documented command lines verbatim (parse-only — no training here)."""

import pytest


def test_ethec_readme_sample_command():
    """The reference README's sample command (README.md:30), flag-for-flag."""
    from learning_embeddings_tpu.cli.ethec_experiments import build_parser

    args = build_parser().parse_args(
        "--experiment_name exp_test --experiment_dir exp "
        "--image_dir ETHEC_dataset_v0.1/ETHEC_dataset/IMAGO_build_test_resized/ "
        "--n_epochs 1 --model resnet18 --loss multi_level "
        "--set_mode train".split())
    assert args.model == "resnet18" and args.loss == "multi_level"


def test_ethec_full_flag_set():
    from learning_embeddings_tpu.cli.ethec_experiments import build_parser

    args = build_parser().parse_args(
        "--debug --lr 0.001 --batch_size 8 --evaluator ML "
        "--experiment_name e --experiment_dir d --image_dir i --n_epochs 2 "
        "--n_workers 4 --eval_interval 1 --resume --optimizer_method adam "
        "--merged --weight_strategy inv_sqrt --model resnet50 "
        "--loss masked_loss --use_grayscale --class_weights "
        "--freeze_weights --set_mode train "
        "--level_weights 1 1 1 1 --use_2d --lr_step 10 20".split())
    assert args.level_weights == [1.0, 1.0, 1.0, 1.0]
    assert args.lr_step == [10, 20] and args.use_2d


def test_ethec_tpu_addition_flags():
    """Round-2 TPU-only flags: uint8/f32 transfer toggle, grad accumulation,
    frozen BN, TP width."""
    from learning_embeddings_tpu.cli.ethec_experiments import build_parser

    args = build_parser().parse_args(
        "--experiment_name e --experiment_dir d --image_dir i --n_epochs 1 "
        "--model resnet18 --loss multi_level --set_mode train "
        "--f32_input --grad_accum 4 --freeze_bn --n_model 2".split())
    assert args.f32_input and args.grad_accum == 4
    assert args.freeze_bn and args.n_model == 2
    defaults = build_parser().parse_args(
        "--experiment_name e --experiment_dir d --image_dir i --n_epochs 1 "
        "--model resnet18 --loss multi_level --set_mode train".split())
    assert not defaults.f32_input and defaults.grad_accum == 1


def test_oe_h_full_flag_set():
    """The superset flag list of the flagship driver (oe_h.py:2396-2431)."""
    from learning_embeddings_tpu.cli._joint_main import build_parser

    args = build_parser("hyp_cones_loss").parse_args(
        "--debug --lr 0.01 --alpha 0.05 --batch_size 8 --load_G_from_disk "
        "--experiment_name e --experiment_dir d --load_emb_from emb.pth "
        "--load_cosine_emb cos.npy --image_dir i --n_epochs 2 --n_workers 8 "
        "--eval_interval 1 --embedding_dim 10 --neg_to_pos_ratio 5 --resume "
        "--optimizer_method adam --merged --model alexnet "
        "--loss euc_cones_loss --use_CNN --pick_per_level --freeze_weights "
        "--half_half --hide_levels --set_mode train --lr_step 10".split())
    assert args.use_CNN and args.hide_levels and args.half_half
    assert args.alpha == 0.05


def test_embed_toy_baked_command():
    """The reference's baked-in toy command (embed_toy.py:212)."""
    from learning_embeddings_tpu.cli.embed_toy import build_parser

    args = build_parser().parse_args(
        "--pick_per_level --tree_levels 6 --tree_branching 2 --n_epochs 5 "
        "--lr 0.1 --loss euc_cones_loss --embedding_dim 2 "
        "--neg_to_pos_ratio 5 --alpha 0.01 --experiment_name toy_graph "
        "--batch_size 10 --experiment_dir ../exp/embed_toy/".split())
    assert args.tree_levels == 6 and args.loss == "euc_cones_loss"


def test_order_embeddings_flags():
    from learning_embeddings_tpu.cli.order_embeddings import build_parser

    args = build_parser().parse_args(
        "--set_mode train --loss order_emb_loss --experiment_name e "
        "--experiment_dir d --n_epochs 3 --prop_of_nb_edges 0.9 "
        "--embedding_dim 10 --neg_to_pos_ratio 5 --alpha 0.05 "
        "--pick_per_level --random_seed 0".split())
    assert args.prop_of_nb_edges == 0.9


def test_inference_flags():
    import learning_embeddings_tpu.cli.inference as inf

    # parse-only path: argparse object built inside main; exercise via a
    # SystemExit on missing required args to confirm flag names exist
    with pytest.raises(SystemExit):
        inf.main(["--mode", "lime"])   # missing required experiment_path
