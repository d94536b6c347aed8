"""TB-log → per-metric plot exporter CLI — counterpart of the reference's
`ConvertLog` (SURVEY.md §2.5: per-metric train/val/test PDF plots,
combinable across experiments).

    python -m learning_embeddings_tpu.cli.convert_tblog \
        --experiment_path exp/a [exp/b ...] --output_dir plots/ [--fmt pdf]
"""

from __future__ import annotations

import argparse
import os

from ..utils.tblog import export_plots, read_jsonl_scalars, read_scalars


def main(args=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--experiment_path", type=str, nargs="+",
                        required=True,
                        help="One or more experiment dirs; multiple dirs "
                             "are overlaid per metric.")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--fmt", type=str, default="pdf")
    parser.add_argument("--tags", type=str, nargs="*", default=None)
    args = parser.parse_args(args)

    per_exp = {}
    for path in args.experiment_path:
        name = os.path.basename(path.rstrip("/"))
        jsonl = os.path.join(path, "logs", "metrics.jsonl")
        if os.path.exists(jsonl):
            per_exp[name] = read_jsonl_scalars(jsonl)
        else:
            per_exp[name] = read_scalars(os.path.join(path, "logs"))
    written = export_plots(per_exp, args.output_dir, tags=args.tags,
                           fmt=args.fmt)
    print(f"wrote {len(written)} plots to {args.output_dir}")
    return written


if __name__ == "__main__":
    main()
