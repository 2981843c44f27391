"""CLI entry point — preserves the reference's surface verbatim
(reference main.py:37-44): --config/--arch/--algo/--task/--output/--load
with tasks train / linear_eval / get_features.

Divergence (defect fix): get_features saves the four .npy dumps in binary
mode; the reference opens them with mode "w" and crashes (main.py:63-70,
SURVEY §2)."""

import argparse
import os
from datetime import datetime as dt

import numpy as np

from ssv_tpu.train import ALGORITHMS, Trainer

TASKS = ["train", "linear_eval", "get_features"]
NETWORKS = ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
            "resnext50", "resnext101", "wide_resnet50", "wide_resnet101", "vit"]


def _check_checkpoint_specified(args):
    if args["load"] is None:
        raise ValueError(
            "For inference tasks, model checkpoint must be specified using --load")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True, type=str,
                    help="Path to configuration file")
    ap.add_argument("-m", "--arch", required=True, type=str, choices=NETWORKS,
                    help="Encoder architecture to use")
    ap.add_argument("-a", "--algo", required=True, type=str, choices=ALGORITHMS,
                    help="Self-supervised algorithm to work with")
    ap.add_argument("-t", "--task", required=True, type=str, choices=TASKS,
                    help="Task to perform for chosen algorithm")
    ap.add_argument("-o", "--output", default=dt.now().strftime("%d-%m-%Y_%H-%M"),
                    type=str, help="Path to output directory")
    ap.add_argument("-l", "--load", default=None, type=str,
                    help="Path to directory containing trained checkpoints")
    args = vars(ap.parse_args())

    trainer = Trainer(args)
    task = args["task"]

    if task == "train":
        trainer.train_safe()

    elif task == "linear_eval":
        _check_checkpoint_specified(args)
        trainer.perform_linear_eval()

    elif task == "get_features":
        _check_checkpoint_specified(args)
        train_fvecs, train_gt = trainer.build_features(split="train")
        test_fvecs, test_gt = trainer.build_features(split="test")
        for name, arr in [("train_fvecs", train_fvecs), ("train_gt", train_gt),
                          ("test_fvecs", test_fvecs), ("test_gt", test_gt)]:
            np.save(os.path.join(trainer.output_dir, f"{name}.npy"), arr)


if __name__ == "__main__":
    main()
