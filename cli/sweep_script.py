"""Hyperparameter sweep runner (reference sweep_script.py).

One invocation evaluates one hyperparameter configuration over the staged
class subset and reports the six average IoUs. With wandb installed it reads
wandb.config so a wandb agent can drive Bayes sweeps from
configs/sweep_configs/*.yaml exactly like the reference (sweep_script.py:52-78);
without wandb it runs from flags and appends a row to a local CSV so sweeps
remain scriptable in zero-egress environments.
"""

import argparse
import csv
import os
import time

from _common import add_sr_args

parser = argparse.ArgumentParser()
parser.add_argument("--num_aug", type=int, default=100)
parser.add_argument("--num_samples", type=int, default=500)
parser.add_argument("--class_id", type=int, default=8, choices=range(21))
parser.add_argument("--mode", type=str, default="argmax",
                    choices=["slice_max", "slice", "argmax"])
parser.add_argument("--backbone", type=str, default="xception",
                    choices=["mobilenet", "xception"])
parser.add_argument("--use_validation", action="store_true", default=False)
parser.add_argument("--th_factor", type=float, default=0.65)
parser.add_argument("--angle_max", type=float, default=0.5)
parser.add_argument("--output_csv", type=str, default=None)
add_sr_args(parser)


def run_config(args):
    """Evaluate ONE hyperparameter configuration and append it to the sweep
    CSV; returns the metrics dict. Reused by sweep_agent for local search."""
    import SR_single_class

    t0 = time.time()
    # Reuse the evaluation loop with this sweep's hyperparameters.
    sweep_args = SR_single_class.parser.parse_args([])
    for key, value in vars(args).items():
        if hasattr(sweep_args, key):
            setattr(sweep_args, key, value)
    avg = SR_single_class.run(sweep_args)
    runtime = time.time() - t0

    metrics = {
        "standard_iou_single": avg["standard_single"],
        "standard_iou_multiple": avg["standard_multiple"],
        "aug_iou_single": avg["aug_single"],
        "aug_iou_multiple": avg["aug_multiple"],
        "max_iou": avg["max"],
        "mean_iou": avg["mean"],
        "runtime_s": runtime,
    }

    out_csv = args.output_csv or os.path.join(
        os.getcwd(), "experiments_data",
        f"sweep_{args.mode}_{args.num_samples}.csv")
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    fields = ["lambda_tv", "lambda_L2", "lambda_L1", "learning_rate",
              "num_iter", "copy_dropout", "use_BTV", "optimizer", "amsgrad",
              "decay_rate", "decay_steps", "sgd_copies"] + list(metrics)
    write_header = not os.path.exists(out_csv)
    with open(out_csv, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=fields)
        if write_header:
            writer.writeheader()
        row = {k: getattr(args, k) for k in fields if hasattr(args, k)}
        row.update(metrics)
        writer.writerow(row)
    print(f"Appended sweep row to {out_csv}")
    return metrics


def main():
    args = parser.parse_args()

    try:
        import wandb
        run = wandb.init(config=vars(args))
        for key, value in dict(wandb.config).items():
            if hasattr(args, key):
                setattr(args, key, value)
    except ImportError:
        wandb = None
        run = None

    metrics = run_config(args)

    if wandb is not None and run is not None:
        wandb.log(metrics)
        run.finish()


if __name__ == "__main__":
    main()
