"""Shared CLI plumbing: path conventions, model/solver construction, seeding.

The reference configures runs through three mechanisms (SURVEY.md §5.6):
argparse flags, in-source constant blocks and wandb config. These CLIs keep
the reference's flag names and directory layouts (data/superres_root/...),
argparse everywhere.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Pallas kernels compile through the axon remote-compile helper, which needs
# these (harmless on other platforms).
os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-1")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_WORKER_ID", "0")

SEED = 1234
IMG_SIZE = (512, 512)
FEATURE_SIZE = (128, 128)


def data_paths(use_validation: bool = False, backbone: str = "xception",
               mode: str = "argmax", class_id: int = 8, num_aug: int = 100):
    """The reference's directory contract (generate_augmented_copies.py:57-64,
    SR_single_class.py:34-47)."""
    from deeplabv3plus_augmented_superresolution_tpu.data.paths import (
        augmented_copies_dir,
        standard_output_dir,
    )

    data_dir = os.path.join(os.getcwd(), "data")
    pascal_root = os.path.join(data_dir, "dataset_root", "VOCdevkit", "VOC2012")
    superres_root = os.path.join(data_dir, "superres_root")
    suffix = "_validation" if use_validation else ""
    return {
        "data_dir": data_dir,
        "pascal_root": pascal_root,
        "imgs_path": os.path.join(pascal_root, "JPEGImages"),
        "superres_root": superres_root,
        "augmented_copies_dir": augmented_copies_dir(
            superres_root, backbone, mode, class_id, num_aug, use_validation),
        "standard_output_dir": standard_output_dir(
            superres_root, backbone, class_id, use_validation),
        "superres_output_dir": os.path.join(
            superres_root, f"superres_output{suffix}"),
        "image_list": os.path.join(
            data_dir, "augmented_file_lists",
            f"{'valaug' if use_validation else 'trainaug'}.txt"),
    }


def build_deeplab(backbone: str = "xception", final_upsample: bool = False,
                  compute_dtype: str = "bfloat16", weights_path: str = None):
    """Model + params, loading the bonlime checkpoint when a local .h5 exists
    (zero-egress environments run random-init with a warning)."""
    from deeplabv3plus_augmented_superresolution_tpu.models import (
        DeepLabConfig,
        build_model,
        default_weights_path,
    )

    cfg = DeepLabConfig(input_shape=(512, 512, 3), classes=21, os=16,
                        backbone=backbone, final_upsample=final_upsample,
                        compute_dtype=compute_dtype)
    path = weights_path or default_weights_path(backbone)
    if not os.path.exists(path):
        print(f"WARNING: pretrained weights not found at {path}; "
              "running with random initialization (masks will be meaningless; "
              "download the bonlime checkpoint out-of-band for real runs)")
        path = None
    params, apply_fn = build_model(cfg, seed=0, weights_path=path)
    return cfg, params, apply_fn


def make_sr_config(args=None, num_aug: int = 100, feature_size=FEATURE_SIZE,
                   output_size=IMG_SIZE, **overrides):
    from deeplabv3plus_augmented_superresolution_tpu.sr import (
        OptimizerConfig,
        SRConfig,
    )

    hp = {
        # defaults per reference SR_single_class.py:50-64
        "lambda_df": 1.0, "lambda_tv": 0.3, "lambda_L2": 0.7, "lambda_L1": 0.0,
        "num_iter": 300, "optimizer": "adam", "learning_rate": 1e-3,
        "amsgrad": True, "lr_scheduler": True, "decay_steps": 60,
        "decay_rate": 0.3, "copy_dropout": 0.0, "use_BTV": False,
        "angle_max": 0.5, "sgd_copies": 0, "solver_impl": "gram",
        "operator_impl": "fused", "warp_impl": "shear",
        "gram_probing": "aliased",
    }
    if args is not None:
        for key in hp:
            if hasattr(args, key):
                hp[key] = getattr(args, key)
    hp.update(overrides)

    opt = OptimizerConfig(
        name=hp["optimizer"], learning_rate=hp["learning_rate"],
        amsgrad=hp["amsgrad"], lr_scheduler=hp["lr_scheduler"],
        decay_steps=hp["decay_steps"], decay_rate=hp["decay_rate"])
    return SRConfig(
        lambda_df=hp["lambda_df"], lambda_tv=hp["lambda_tv"],
        lambda_L2=hp["lambda_L2"], lambda_L1=hp["lambda_L1"],
        num_iter=hp["num_iter"], num_aug=num_aug,
        feature_size=tuple(feature_size), output_size=tuple(output_size),
        use_BTV=hp["use_BTV"], copy_dropout=hp["copy_dropout"],
        angle_max=max(float(hp["angle_max"]), 1e-3),
        sgd_copies=hp["sgd_copies"], solver_impl=hp["solver_impl"],
        operator_impl=hp["operator_impl"], warp_impl=hp["warp_impl"],
        gram_probing=hp["gram_probing"], optimizer=opt)


def add_sr_args(parser):
    parser.add_argument("--lambda_df", type=float, default=1.0)
    parser.add_argument("--lambda_tv", type=float, default=0.3)
    parser.add_argument("--lambda_L2", type=float, default=0.7)
    parser.add_argument("--lambda_L1", type=float, default=0.0)
    parser.add_argument("--num_iter", type=int, default=300)
    parser.add_argument("--optimizer", type=str, default="adam",
                        choices=["adam", "adamax", "adagrad", "adadelta", "sgd"])
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--amsgrad", action="store_true", default=True)
    parser.add_argument("--lr_scheduler", action="store_true", default=True)
    parser.add_argument("--decay_steps", type=int, default=60)
    parser.add_argument("--decay_rate", type=float, default=0.3)
    parser.add_argument("--copy_dropout", type=float, default=0.0)
    parser.add_argument("--use_BTV", action="store_true")
    parser.add_argument("--sgd_copies", type=int, default=0,
                        help="copies per solver iteration (0 = all; TPU perf knob)")
    parser.add_argument("--solver_impl", type=str, default="gram",
                        choices=["gram", "cg", "direct"],
                        help="aug-SR solver: Adam on the precomputed Gram "
                             "stencil (exact, fast), IRLS-preconditioned CG "
                             "on the same system (~3x fewer iterations, "
                             "equal-or-lower objective), or per-iteration "
                             "warps (reference structure)")
    parser.add_argument("--operator_impl", type=str, default="fused",
                        choices=["fused", "staged"],
                        help="SR forward operator: decimations fused into "
                             "the shear chain (default) or warp-then-resize "
                             "(reference structure)")
    parser.add_argument("--warp_impl", type=str, default="shear",
                        choices=["shear", "gather"],
                        help="warp kernel: gather is the exact tfa-semantics "
                             "reference path (CPU parity runs only)")
    parser.add_argument("--gram_probing", type=str, default="aliased",
                        choices=["aliased", "dense"],
                        help="Gram stencil extraction: 35 aliased probes "
                             "(default) or 63 dense probes")
    return parser
