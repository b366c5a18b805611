"""Materialize synthetic scenes as a VOC-shaped tree on disk.

The dataset-reading CLIs (check_robustness, validate_parity, run_asr
--gt_dir, train --data voc) follow the reference's directory contract
(JPEGImages/ + SegmentationClassAug/ + augmented_file_lists/*.txt,
reference superres_utils.py:20-38). In a zero-egress container the real
PASCAL tree is unfetchable, so this writes procedurally generated scenes
(data/synthetic.py, optionally the hard recipe) into that exact layout —
making every file-driven workload (e.g. the full 29x9x9 robustness grid)
reproducible with committed commands instead of ad-hoc trees.

    python scripts/make_synthetic_voc.py --root /tmp/synvoc --n 48 --hard
    cd /tmp/synvoc && python $REPO/cli/check_robustness.py --num_samples 48
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="workdir root; the tree lands at "
                         "<root>/data/dataset_root/VOCdevkit/VOC2012")
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--class_ids", type=int, nargs="+", default=[8, 12])
    ap.add_argument("--hard", action="store_true")
    ap.add_argument("--seed", type=int, default=4321)
    ap.add_argument("--validation", action="store_true",
                    help="also list the images in valaug.txt")
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from deeplabv3plus_augmented_superresolution_tpu.data.synthetic import (
        synthetic_scene,
    )

    voc = os.path.join(args.root, "data", "dataset_root", "VOCdevkit",
                       "VOC2012")
    img_dir = os.path.join(voc, "JPEGImages")
    gt_dir = os.path.join(voc, "SegmentationClassAug")
    lists = os.path.join(args.root, "data", "augmented_file_lists")
    for d in (img_dir, gt_dir, lists):
        os.makedirs(d, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    names = []
    for i in range(args.n):
        img, lab = synthetic_scene(rng, (args.size, args.size),
                                   class_ids=tuple(args.class_ids),
                                   hard=args.hard)
        name = f"synth_{args.seed}_{i:04d}"
        Image.fromarray((img * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{name}.jpg"), quality=95)
        Image.fromarray(lab.astype(np.uint8), mode="L").save(
            os.path.join(gt_dir, f"{name}.png"))
        names.append(name)
    with open(os.path.join(lists, "trainaug.txt"), "w") as f:
        f.write("\n".join(names))
    if args.validation:
        with open(os.path.join(lists, "valaug.txt"), "w") as f:
            f.write("\n".join(names))
    print(f"{args.n} scenes ({'hard' if args.hard else 'easy'}, seed "
          f"{args.seed}) -> {voc}")


if __name__ == "__main__":
    main()
