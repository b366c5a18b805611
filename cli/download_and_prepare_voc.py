"""Download + prepare PASCAL VOC 2012 (reference download_and_prepare_voc.py).

Same flags; TFRecord export becomes an .npz array-record export (the TPU
pipeline reads images directly; see data/voc.py docstring).
"""

import argparse
import os

import _common  # noqa: F401  (sys.path bootstrap)

parser = argparse.ArgumentParser()
parser.add_argument("--generate_tf_records",
                    help="Optionally generate packed array-record (.npz) files for the dataset",
                    action="store_true")
parser.add_argument("--remove_cmap",
                    help="Remove colormap from masks, used in PASCAL VOC",
                    action="store_true")
parser.add_argument("--use_mirror",
                    help="Download the dataset from a mirror site",
                    action="store_true")
parser.add_argument("--pascal_root", help="Root directory of the PASCAL VOC dataset",
                    nargs="?", type=str,
                    default="./data/dataset_root/VOCdevkit/VOC2012",
                    const="./data/dataset_root/VOCdevkit/VOC2012")
parser.add_argument("--download_berkley",
                    help="Download the augmented dataset provided by Berkley",
                    action="store_true")
parser.add_argument("--generate_file_lists",
                    help="Generate trainaug/valaug file lists",
                    action="store_true")


def main():
    args = parser.parse_args()

    from deeplabv3plus_augmented_superresolution_tpu.data import voc

    dataset_url = voc.VOC_MIRROR_URL if args.use_mirror else voc.VOC_URL
    data_dir = os.path.join(os.getcwd(), "data")
    dataset_root = os.path.join(data_dir, "dataset_root")
    pascal_root = os.path.normpath(args.pascal_root)

    filepath = voc.download_dataset(dataset_url, dest_folder=dataset_root)
    voc.extract_file(filepath, dest_folder=dataset_root, is_extracted=pascal_root)

    if args.download_berkley:
        filepath = voc.download_dataset(voc.BERKELEY_URL, dataset_root)
        voc.extract_file(filepath, dest_folder=pascal_root,
                         is_extracted=os.path.join(pascal_root, "SegmentationClassAug"))

    if args.remove_cmap:
        voc.remove_gt_colormap(
            os.path.join(pascal_root, "SegmentationClass"),
            output_dir=os.path.join(pascal_root, "SegmentationClassRaw"))

    if args.generate_file_lists:
        n_train, n_val = voc.generate_dataset_files(
            pascal_root, os.path.join(data_dir, "berkley_file_lists"),
            os.path.join(data_dir, "augmented_file_lists"))
        print(f"Train images: {n_train}, Validation images: {n_val}")

    if args.generate_tf_records:
        records_dir = os.path.join(dataset_root, "ArrayRecords")
        for split in ("train", "val"):
            names = voc.get_basenames(split, pascal_root)
            print(f"Found {len(names)} {split} samples")
            out = voc.export_arrayrecord(split, pascal_root, records_dir)
            print(f"Exported {out}")
        print("Finished exporting")


if __name__ == "__main__":
    main()
