"""Data layer: VOC prep utilities, host augmentation, dataset class."""

import os

import numpy as np
from PIL import Image

from deeplabv3plus_augmented_superresolution_tpu.data import voc
from deeplabv3plus_augmented_superresolution_tpu.data.dataset import (
    PascalVOC2012Dataset,
)
from deeplabv3plus_augmented_superresolution_tpu.data.host_augment import (
    adjust_brightness,
    adjust_contrast,
    center_crop,
    colors_to_labels,
    flip_horizontal,
    labels_to_colors,
    pad_to,
    random_transform,
    rotate,
    zoom,
)


def test_voc_colormap_known_values():
    cmap = voc.voc_colormap()
    np.testing.assert_array_equal(cmap[0], [0, 0, 0])        # background
    np.testing.assert_array_equal(cmap[1], [128, 0, 0])      # aeroplane
    np.testing.assert_array_equal(cmap[8], [64, 0, 0])       # cat
    np.testing.assert_array_equal(cmap[255], [224, 224, 192])  # ignore


def test_label_color_codecs_roundtrip():
    labels = np.random.default_rng(0).integers(0, 21, (16, 16)).astype(np.uint8)
    colors = labels_to_colors(labels)
    back = colors_to_labels(colors)
    np.testing.assert_array_equal(back, labels)


def test_generate_dataset_files(tmp_path):
    pascal = tmp_path / "VOC2012"
    seg = pascal / "ImageSets" / "Segmentation"
    seg.mkdir(parents=True)
    (seg / "train.txt").write_text("a\nb\nc")
    (seg / "val.txt").write_text("c\nd")
    berkeley = tmp_path / "berkeley"
    berkeley.mkdir()
    (berkeley / "train.txt").write_text("b\ne")
    (berkeley / "val.txt").write_text("f")
    out = tmp_path / "lists"
    n_train, n_val = voc.generate_dataset_files(str(pascal), str(berkeley), str(out))
    # everything = {a..f}; validation = pascal val = {c, d}; train = rest
    assert (n_train, n_val) == (4, 2)
    train = set((out / "trainaug.txt").read_text().split())
    assert train == {"a", "b", "e", "f"}


def test_remove_gt_colormap(tmp_path):
    seg = tmp_path / "seg"
    seg.mkdir()
    labels = np.random.default_rng(1).integers(0, 21, (8, 8)).astype(np.uint8)
    img = Image.fromarray(labels, mode="P")
    img.putpalette(voc.voc_colormap().flatten().tolist())
    img.save(seg / "x.png")
    out = tmp_path / "raw"
    count = voc.remove_gt_colormap(str(seg), str(out))
    assert count == 1
    raw = np.asarray(Image.open(out / "x.png"))
    np.testing.assert_array_equal(raw, labels)


def test_host_augment_ops():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (32, 48, 3)).astype(np.uint8)
    assert pad_to(img, (40, 60)).shape == (40, 60, 3)
    assert center_crop(img, (16, 16)).shape == (16, 16, 3)
    np.testing.assert_array_equal(flip_horizontal(flip_horizontal(img)), img)
    assert zoom(img, 1.3).shape == img.shape
    assert zoom(img, 0.7).shape == img.shape
    assert rotate(img, 15.0).shape == img.shape
    assert adjust_brightness(img, 10).dtype == img.dtype
    assert adjust_contrast(img, 1.2).shape == img.shape

    mask = rng.integers(0, 21, (32, 48)).astype(np.uint8)
    out_img, out_mask = random_transform(
        img, mask, target_shape=(24, 24), seed=0, flip_lr=True,
        rotation_range=(-10.0, 10.0), zoom_range=(0.8, 1.2),
        brightness_range=(-20, 20), shift_range=(4, 4))
    assert out_img.shape == (24, 24, 3) and out_mask.shape == (24, 24)
    assert set(np.unique(out_mask)) <= set(range(21)) | {255}


def test_host_augment_reference_parity_ops():
    """The reference's full image_utils surface: expanding rotate, random
    blur, absolute HSV / brightness-contrast adjustments, pad_or_crop, shift,
    mean removal, one-hot codec, prediction overlay."""
    import random as pyrandom

    from deeplabv3plus_augmented_superresolution_tpu.data.host_augment import (
        adjust_brightness_contrast,
        adjust_saturation_value,
        apply_mask,
        colors_to_labels,
        labels_to_colors,
        pad_or_crop,
        random_blur,
        random_rotate,
        random_shift,
        remove_mean,
        rotate_expand,
    )

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (40, 60, 3)).astype(np.uint8)
    mask = np.zeros((40, 60), np.uint8)
    mask[10:30, 20:40] = 8

    # Expanding rotate: canvas grows, no corner clipping, GT keeps its label
    # set plus the ignore fill.
    rot = rotate_expand(img, 30.0)
    assert rot.shape[0] > img.shape[0] and rot.shape[1] > img.shape[1]
    r = pyrandom.Random(0)
    ri, rm = random_rotate(img, mask, (25.0, 35.0), ignore_label=255, rng=r)
    assert ri.shape[:2] == rm.shape[:2]
    assert set(np.unique(rm)) <= {0, 8, 255}
    assert 255 in np.unique(rm)  # corners filled with ignore

    assert random_blur(img, (9, 9), (1.5, 1.5), pyrandom.Random(1)).shape == img.shape

    sat = adjust_saturation_value(img, saturation=40, value=-30)
    assert sat.shape == img.shape and sat.dtype == np.uint8
    bc = adjust_brightness_contrast(img, brightness=30, contrast=20)
    assert bc.shape == img.shape and bc.dtype == np.uint8
    np.testing.assert_array_equal(
        adjust_brightness_contrast(img, 0, 0), img)

    assert pad_or_crop(img, (64, 48)).shape == (64, 48, 3)
    assert pad_or_crop(img, (20, 80)).shape == (20, 80, 3)

    si, sm = random_shift(img, mask, (5, 5), rng=pyrandom.Random(2))
    assert si.shape == img.shape and sm.shape == mask.shape

    demeaned = remove_mean(img)
    assert demeaned.dtype == np.float32
    assert abs(float(demeaned[..., 0].mean()
                     - (img[..., 0].astype(np.float32).mean() - 103.939))) < 1e-3

    onehot = colors_to_labels(labels_to_colors(mask), one_hot=True)
    assert onehot.shape == (40, 60, 21)
    np.testing.assert_array_equal(onehot.argmax(-1).astype(np.uint8), mask)

    overlay = apply_mask(img, labels_to_colors(mask))
    np.testing.assert_array_equal(overlay[mask == 0], img[mask == 0])
    assert (overlay[mask == 8] != img[mask == 8]).any()


def test_dataset_class_batches(tmp_path):
    pascal = tmp_path / "VOC2012"
    (pascal / "JPEGImages").mkdir(parents=True)
    (pascal / "SegmentationClass").mkdir(parents=True)
    seg = pascal / "ImageSets" / "Segmentation"
    seg.mkdir(parents=True)
    rng = np.random.default_rng(3)
    names = ["2007_000001", "2007_000002", "2007_000003", "2007_000004"]
    for name in names:
        Image.fromarray(rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)).save(
            pascal / "JPEGImages" / f"{name}.jpg")
        Image.fromarray(rng.integers(0, 21, (64, 64)).astype(np.uint8),
                        mode="L").save(pascal / "SegmentationClass" / f"{name}.png")
    (seg / "train.txt").write_text("\n".join(names))

    ds = PascalVOC2012Dataset(str(pascal), image_size=(64, 64))
    assert list(ds.get_basenames("train")) == names
    batches = list(ds.batches("train", batch_size=2, augment=True, seed=1))
    assert len(batches) == 2
    imgs, masks = batches[0]
    assert imgs.shape == (2, 64, 64, 3) and masks.shape == (2, 64, 64, 1)
    assert imgs.dtype == np.float32 and imgs.max() <= 1.0

    out = ds.export_arrayrecord("train", str(tmp_path / "records"))
    data = np.load(out)
    assert data["images"].shape == (4, 64, 64, 3)
    assert list(data["basenames"]) == names


def test_get_img_paths_sort_handles_non_numeric_names(tmp_path):
    # VOC ids sort numerically (int('2007_000032') parses — underscore digit
    # separators, reference superres_utils.py:26-27); non-VOC names (e.g.
    # synthetic scenes) must not crash and fall back to lexicographic order.
    from deeplabv3plus_augmented_superresolution_tpu.data.paths import get_img_paths

    lst = tmp_path / "list.txt"
    lst.write_text("2010_000002\n2007_000032\n")
    paths = get_img_paths(str(lst), "/imgs", sort=True)
    assert [os.path.basename(p) for p in paths] == [
        "2007_000032.jpg", "2010_000002.jpg"]

    lst.write_text("synth_4321_0010\nsynth_4321_0002\n2007_000032\n")
    paths = get_img_paths(str(lst), "/imgs", sort=True)
    assert [os.path.basename(p) for p in paths] == [
        "2007_000032.jpg", "synth_4321_0002.jpg", "synth_4321_0010.jpg"]
