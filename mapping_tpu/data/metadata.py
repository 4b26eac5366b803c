"""Metadata table generation (csv-compatible with the reference).

Parity target: generate_metadata / generate_inference_metadata
(reference src/utils.py:136-215). Produces a pandas DataFrame with columns
ImageId, file_path_image, is_train, is_valid, n_buildings and one
`file_path_mask{suffix}` column per prepared mask directory
(`{prefix}_eroded_{e}_dilated_{d}/{split}/masks/{id}.png`).
"""

import glob
import json
import os
from collections import defaultdict

import pandas as pd


def _mask_dirs(meta_dir, masks_overlayed_prefix):
    dirs, suffixes = [], []
    for file_path in sorted(glob.glob(os.path.join(meta_dir, "*"))):
        base = os.path.basename(file_path)
        if base.startswith(masks_overlayed_prefix):
            dirs.append(file_path)
            suffixes.append(base.replace(masks_overlayed_prefix, ""))
    return dirs, suffixes


def generate_metadata(
    data_dir,
    meta_dir,
    masks_overlayed_prefix,
    process_train_data=True,
    process_validation_data=True,
):
    if not (process_train_data or process_validation_data):
        raise ValueError(
            "at least one of process_train_data/process_validation_data must be set"
        )
    mask_dirs, suffixes = _mask_dirs(meta_dir, masks_overlayed_prefix)
    frames = []
    splits = []
    if process_train_data:
        splits.append("train")
    if process_validation_data:
        splits.append("val")
    for split in splits:
        images_path = os.path.join(data_dir, split, "images")
        annotation_path = os.path.join(data_dir, split, "annotation.json")
        with open(annotation_path) as f:
            annotation = json.load(f)
        name_to_id = {img["file_name"]: img["id"] for img in annotation["images"]}

        rows = defaultdict(list)
        for image_file_path in sorted(glob.glob(os.path.join(images_path, "*"))):
            name = os.path.basename(image_file_path)
            rows["ImageId"].append(name_to_id[name])
            rows["file_path_image"].append(image_file_path)
            rows["is_train"].append(1 if split == "train" else 0)
            rows["is_valid"].append(1 if split == "val" else 0)
            rows["n_buildings"].append(None)
            stem = name.rsplit(".", 1)[0]
            for mask_dir, suffix in zip(mask_dirs, suffixes):
                rows["file_path_mask" + suffix].append(
                    os.path.join(mask_dir, split, "masks", f"{stem}.png")
                )
        frames.append(pd.DataFrame.from_dict(rows))
    return pd.concat(frames, ignore_index=True)


def generate_inference_metadata(images_dir):
    rows = defaultdict(list)
    for image_id, image_file_path in enumerate(
        sorted(glob.glob(os.path.join(images_dir, "*")))
    ):
        rows["ImageId"].append(image_id)
        rows["file_path_image"].append(image_file_path)
        rows["is_train"].append(0)
        rows["is_valid"].append(0)
        rows["is_test"].append(1)
        rows["n_buildings"].append(None)
    return pd.DataFrame.from_dict(rows)
