"""Synthetic CrowdAI-style dataset generator for tests and e2e runs.

Produces the directory layout the reference expects
(REPRODUCE_RESULTS.md / src/pipeline_manager.py):

    out/
      train/images/*.jpg   train/annotation.json
      val/images/*.jpg     val/annotation.json

Images are 300x300 RGB with textured background and axis-aligned bright
"building" rectangles; annotations are COCO polygons under category id 100
('building'), so prepare_masks/train/evaluate can run end-to-end on it and an
easy model should reach high AP quickly.
"""

import argparse
import json
import os

import numpy as np


def _make_image(rng, h=300, w=300, max_buildings=6):
    img = rng.randint(30, 90, (h, w, 3)).astype(np.uint8)
    noise = rng.randint(0, 25, (h, w, 3))
    img = np.clip(img + noise, 0, 255).astype(np.uint8)
    anns = []
    n = rng.randint(1, max_buildings + 1)
    occupied = np.zeros((h, w), bool)
    for _ in range(n):
        bw = rng.randint(20, 80)
        bh = rng.randint(20, 80)
        x0 = rng.randint(5, w - bw - 5)
        y0 = rng.randint(5, h - bh - 5)
        region = occupied[y0:y0 + bh, x0:x0 + bw]
        if region.any():
            continue
        occupied[y0:y0 + bh, x0:x0 + bw] = True
        color = rng.randint(170, 255, (3,))
        img[y0:y0 + bh, x0:x0 + bw] = color
        # slight shading for texture
        img[y0:y0 + 2, x0:x0 + bw] = np.clip(color - 40, 0, 255)
        poly = [float(x0), float(y0), float(x0 + bw), float(y0),
                float(x0 + bw), float(y0 + bh), float(x0), float(y0 + bh)]
        anns.append({
            "segmentation": [poly],
            "area": float(bw * bh),
            "bbox": [float(x0), float(y0), float(bw), float(bh)],
            "iscrowd": 0,
            "category_id": 100,
        })
    return img, anns


def generate_split(out_dir, split, n_images, seed, tile=(300, 300),
                   max_buildings=6):
    from PIL import Image

    rng = np.random.RandomState(seed)
    images_dir = os.path.join(out_dir, split, "images")
    os.makedirs(images_dir, exist_ok=True)
    dataset = {
        "info": {"description": f"synthetic mapping fixture ({split})"},
        "images": [],
        "annotations": [],
        "categories": [{"id": 100, "name": "building",
                        "supercategory": "building"}],
    }
    ann_id = 1
    for i in range(n_images):
        img, anns = _make_image(rng, h=tile[0], w=tile[1],
                                max_buildings=max_buildings)
        file_name = f"{split}_{i:05d}.jpg"
        Image.fromarray(img).save(os.path.join(images_dir, file_name),
                                  quality=95)
        image_id = i + 1
        dataset["images"].append({
            "id": image_id, "file_name": file_name,
            "height": img.shape[0], "width": img.shape[1],
        })
        for ann in anns:
            ann = dict(ann)
            ann["id"] = ann_id
            ann["image_id"] = image_id
            ann_id += 1
            dataset["annotations"].append(ann)
    ann_path = os.path.join(out_dir, split, "annotation.json")
    with open(ann_path, "w") as f:
        json.dump(dataset, f)
    # the reference's dev-mode mask prep reads annotation-small.json
    # (src/preparation.py:20-24)
    with open(os.path.join(out_dir, split, "annotation-small.json"), "w") as f:
        json.dump(dataset, f)
    return ann_path


def generate(out_dir, n_train=12, n_val=6, seed=7, tile=(300, 300),
             max_buildings=6):
    os.makedirs(out_dir, exist_ok=True)
    generate_split(out_dir, "train", n_train, seed, tile=tile,
                   max_buildings=max_buildings)
    generate_split(out_dir, "val", n_val, seed + 1, tile=tile,
                   max_buildings=max_buildings)
    return out_dir


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--n-train", type=int, default=12)
    parser.add_argument("--n-val", type=int, default=6)
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--max-buildings", type=int, default=6,
                        help="per-tile cap; CrowdAI averages ~8 buildings "
                             "per 300px tile, use ~20 for that density")
    args = parser.parse_args()
    generate(args.out, args.n_train, args.n_val, args.seed,
             max_buildings=args.max_buildings)
    print(f"synthetic dataset written to {args.out}")
