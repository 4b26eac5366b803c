"""Data-layer tests: COCO index, metadata, prep artifacts, loaders, augment,
TTA round-trips — on the synthetic fixture."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.fixtures.synthetic import generate


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("mc_data")
    generate(str(out), n_train=4, n_val=2, seed=3)
    return str(out)


@pytest.fixture(scope="module")
def prepared(dataset, tmp_path_factory):
    from mapping_tpu.prep import overlay_masks

    meta = tmp_path_factory.mktemp("meta")
    target_dir = os.path.join(str(meta), "masks_overlayed_eroded_0_dilated_0")
    for split in ("train", "val"):
        overlay_masks(dataset, split, target_dir, category_ids=[None, 100])
    return str(meta)


def test_coco_index_roundtrip(dataset):
    from mapping_tpu.data import COCOIndex

    coco = COCOIndex(os.path.join(dataset, "train", "annotation.json"))
    img_ids = coco.get_img_ids()
    assert len(img_ids) == 4
    ann_ids = coco.get_ann_ids(img_ids=img_ids[:1], cat_ids=[100])
    assert ann_ids
    ann = coco.load_anns(ann_ids[:1])[0]
    mask = coco.ann_to_mask(ann)
    x, y, w, h = ann["bbox"]
    assert mask.sum() == pytest.approx(w * h, rel=0.1)


def test_generate_metadata(dataset, prepared):
    from mapping_tpu.data import generate_metadata

    meta = generate_metadata(dataset, prepared, "masks_overlayed")
    assert len(meta) == 6
    assert set(meta.columns) >= {
        "ImageId", "file_path_image", "is_train", "is_valid",
        "file_path_mask_eroded_0_dilated_0"}
    assert meta["is_train"].sum() == 4
    # every referenced mask artifact exists
    for p in meta["file_path_mask_eroded_0_dilated_0"]:
        assert os.path.exists(p), p


def test_loader_train_batches(dataset, prepared):
    from mapping_tpu.data import generate_metadata
    from mapping_tpu.data.loader import SegmentationLoader

    meta = generate_metadata(dataset, prepared, "masks_overlayed")
    train = meta[meta.is_train == 1]
    loader = SegmentationLoader(mode="resize", size=(64, 64),
                                batch_size_train=2)
    out = loader.transform(train.file_path_image.values,
                           train.file_path_mask_eroded_0_dilated_0.values,
                           train_mode=True)
    flow, steps = out["datagen"]
    assert steps == 2
    batches = list(flow)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (2, 64, 64, 3)
    assert b["target"].shape == (2, 64, 64, 3)
    mask = np.asarray(b["target"][..., 0])
    assert set(np.unique(mask)) <= {0.0, 1.0}
    # sqrt(sizes) channel: background is 1; affine out-of-bounds fill is 0
    # (imgaug cval=0 — the loss maps sizes==0 -> weight 1, src/models.py:366-370)
    sizes = np.asarray(b["target"][..., 2])
    bg = sizes[mask == 0]
    assert ((bg >= 1.0 - 1e-5) | (bg == 0.0)).all()
    # re-iterable (second epoch)
    assert len(list(flow)) == 2


def test_loader_crop_pad_inference(dataset, prepared):
    from mapping_tpu.data import generate_metadata
    from mapping_tpu.data.loader import SegmentationLoader

    meta = generate_metadata(dataset, prepared, "masks_overlayed")
    val = meta[meta.is_valid == 1]
    loader = SegmentationLoader(mode="crop_and_pad", size=(64, 64),
                                pad=(10, 10), batch_size_inference=2)
    out = loader.transform(val.file_path_image.values, None, train_mode=False)
    flow, steps = out["datagen"]
    b = next(iter(flow))
    assert b["image"].shape == (2, 320, 320, 3)


def test_fast_augment_preserves_classes():
    from mapping_tpu.data.augment import fast_augment

    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.RandomState(0).rand(4, 64, 64, 3), jnp.float32)
    mask = (img[..., :1] > 0.5).astype(jnp.float32)
    target = jnp.concatenate([mask, mask * 3.7, jnp.ones_like(mask)], -1)
    img2, tgt2 = fast_augment(rng, img, target)
    assert img2.shape == img.shape
    classes = np.unique(np.asarray(tgt2[..., 0]))
    assert set(classes) <= {0.0, 1.0}  # nearest sampling keeps labels crisp


def test_tta_specs_and_roundtrip():
    from mapping_tpu.data.tta import (aggregate, expand_batch, inverse_batch,
                                      tta_specs)

    specs = tta_specs(flip_ud=True, flip_lr=True, rotation=True)
    assert len(specs) == 16
    assert specs[0] == (False, False, 0, 0)

    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    expanded = expand_batch(imgs, specs)
    assert expanded.shape == (2, 16, 32, 32, 3)
    # geometric inverse undoes forward exactly (pure flips/rot90)
    restored = inverse_batch(expanded, specs)
    for v in range(16):
        np.testing.assert_allclose(np.asarray(restored[:, v]), np.asarray(imgs),
                                   atol=1e-6)
    agg = aggregate(restored, "gmean")
    np.testing.assert_allclose(np.asarray(agg), np.asarray(imgs), atol=1e-5)


def test_tta_wrap_predict_identity_model():
    from mapping_tpu.data.tta import tta_specs, tta_wrap_predict

    specs = tta_specs()
    run = tta_wrap_predict(lambda x: x * 2.0, specs, method="mean")
    imgs = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16, 3), jnp.float32)
    out = run(imgs)
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(imgs), atol=1e-5)


def test_color_shift_changes_channel():
    from mapping_tpu.data.augment import color_shift

    img = jnp.full((8, 8, 3), 100.0)
    out = color_shift(jax.random.PRNGKey(4), img)
    assert out.shape == img.shape
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() <= 255


def test_predict_heterogeneous_image_sizes(tmp_path):
    """predict_on_dir must handle mixed image sizes (host-resize fallback in
    SegmentationLoader._assemble)."""
    from PIL import Image

    from mapping_tpu.data.loader import SegmentationLoader

    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(300, 300), (200, 260), (320, 280)]):
        p = str(tmp_path / f"img_{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        paths.append(p)
    loader = SegmentationLoader(mode="resize", size=(64, 64),
                                batch_size_inference=3)
    flow, steps = loader.transform(np.asarray(paths), None,
                                   train_mode=False)["datagen"]
    batch = next(iter(flow))
    assert batch["image"].shape == (3, 64, 64, 3)


def test_inference_tail_batch_padded_to_full_shape(dataset, prepared):
    """A ragged tail batch in pure-inference flows is padded with duplicate
    images so every batch compiles to the SAME program shape; n_images on
    the flow records the real count for consumers to trim."""
    from mapping_tpu.data import generate_metadata
    from mapping_tpu.data.loader import SegmentationLoader

    meta = generate_metadata(dataset, prepared, "masks_overlayed")
    paths = meta.file_path_image.values[:3]  # 3 images, bs=2 -> ragged tail

    loader = SegmentationLoader(mode="resize", size=(64, 64),
                                batch_size_inference=2)
    out = loader.transform(paths, None, train_mode=False)
    flow, steps = out["datagen"]
    assert steps == 2
    assert flow.n_images == 3
    batches = list(flow)
    assert [b["image"].shape[0] for b in batches] == [2, 2]  # padded tail
    # pad row duplicates the last real image
    np.testing.assert_array_equal(np.asarray(batches[1]["image"][1]),
                                  np.asarray(batches[1]["image"][0]))

    # validation flows (targets given) stay ragged: padding would bias loss
    targets = meta.file_path_mask_eroded_0_dilated_0.values[:3]
    out_v = loader.transform(paths, targets, train_mode=False)
    vflow, vsteps = out_v["datagen"]
    vbatches = list(vflow)
    assert [b["image"].shape[0] for b in vbatches] == [2, 1]

    # trainer.transform trims back to the real image count
    import jax.numpy as jnp

    from mapping_tpu.train.trainer import UNetTrainer

    trainer = UNetTrainer(
        model_params={"encoder": "from_scratch", "n_filters": 4,
                      "repeat_blocks": 1, "dtype": jnp.float32},
        optimizer_params={"lr": 1e-3}, loss_params={"imsize": (64, 64)},
        training_config={"epochs": 1}, loss_name="ce", input_size=(64, 64))
    trainer._ensure_state()
    probs = trainer.transform(out["datagen"])["multichannel_map_prediction"]
    assert probs.shape[0] == 3
    stream = trainer.transform(out["datagen"],
                               stream=True)["multichannel_map_prediction"]
    assert sum(1 for _ in stream) == 3


def test_train_heterogeneous_sizes_resizes_targets_too(tmp_path):
    """Mixed-size TRAIN batches: targets must be host-resized alongside
    their images (mask/sizes nearest, distances bilinear — the same
    channel semantics as the device _resize_target), not stacked raw."""
    import joblib
    from PIL import Image

    from mapping_tpu.data.loader import SegmentationLoader

    rng = np.random.RandomState(1)
    img_paths, mask_paths = [], []
    for i, (h, w) in enumerate([(100, 100), (80, 60)]):
        ip = str(tmp_path / f"img_{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3),
                                    dtype=np.uint8)).save(ip)
        img_paths.append(ip)
        for sub in ("masks", "distances", "sizes"):
            os.makedirs(tmp_path / sub, exist_ok=True)
        mp = str(tmp_path / "masks" / f"img_{i}.png")
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4: h // 2, w // 4: w // 2] = 1
        Image.fromarray(mask).save(mp)
        joblib.dump(np.ones((h, w), np.float16) * 3,
                    str(tmp_path / "distances" / f"img_{i}"))
        joblib.dump(np.ones((h, w), np.int32) * 9,
                    str(tmp_path / "sizes" / f"img_{i}"))
        mask_paths.append(mp)

    loader = SegmentationLoader(mode="resize", size=(64, 64),
                                batch_size_train=2)
    flow, steps = loader.transform(np.asarray(img_paths),
                                   np.asarray(mask_paths),
                                   train_mode=True)["datagen"]
    batch = next(iter(flow))
    assert batch["image"].shape == (2, 64, 64, 3)
    assert batch["target"].shape == (2, 64, 64, 3)
    mask_ch = np.asarray(batch["target"][..., 0])
    assert set(np.unique(mask_ch)) <= {0.0, 1.0}  # nearest keeps classes
    assert mask_ch.sum() > 0


def test_color_tta_uses_distinct_keys_per_image():
    """Color runs draw a distinct key per image: two images in one batch
    must get DIFFERENT color shifts at the same spec (the reference's
    color_seq sampled fresh params per crop, src/loaders.py:456-470)."""
    import jax.numpy as jnp

    from mapping_tpu.data.tta import TTASpec, expand_batch

    img = np.full((2, 16, 16, 3), 128, np.float32)  # identical content
    specs = [TTASpec(ud_flip=False, lr_flip=False, rotation=0,
                     color_shift=1)]
    out = np.asarray(expand_batch(jnp.asarray(img), specs))
    # same input content, same spec -> different outputs per batch index
    assert np.abs(out[0, 0] - out[1, 0]).max() > 1e-3
    # and deterministic across calls (serving reproducibility)
    out2 = np.asarray(expand_batch(jnp.asarray(img), specs))
    np.testing.assert_array_equal(out, out2)
