"""Second-level scoring models: per-instance feature extraction, IoU
regressors, threshold-layer NMS.

Parity targets:
 - FeatureExtractor / get_features_for_image (reference
   src/postprocessing.py:18-25,261-321): 11 handcrafted features per
   instance (iou vs GT on the train path, threshold, area, mean/max prob,
   bbox aspect/area/fill, min/max distance to border, contour length);
 - ScoringLightGBM / ScoringRandomForest (src/models.py:212-284) — lightgbm
   is unavailable in this environment, so the 'lgbm' config key maps to
   sklearn HistGradientBoostingRegressor (same gradient-boosted-trees family)
   with the reference's train/valid split + early stopping; RF is sklearn's;
 - ScoreImageJoiner + NonMaximumSupression / remove_overlapping_masks
   (src/postprocessing.py:28-45,367-380): greedy per-image mask NMS across
   threshold layers by score, zeroing suppressed scores at IoU > 0.5.

Contour length is computed as boundary-pixel count (mask minus 4-neighbor
erosion), the dependency-free equivalent of the reference's cv2.findContours
CHAIN_APPROX_NONE pixel chain (src/postprocessing.py:356-364).
"""

from typing import Dict, List

import numpy as np
import pandas as pd

from mapping_tpu.constants import CATEGORY_IDS, CATEGORY_LAYERS
from mapping_tpu.ops import rle as rle_ops
from mapping_tpu.utils.logging import get_logger

logger = get_logger()


# ---------------------------------------------------------------------------
# features
# ---------------------------------------------------------------------------

def _bbox(mask):
    rows = np.any(mask, axis=1)
    cols = np.any(mask, axis=0)
    rmin, rmax = np.where(rows)[0][[0, -1]]
    cmin, cmax = np.where(cols)[0][[0, -1]]
    return rmin, rmax + 1, cmin, cmax + 1


def _contour_length(mask):
    m = mask.astype(bool)
    interior = m.copy()
    interior[1:] &= m[:-1]
    interior[:-1] &= m[1:]
    interior[:, 1:] &= m[:, :-1]
    interior[:, :-1] &= m[:, 1:]
    return int(m.sum() - interior.sum())


def features_for_mask(mask, probabilities, threshold, iou=None) -> Dict:
    """One instance's feature row (reference get_features_for_mask,
    src/postprocessing.py:286-303)."""
    mask = mask.astype(bool)
    area = int(mask.sum())
    masked = np.where(mask, probabilities, 0.0)
    mean_prob = float(masked.sum() / max(area, 1))
    max_prob = float(masked.max()) if area else 0.0
    rmin, rmax, cmin, cmax = _bbox(mask)
    bh, bw = rmax - rmin, cmax - cmin
    h, w = mask.shape
    dists = [rmin, h - rmax, cmin, w - cmax]
    return {
        "iou": iou,
        "threshold": round(float(threshold), 2),
        "area": area,
        "mean_prob": mean_prob,
        "max_prob": max_prob,
        "bbox_ar": bh / bw,
        "bbox_area": bh * bw,
        "bbox_fill": area / (bh * bw),
        "min_dist_to_border": min(dists),
        "max_dist_to_border": max(dists),
        "contour_length": _contour_length(mask),
    }


def _layer_thresholds(category_layers):
    thresholds = []
    for n in category_layers:
        step = 1.0 / (n + 1)
        thresholds.extend(np.arange(step, 1.0 - 1e-9, step))
    return thresholds


def features_for_image(labels, probabilities, annotations=None,
                       category_layers=None,
                       category_ids=None) -> List[pd.DataFrame]:
    """Per threshold-layer feature tables for one image.

    labels: (L, H, W) labeled instances; probabilities: (C, H, W) or
    (H, W, C) category probability maps; annotations: {category_id: [ann]}
    for GT IoU targets on the train path (reference get_features_for_image,
    src/postprocessing.py:261-283). category_layers/category_ids default to
    the global constants but follow the run's override (e.g. [1, 19] for
    scoring pipelines).
    """
    if category_layers is None:
        category_layers = CATEGORY_LAYERS
    if category_ids is None:
        category_ids = CATEGORY_IDS
    if probabilities.ndim == 3 and probabilities.shape[-1] <= 8:
        probabilities = np.moveaxis(probabilities, -1, 0)
    annotations = annotations or {}
    thresholds = _layer_thresholds(category_layers)
    layer_to_cat = np.searchsorted(np.cumsum(category_layers),
                                   np.arange(labels.shape[0]), side="right")
    image_features = []
    for layer_nr in range(labels.shape[0]):
        cat_nr = layer_to_cat[layer_nr]
        cat_probs = probabilities[cat_nr]
        cat_anns = annotations.get(category_ids[cat_nr], [])
        layer = labels[layer_nr]
        iou_matrix = _gt_iou_matrix(layer, cat_anns)
        rows = []
        for label_nr in range(1, int(layer.max()) + 1):
            mask = layer == label_nr
            iou = (float(iou_matrix[label_nr - 1].max())
                   if iou_matrix is not None and iou_matrix.size else None)
            rows.append(features_for_mask(mask, cat_probs,
                                          thresholds[layer_nr], iou))
        image_features.append(pd.DataFrame(rows))
    return image_features


def _gt_iou_matrix(layer, annotations):
    if not annotations:
        return None
    h, w = layer.shape
    n = int(layer.max())
    if n == 0:
        return None
    # annotation_to_rle MERGES multi-part polygon segmentations (a GT
    # building split by occlusion is several polygons); taking only part
    # [0] would deflate the IoU regression target for every multi-part
    # annotation — the same helper cocoeval._segmentation_of uses
    gt_rles = [rle_ops.annotation_to_rle(ann, h, w) for ann in annotations]
    dt_rles = _detection_rles(layer, n, h, w)
    return rle_ops.iou(dt_rles, gt_rles, [0] * len(gt_rles))


def _detection_rles(layer, n, h, w):
    """All detection RLEs of a labeled map in ONE pass over the pixels
    (cpp/rle.cpp rle_instances) instead of n× `layer == i` scans + encodes —
    the same loop the annotation writer already avoids
    (infer/annotations.py:60); on the scoring train path this runs per layer
    x 19 layers x 10k sampled images."""
    try:
        from mapping_tpu.utils import native

        if native.available():
            packed = native.rle_instances(np.ascontiguousarray(layer), n)
            return [{"size": [h, w], "counts": counts}
                    for counts, _ in packed]
    except Exception:  # pragma: no cover - toolchain unavailable
        pass
    return [rle_ops.encode((layer == i).astype(np.uint8))
            for i in range(1, n + 1)]


def features_from_tensor(feature_tensor, labels, annotations=None,
                         category_layers=None,
                         category_ids=None) -> List[pd.DataFrame]:
    """Device feature tensor -> the same per-layer DataFrames as
    features_for_image, without any per-instance host loop.

    feature_tensor: (L, max_instances, 9) from
    ops.instance.instance_feature_tensor (FEATURE_COLUMNS order); labels
    (L, H, W) are only consulted for instance counts and the optional GT IoU
    targets (RLE work on host, C++ fast path). The per-pixel feature math
    already happened on device (reference did it per instance on host,
    src/postprocessing.py:261-303).
    """
    from mapping_tpu.ops.instance import FEATURE_COLUMNS

    if category_layers is None:
        category_layers = CATEGORY_LAYERS
    if category_ids is None:
        category_ids = CATEGORY_IDS
    annotations = annotations or {}
    thresholds = _layer_thresholds(category_layers)
    layer_to_cat = np.searchsorted(np.cumsum(category_layers),
                                   np.arange(labels.shape[0]), side="right")
    feature_tensor = np.asarray(feature_tensor)
    image_features = []
    for layer_nr in range(labels.shape[0]):
        cat_nr = layer_to_cat[layer_nr]
        cat_anns = annotations.get(category_ids[cat_nr], [])
        layer = labels[layer_nr]
        n = int(layer.max())
        if n > feature_tensor.shape[1]:
            # the device tensor has a fixed slot budget; past it the tail
            # instances lose their features — clamp consistently (the
            # annotation writer logs-and-drops the same tail)
            logger.warning("layer %d: %d instances exceed the %d feature "
                           "slots; tail dropped from scoring", layer_nr, n,
                           feature_tensor.shape[1])
            n = feature_tensor.shape[1]
        iou_matrix = _gt_iou_matrix(layer, cat_anns)
        block = feature_tensor[layer_nr, :n]
        df = pd.DataFrame(block, columns=list(FEATURE_COLUMNS))
        df.insert(0, "threshold", round(float(thresholds[layer_nr]), 2))
        # explicit float column, NaN where no GT exists: downstream
        # `df[df["iou"].notna()]` behaves identically and the frame stays
        # homogeneous (a mixed object column was fragile)
        iou = (np.asarray(iou_matrix.max(axis=1)[:n], dtype=np.float64)
               if iou_matrix is not None and iou_matrix.size else
               np.full(n, np.nan))
        df.insert(0, "iou", iou)
        df["area"] = df["area"].astype(int)
        df["bbox_area"] = df["bbox_area"].astype(int)
        df["contour_length"] = df["contour_length"].astype(int)
        image_features.append(df)
    return image_features


class FeatureExtractor:
    """Batch driver (reference FeatureExtractor, src/postprocessing.py:18-25)."""

    def transform(self, images, probabilities, annotations=None):
        if annotations is None:
            annotations = [None] * len(images)
        features = [features_for_image(img, probs, anns)
                    for img, probs, anns in zip(images, probabilities,
                                                annotations)]
        return {"features": features}


# ---------------------------------------------------------------------------
# scoring regressors
# ---------------------------------------------------------------------------

_FEATURE_COLUMNS = ["threshold", "area", "mean_prob", "max_prob", "bbox_ar",
                    "bbox_area", "bbox_fill", "min_dist_to_border",
                    "max_dist_to_border", "contour_length"]


class _ScoringModelBase:
    """fit on the extracted features / predict per image x layer
    (reference ScoringLightGBM/-RandomForest, src/models.py:212-284)."""

    target = "iou"
    train_size = 0.7

    def __init__(self):
        self.estimator = None

    def fit(self, features):
        return self.fit_stream(iter(features))

    def fit_stream(self, features_iter):
        """Fit from an ITERATOR of per-image feature-table lists, compacting
        each image's rows to numpy immediately. The scoring train path
        streams images through the serve program (pipelines.py
        ScoringModelPipeline.fit_transform); holding the per-layer
        DataFrames themselves until one giant pd.concat
        (the reference's _convert_features_to_df, src/models.py:457-462)
        costs ~10 KB of pandas overhead per tiny frame — ~2 GB of pure
        bookkeeping at the default 10k-image x 19-layer sample — where the
        numeric payload is ~80 MB."""
        from sklearn.model_selection import train_test_split

        Xs, ys = [], []
        for image_features in features_iter:
            for layer_features in image_features[1:]:
                if not len(layer_features):
                    continue
                lf = layer_features[layer_features[self.target].notna()]
                if not len(lf):
                    continue
                Xs.append(lf[_FEATURE_COLUMNS].to_numpy(np.float64))
                ys.append(lf[self.target].to_numpy(np.float64))
        X = (np.concatenate(Xs) if Xs
             else np.empty((0, len(_FEATURE_COLUMNS))))
        y = np.concatenate(ys) if ys else np.empty((0,))
        if len(y) < 4:
            X_train, y_train = X, y
            X_valid, y_valid = X, y
        else:
            X_train, X_valid, y_train, y_valid = train_test_split(
                X, y, train_size=self.train_size, random_state=1234)
        self._fit_estimator(X_train, y_train, X_valid, y_valid)
        return self

    def transform(self, features):
        scores = []
        for image_features in features:
            image_scores = []
            for layer_nr, layer_features in enumerate(image_features):
                if layer_nr == 0 or not len(layer_features):
                    image_scores.append([0.0] * len(layer_features))
                    continue
                X = layer_features[_FEATURE_COLUMNS].astype(np.float64).values
                image_scores.append(list(self.estimator.predict(X)))
            scores.append(image_scores)
        return {"scores": scores}

    def save(self, filepath):
        import joblib

        joblib.dump(self.estimator, filepath)

    def load(self, filepath):
        import joblib

        self.estimator = joblib.load(filepath)
        return self


def load_scoring_model(filepath) -> "_ScoringModelBase":
    """Inference-only load of a saved scoring model. `save()` persists just
    the fitted estimator, and `transform` needs nothing else, so any
    subclass's file replays through the base class — used by artifact
    serving, which has no config to reconstruct the training-time class
    from (infer/artifact.py ArtifactServe.converter)."""
    return _ScoringModelBase().load(filepath)


class ScoringGBM(_ScoringModelBase):
    """Gradient-boosted-trees IoU regressor (the 'lgbm' slot; lightgbm is
    not in this image). Primary engine: the native C++ histogram GBM
    (cpp/gbm.cpp) reproducing lgb.train's semantics — leaf-wise growth to
    num_leaves, min_data(_in_leaf), explicit-valid-set early stopping,
    predict at best_iteration (reference src/steps/sklearn/models.py:75-99,
    src/pipeline_config.py:136-148). Fallback when the C++ toolchain is
    unavailable: sklearn's histogram GBM, staged to honor the same explicit
    valid split."""

    def __init__(self, model_params=None, training_params=None,
                 train_size=0.7, target="iou"):
        super().__init__()
        self.model_params = dict(model_params or {})
        self.training_params = dict(training_params or {})
        self.train_size = train_size
        self.target = target

    def _fit_estimator(self, X_train, y_train, X_valid, y_valid):
        from mapping_tpu.utils import native_gbm

        if native_gbm.available():
            est = native_gbm.NativeGBMRegressor(
                learning_rate=self.model_params.get("learning_rate", 0.01),
                num_leaves=int(self.model_params.get("num_leaves", 500)),
                min_data=int(self.model_params.get("min_data", 100)),
                max_depth=int(self.model_params.get("max_depth", 20)),
                sub_feature=float(self.model_params.get("sub_feature", 1.0)),
                number_boosting_rounds=int(self.training_params.get(
                    "number_boosting_rounds", 500)),
                early_stopping_rounds=int(self.training_params.get(
                    "early_stopping_rounds", 10)))
            est.fit(X_train, y_train, X_valid, y_valid)
            self.best_iteration_ = est.best_iteration_
            self.estimator = est
            return
        self._fit_estimator_sklearn(X_train, y_train, X_valid, y_valid)

    def _fit_estimator_sklearn(self, X_train, y_train, X_valid, y_valid):
        """Early stopping on the EXPLICIT valid split, like lgb.train with
        valid_sets + early_stopping_rounds (reference
        src/steps/sklearn/models.py:75-95). sklearn's HistGBM only knows an
        internal validation_fraction, so stage the fit with warm_start and
        score X_valid ourselves; the final model is truncated to the best
        iteration (lightgbm's predict-at-best_iteration behavior)."""
        from sklearn.ensemble import HistGradientBoostingRegressor
        from sklearn.metrics import mean_squared_error

        params = dict(
            learning_rate=self.model_params.get("learning_rate", 0.01),
            max_leaf_nodes=min(self.model_params.get("num_leaves", 500), 255),
            max_depth=self.model_params.get("max_depth", 20),
            # lightgbm min_data(_in_leaf) -> sklearn min_samples_leaf
            min_samples_leaf=self.model_params.get("min_data", 20),
            early_stopping=False,
            random_state=1234,
        )
        total = min(int(self.training_params.get(
            "number_boosting_rounds", 500)), 10000)
        patience = int(self.training_params.get("early_stopping_rounds", 10))
        stride = max(1, min(patience, 25))
        est = HistGradientBoostingRegressor(
            max_iter=stride, warm_start=True, **params)
        best_loss, best_iter, n_iter = np.inf, 0, 0
        while n_iter < total:
            n_iter = min(n_iter + stride, total)
            est.set_params(max_iter=n_iter)
            est.fit(X_train, y_train)
            loss = mean_squared_error(y_valid, est.predict(X_valid))
            if loss < best_loss - 1e-12:
                best_loss, best_iter = loss, n_iter
            elif n_iter - best_iter >= patience:
                break
        if best_iter < n_iter:
            est = HistGradientBoostingRegressor(
                max_iter=max(best_iter, 1), warm_start=False, **params)
            est.fit(X_train, y_train)
        self.best_iteration_ = max(best_iter, 1)
        self.estimator = est


ScoringLightGBM = ScoringGBM  # reference-name alias


class ScoringRandomForest(_ScoringModelBase):
    def __init__(self, model_params=None, train_size=0.7, target="iou"):
        super().__init__()
        self.model_params = dict(model_params or {})
        self.train_size = train_size
        self.target = target

    def _fit_estimator(self, X_train, y_train, X_valid, y_valid):
        from sklearn.ensemble import RandomForestRegressor

        params = dict(self.model_params)
        params.setdefault("random_state", 1234)
        self.estimator = RandomForestRegressor(**params)
        self.estimator.fit(X_train, y_train)


# ---------------------------------------------------------------------------
# NMS across threshold layers
# ---------------------------------------------------------------------------

def remove_overlapping_masks(labels, scores, iou_threshold=0.5):
    """Greedy per-image NMS by score across all (layer, instance) pairs,
    zeroing suppressed scores (reference src/postprocessing.py:367-380).

    Fast path: one C++ RLE pass per layer (cpp/rle.cpp rle_instances),
    then greedy suppression where each candidate pays an exact run-space
    IoU only against survivors whose IoU *upper bound* — min(areas,
    bbox-intersection) over the implied union — clears the threshold.
    The dense variant below materializes an (H, W) boolean mask per PAIR,
    O(n^2·H·W); at the scoring pipeline's 19 threshold layers x ~1e3
    instances/image it runs for hours where this runs in seconds.
    Outcomes are identical (same greedy order, same exact integer
    inter/union, same strict >): _remove_overlapping_masks_dense is the
    oracle the fuzz test checks against, and the fallback when the C++
    toolchain is unavailable.
    """
    try:
        from mapping_tpu.utils import native

        if not native.available():
            raise RuntimeError
    except Exception:
        return _remove_overlapping_masks_dense(labels, scores, iou_threshold)

    entries = []       # (layer_nr, label_nr) by insertion order
    entry_scores = []
    handles = []
    boxes = []
    for layer_nr, layer_scores in enumerate(scores):
        n = len(layer_scores)
        if n == 0:
            continue
        packed = native.rle_instances(
            np.ascontiguousarray(labels[layer_nr]), n)
        for idx, (counts, bbox) in enumerate(packed):
            entries.append((layer_nr, idx + 1))
            entry_scores.append(float(layer_scores[idx]))
            handles.append(native.RleHandle(counts))
            boxes.append(bbox)
    m = len(entries)
    if m == 0:
        return labels, scores
    # stable descending sort == the dense path's list.sort(reverse=True):
    # ties keep (layer, label) insertion order
    order = sorted(range(m), key=lambda i: entry_scores[i], reverse=True)
    b = np.asarray(boxes, dtype=np.float64).reshape(m, 4)
    x1, y1 = b[:, 0], b[:, 1]
    x2, y2 = x1 + b[:, 2], y1 + b[:, 3]
    areas = np.array([h.area for h in handles], dtype=np.float64)
    # survivor state, filled incrementally (k = survivor count)
    sx1 = np.empty(m)
    sy1 = np.empty(m)
    sx2 = np.empty(m)
    sy2 = np.empty(m)
    sarea = np.empty(m)
    surv_idx = []
    for i in order:
        k = len(surv_idx)
        suppressed = False
        if k:
            iw = np.minimum(x2[i], sx2[:k]) - np.maximum(x1[i], sx1[:k])
            ih = np.minimum(y2[i], sy2[:k]) - np.maximum(y1[i], sy1[:k])
            bbox_inter = np.maximum(iw, 0.0) * np.maximum(ih, 0.0)
            inter_ub = np.minimum(np.minimum(areas[i], sarea[:k]),
                                  bbox_inter)
            union_lb = np.maximum(areas[i] + sarea[:k] - inter_ub, 1.0)
            gated = np.nonzero(inter_ub / union_lb > iou_threshold)[0]
            hi = handles[i]
            for j in gated:
                if native.rle_iou_pair(
                        hi, handles[surv_idx[j]]) > iou_threshold:
                    suppressed = True
                    break
        if suppressed:
            li, ni = entries[i]
            scores[li][ni - 1] = 0
        else:
            sx1[k], sy1[k], sx2[k], sy2[k] = x1[i], y1[i], x2[i], y2[i]
            sarea[k] = areas[i]
            surv_idx.append(i)
    return labels, scores


def _remove_overlapping_masks_dense(labels, scores, iou_threshold=0.5):
    """Reference-shaped dense implementation (per-pair boolean masks);
    oracle for the RLE fast path and fallback without the C++ library."""
    entries = []
    for layer_nr, layer_scores in enumerate(scores):
        for label_idx, score in enumerate(layer_scores):
            entries.append((float(score), layer_nr, label_idx + 1))
    entries.sort(key=lambda e: e[0], reverse=True)
    alive = list(entries)
    i = 0
    while i < len(alive):
        _, li, ni = alive[i]
        base = labels[li] == ni
        base_area = base.sum()
        j = i + 1
        while j < len(alive):
            _, lj, nj = alive[j]
            other = labels[lj] == nj
            inter = np.count_nonzero(base & other)
            union = base_area + other.sum() - inter
            if union > 0 and inter / union > iou_threshold:
                scores[lj][nj - 1] = 0
                alive.pop(j)
            else:
                j += 1
        i += 1
    return labels, scores


class NonMaximumSupression:
    def __init__(self, iou_threshold=0.5, **_):
        self.iou_threshold = iou_threshold

    def transform(self, images_with_scores):
        out = [remove_overlapping_masks(labels, scores, self.iou_threshold)
               for labels, scores in images_with_scores]
        return {"images_with_scores": out}
