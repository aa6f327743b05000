"""Image clustering / classification — analog of
/root/reference/classfy_image.py, dinov2_classification.py and dino.py.

Feature extraction (DINOv2 via transformers, with a fallback chain like
classfy_image.py:124-241), on-disk feature cache, seeded KMeans+PCA
clustering with cluster visualization/copying, simpler DBSCAN grouping,
and per-cluster comparison videos.

Zero-egress note: pretrained DINOv2 weights load only from the local HF
cache; when absent the extractor falls back to (a) a randomly-initialized
DINOv2 (API-compatible, useful for smoke tests) or (b) a fast classical
feature (color+gradient histogram) that clusters meaningfully without any
weights — the reference's ResNet50-fallback analog.
"""
from __future__ import annotations

import argparse
import logging
import os
import shutil
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)


def _hist_features(img_rgb: np.ndarray) -> np.ndarray:
    """Classical fallback feature: color histogram + gradient-orientation
    histogram (weight-free, deterministic)."""
    img = cv2.resize(img_rgb, (128, 128))
    feats = []
    for c in range(3):
        h = cv2.calcHist([img], [c], None, [32], [0, 256]).ravel()
        feats.append(h / (h.sum() + 1e-8))
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    gx = cv2.Sobel(gray, cv2.CV_32F, 1, 0)
    gy = cv2.Sobel(gray, cv2.CV_32F, 0, 1)
    mag = np.sqrt(gx ** 2 + gy ** 2)
    ang = (np.arctan2(gy, gx) + np.pi) / (2 * np.pi) * 16
    hog = np.zeros(16, np.float32)
    for b in range(16):
        hog[b] = mag[(ang >= b) & (ang < b + 1)].sum()
    feats.append(hog / (hog.sum() + 1e-8))
    return np.concatenate(feats)


class FeatureExtractor:
    """DINOv2 → random-DINOv2 → classical histogram fallback chain
    (classfy_image.py:124-241 analog)."""

    def __init__(self, model_name: str = "facebook/dinov2-base",
                 allow_random_init: bool = True):
        self.model_name = model_name
        self.backend = "hist"
        self._model = None
        self._processor = None
        try:
            from transformers import AutoImageProcessor, AutoModel

            self._processor = AutoImageProcessor.from_pretrained(
                model_name, local_files_only=True)
            self._model = AutoModel.from_pretrained(
                model_name, local_files_only=True)
            self.backend = "dinov2"
        except Exception as e:  # noqa: BLE001
            logger.info("pretrained %s unavailable locally (%s)",
                        model_name, e)
            if allow_random_init:
                try:
                    from transformers import Dinov2Config, Dinov2Model

                    cfg = Dinov2Config(hidden_size=384, num_hidden_layers=4,
                                       num_attention_heads=6,
                                       intermediate_size=1536)
                    self._model = Dinov2Model(cfg)
                    self.backend = "dinov2-random"
                except Exception as e2:  # noqa: BLE001
                    logger.info("random DINOv2 unavailable (%s); using "
                                "histogram features", e2)
        logger.info("feature backend: %s", self.backend)

    def extract(self, image_rgb: np.ndarray) -> np.ndarray:
        if self.backend.startswith("dinov2"):
            import torch

            img = cv2.resize(image_rgb, (224, 224)).astype(np.float32) / 255
            img = (img - [0.485, 0.456, 0.406]) / [0.229, 0.224, 0.225]
            x = torch.tensor(np.transpose(img, (2, 0, 1))[None],
                             dtype=torch.float32)
            with torch.no_grad():
                out = self._model(pixel_values=x)
            return out.last_hidden_state[:, 0].numpy().ravel()
        return _hist_features(image_rgb)


class StableImageClassifier:
    """classfy_image.py:93-611 analog: cached features + seeded
    KMeans(+PCA) clustering + cluster copy/visualize."""

    def __init__(self, extractor: Optional[FeatureExtractor] = None,
                 cache_path: Optional[str] = None, seed: int = 42):
        self.extractor = extractor or FeatureExtractor()
        self.cache_path = cache_path
        self.seed = seed
        self._cache: Dict[str, np.ndarray] = {}
        if cache_path and os.path.exists(cache_path):
            data = np.load(cache_path, allow_pickle=True)
            self._cache = dict(data["cache"].item())

    def _features_for(self, paths: List[str]) -> np.ndarray:
        feats = []
        for p in paths:
            key = os.path.abspath(p)
            if key not in self._cache:
                img = cv2.imread(p)
                if img is None:
                    self._cache[key] = np.zeros(
                        len(next(iter(self._cache.values())))
                        if self._cache else 112, np.float32)
                else:
                    self._cache[key] = self.extractor.extract(
                        cv2.cvtColor(img, cv2.COLOR_BGR2RGB)).astype(
                            np.float32)
            feats.append(self._cache[key])
        if self.cache_path:
            np.savez_compressed(self.cache_path, cache=self._cache)
        return np.stack(feats)

    def stable_cluster_images(self, folder: str, n_clusters: int = 5,
                              pca_dims: Optional[int] = 64
                              ) -> Dict[str, int]:
        """classfy_image.py:389 analog; returns {path: cluster}."""
        from sklearn.cluster import KMeans
        from sklearn.decomposition import PCA

        paths = sorted(
            os.path.join(folder, f) for f in os.listdir(folder)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
        if not paths:
            return {}
        feats = self._features_for(paths)
        if pca_dims and feats.shape[1] > pca_dims and len(paths) > pca_dims:
            feats = PCA(n_components=pca_dims,
                        random_state=self.seed).fit_transform(feats)
        k = min(n_clusters, len(paths))
        labels = KMeans(n_clusters=k, random_state=self.seed,
                        n_init=10).fit_predict(feats)
        return dict(zip(paths, labels.tolist()))

    def copy_clusters(self, assignment: Dict[str, int],
                      output_dir: str) -> None:
        for path, cluster in assignment.items():
            d = os.path.join(output_dir, f"cluster_{cluster}")
            os.makedirs(d, exist_ok=True)
            shutil.copy2(path, os.path.join(d, os.path.basename(path)))

    def cluster_videos(self, assignment: Dict[str, int],
                       output_dir: str) -> List[str]:
        """Per-cluster video (classfy_image.py:612 analog)."""
        from .video_generator import VideoGenerator

        os.makedirs(output_dir, exist_ok=True)
        gen = VideoGenerator(width=640, height=480, duration_per_image=0.5,
                             fps=10)
        outputs = []
        by_cluster: Dict[int, List[str]] = {}
        for p, c in assignment.items():
            by_cluster.setdefault(c, []).append(p)
        for c, paths in sorted(by_cluster.items()):
            out = os.path.join(output_dir, f"cluster_{c}.mp4")
            writer = gen._writer(out)
            try:
                for p in sorted(paths):
                    img = cv2.imread(p)
                    if img is None:
                        continue
                    frame = gen.add_text_overlay(
                        gen.resize_image_with_padding(img), f"cluster {c}")
                    gen._hold(writer, frame, 0.5)
            finally:
                writer.release()
            outputs.append(out)
        return outputs


def dbscan_group(folder: str, eps: float = 0.5, min_samples: int = 2,
                 extractor: Optional[FeatureExtractor] = None
                 ) -> Dict[str, int]:
    """Minimal DBSCAN grouping (dino.py:15-42 analog)."""
    from sklearn.cluster import DBSCAN
    from sklearn.preprocessing import normalize

    classifier = StableImageClassifier(extractor)
    paths = sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
    if not paths:
        return {}
    feats = normalize(classifier._features_for(paths))
    labels = DBSCAN(eps=eps, min_samples=min_samples,
                    metric="cosine").fit_predict(feats)
    return dict(zip(paths, labels.tolist()))


def main(argv=None):
    p = argparse.ArgumentParser(description="image clustering")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--clusters", type=int, default=5)
    p.add_argument("--videos", action="store_true")
    args = p.parse_args(argv)
    c = StableImageClassifier()
    assignment = c.stable_cluster_images(args.input, args.clusters)
    c.copy_clusters(assignment, args.output)
    if args.videos:
        c.cluster_videos(assignment, os.path.join(args.output, "videos"))
    print({f"cluster_{v}": sum(1 for x in assignment.values() if x == v)
           for v in sorted(set(assignment.values()))})


if __name__ == "__main__":
    main()
