"""Feature-matched logo placement — analog of
/root/reference/src/car_logo/logo_placement.py.

Places a logo onto a car image at a plausible position using a fallback
chain (logo_placement.py:45-276): SIFT/ORB feature-match homography →
template matching → random placement; warps the logo into the detected
plane and composites with its alpha; batch mode over folders (:446)."""
from __future__ import annotations

import argparse
import logging
import os
import random
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)


class LogoPlacer:
    def __init__(self, detector: str = "sift", min_matches: int = 10,
                 seed: int = 42):
        self.min_matches = min_matches
        self.rng = random.Random(seed)
        if detector == "sift" and hasattr(cv2, "SIFT_create"):
            self.detector = cv2.SIFT_create()
            self.norm = cv2.NORM_L2
        else:
            self.detector = cv2.ORB_create(nfeatures=2000)
            self.norm = cv2.NORM_HAMMING

    # ---- stage 1: feature-match homography (:45-128) -----------------------
    def detect_features(self, target_gray: np.ndarray,
                        anchor_gray: np.ndarray
                        ) -> Optional[np.ndarray]:
        """Homography anchor→target from matched features, or None."""
        kp1, des1 = self.detector.detectAndCompute(anchor_gray, None)
        kp2, des2 = self.detector.detectAndCompute(target_gray, None)
        if des1 is None or des2 is None or len(kp1) < 4 or len(kp2) < 4:
            return None
        matcher = cv2.BFMatcher(self.norm)
        matches = matcher.knnMatch(des1, des2, k=2)
        good = [m for pair in matches if len(pair) == 2
                for m, n in [pair] if m.distance < 0.75 * n.distance]
        if len(good) < self.min_matches:
            return None
        src = np.float32([kp1[m.queryIdx].pt for m in good]).reshape(-1, 1, 2)
        dst = np.float32([kp2[m.trainIdx].pt for m in good]).reshape(-1, 1, 2)
        H, inliers = cv2.findHomography(src, dst, cv2.RANSAC, 5.0)
        if H is None or inliers is None or inliers.sum() < self.min_matches:
            return None
        return H

    # ---- stage 2: template matching (:129-199) -----------------------------
    def template_matching_fallback(self, target_gray: np.ndarray,
                                   anchor_gray: np.ndarray
                                   ) -> Optional[Tuple[int, int, float]]:
        th, tw = target_gray.shape
        best = None
        for scale in (0.5, 0.75, 1.0, 1.25):
            ah = int(anchor_gray.shape[0] * scale)
            aw = int(anchor_gray.shape[1] * scale)
            if ah < 8 or aw < 8 or ah >= th or aw >= tw:
                continue
            templ = cv2.resize(anchor_gray, (aw, ah))
            res = cv2.matchTemplate(target_gray, templ, cv2.TM_CCOEFF_NORMED)
            _, maxv, _, maxloc = cv2.minMaxLoc(res)
            if best is None or maxv > best[2]:
                best = (maxloc[0], maxloc[1], maxv)
        if best is None or best[2] < 0.3:
            return None
        return best

    # ---- stage 3: random placement (:201-275) ------------------------------
    def random_placement_fallback(self, target_shape: Tuple[int, int],
                                  logo_shape: Tuple[int, int]
                                  ) -> Tuple[int, int]:
        th, tw = target_shape
        lh, lw = logo_shape
        # bias toward the central band (car body) like the reference
        x = self.rng.randint(tw // 6, max(tw - lw - tw // 6, tw // 6 + 1))
        y = self.rng.randint(th // 4, max(th - lh - th // 4, th // 4 + 1))
        return x, y

    # ---- compositing (:277-444) --------------------------------------------
    @staticmethod
    def _composite(target: np.ndarray, logo_rgba: np.ndarray,
                   x: int, y: int) -> Tuple[np.ndarray, np.ndarray]:
        out = target.copy()
        h, w = logo_rgba.shape[:2]
        th, tw = target.shape[:2]
        x2, y2 = min(x + w, tw), min(y + h, th)
        if x2 <= x or y2 <= y:
            return out, np.zeros(target.shape[:2], np.uint8)
        crop = logo_rgba[: y2 - y, : x2 - x]
        alpha = crop[..., 3:4].astype(np.float32) / 255.0
        out[y:y2, x:x2] = (crop[..., :3] * alpha +
                           out[y:y2, x:x2] * (1 - alpha)).astype(np.uint8)
        mask = np.zeros(target.shape[:2], np.uint8)
        mask[y:y2, x:x2] = (crop[..., 3] > 10).astype(np.uint8) * 255
        return out, mask

    def warp_and_place_logo(self, target_bgr: np.ndarray,
                            logo_rgba: np.ndarray,
                            anchor_bgr: Optional[np.ndarray] = None
                            ) -> Tuple[np.ndarray, np.ndarray, str]:
        """Returns (composited BGR, mask, method)."""
        target_gray = cv2.cvtColor(target_bgr, cv2.COLOR_BGR2GRAY)
        th, tw = target_gray.shape
        scale = self.rng.uniform(0.08, 0.2)
        lw = max(int(tw * scale), 8)
        lh = max(int(logo_rgba.shape[0] * lw / max(logo_rgba.shape[1], 1)),
                 8)
        logo = cv2.resize(logo_rgba, (lw, lh))

        if anchor_bgr is not None:
            anchor_gray = cv2.cvtColor(anchor_bgr, cv2.COLOR_BGR2GRAY)
            H = self.detect_features(target_gray, anchor_gray)
            if H is not None:
                warped = cv2.warpPerspective(logo, H, (tw, th))
                out, mask = self._composite(target_bgr, warped, 0, 0)
                if (mask > 0).any():
                    return out, mask, "homography"
            tm = self.template_matching_fallback(target_gray, anchor_gray)
            if tm is not None:
                out, mask = self._composite(target_bgr, logo, tm[0], tm[1])
                return out, mask, "template"
        x, y = self.random_placement_fallback((th, tw), (lh, lw))
        out, mask = self._composite(target_bgr, logo, x, y)
        return out, mask, "random"

    # ---- batch (:446-585) ---------------------------------------------------
    def batch_process(self, cars_dir: str, logos_dir: str, output_root: str,
                      limit: Optional[int] = None) -> Dict:
        wm_dir = os.path.join(output_root, "watermarked")
        cl_dir = os.path.join(output_root, "clean")
        mk_dir = os.path.join(output_root, "masks")
        for d in (wm_dir, cl_dir, mk_dir):
            os.makedirs(d, exist_ok=True)
        cars = sorted(
            os.path.join(cars_dir, f) for f in os.listdir(cars_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png")))
        logos = sorted(
            os.path.join(logos_dir, f) for f in os.listdir(logos_dir)
            if f.lower().endswith(".png"))
        if limit:
            cars = cars[:limit]
        stats = {"homography": 0, "template": 0, "random": 0, "failed": 0}
        for cp in cars:
            car = cv2.imread(cp)
            if car is None or not logos:
                stats["failed"] += 1
                continue
            logo = cv2.imread(self.rng.choice(logos), cv2.IMREAD_UNCHANGED)
            if logo is None:
                stats["failed"] += 1
                continue
            if logo.shape[-1] == 3:
                logo = np.dstack([logo, np.full(logo.shape[:2], 255,
                                                np.uint8)])
            out, mask, method = self.warp_and_place_logo(car, logo)
            stats[method] += 1
            stem = os.path.splitext(os.path.basename(cp))[0]
            cv2.imwrite(os.path.join(wm_dir, f"{stem}.jpg"), out)
            cv2.imwrite(os.path.join(cl_dir, f"{stem}.jpg"), car)
            cv2.imwrite(os.path.join(mk_dir, f"{stem}.png"), mask)
        return stats


def main(argv=None):
    p = argparse.ArgumentParser(description="car logo placement")
    p.add_argument("--cars", required=True)
    p.add_argument("--logos", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--limit", type=int)
    args = p.parse_args(argv)
    placer = LogoPlacer()
    print(placer.batch_process(args.cars, args.logos, args.output,
                               args.limit))


if __name__ == "__main__":
    main()
