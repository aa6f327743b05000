"""Frozen quality protocol: ONE reproducible table for every shipped config.

The reference publishes no accuracy numbers at all (SURVEY.md §6) and this
repo's rounds 1-2 left quality claims scattered across commit messages
taken on different data (round-1 "IoU 0.82" vs round-2 shipped "0.734"
were not comparable). This script is the fix: a seed-frozen held-out set,
regenerated bit-identically on any machine, scoring

  * per segmentation checkpoint: raw-network mask IoU/F1/P/R at 0.5
    threshold (no post-processing — measures the model) and pipeline IoU
    (with the type-aware mask optimization the product runs),
  * per inpaint engine: hole PSNR / whole-image SSIM on LaMa-protocol
    random holes (scripts/inpaint_quality.py protocol),
  * end-to-end repair: watermarked -> fused detect->optimize->inpaint ->
    PSNR-to-clean, against the no-op floor PSNR(watermarked, clean).

Seeds 7700/7701 are reserved for this protocol and used by no training
run (training uses DATA.SEED=42 lineage). The set is NOT committed; it is
regenerated on demand from the procedural generators (data/synth_clean.py,
data/gen_data.py), which are seed-deterministic by design.

    python -m unet_watermark_tpu.scripts.quality_report \
        --workdir workspace/quality --limit 64

Writes <workdir>/quality_report.json and (with --docs) refreshes the
table block in docs/QUALITY.md between the AUTOGEN markers.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)

CLEAN_SEED = 7700
COMPOSE_SEED = 7701
# textured tier (round 4): natural-image high-frequency statistics
# (data/synth_clean.synth_textured_image) — the regime where boundary
# interpolation cannot stand in for learned texture synthesis. Seeds
# reserved exactly like 7700/7701; no training run uses them.
TEX_CLEAN_SEED = 7800
TEX_COMPOSE_SEED = 7801
IMG_SIZE = 512


# ---------------------------------------------------------------------------
# frozen held-out set
# ---------------------------------------------------------------------------

def ensure_frozen_set(workdir: str, n: int = 64,
                      img_size: int = IMG_SIZE,
                      textured: bool = False) -> str:
    """Generate (or reuse) the frozen triad set under <workdir>/heldout
    (or heldout_tex): watermarked/ clean/ masks/, n images at 512².
    Idempotent: the generators' per-index child RNGs make re-runs
    byte-identical, so an existing complete directory is reused as-is."""
    from ..data.gen_data import generate_dataset
    from ..data.synth_clean import generate_clean_dataset, generate_logo_set

    suffix = "_tex" if textured else ""
    root = os.path.join(workdir, "heldout" + suffix)
    wm_dir = os.path.join(root, "watermarked")
    if os.path.isdir(wm_dir) and len(os.listdir(wm_dir)) >= n:
        return root
    clean_src = os.path.join(workdir, "clean_src" + suffix)
    logos = os.path.join(workdir, "logos")
    cseed = TEX_CLEAN_SEED if textured else CLEAN_SEED
    generate_clean_dataset(clean_src, count=max(16, n // 2),
                           size=img_size, seed=cseed,
                           texture_ratio=1.0 if textured else 0.0)
    generate_logo_set(logos, count=12, seed=CLEAN_SEED + 1)
    stats = generate_dataset(
        clean_src, root, logos_dir=logos, count=n,
        seed=TEX_COMPOSE_SEED if textured else COMPOSE_SEED)
    logger.info("frozen held-out set%s: %s", suffix, stats)
    return root


def _load_triads(root: str, limit: int, img_size: int = IMG_SIZE):
    """Yield (name, watermarked u8 RGB, clean u8 RGB, mask u8 {0,255}),
    all at IMG_SIZE², sorted by name for determinism."""
    import cv2

    wm_dir = os.path.join(root, "watermarked")
    cl_dir = os.path.join(root, "clean")
    mk_dir = os.path.join(root, "masks")
    names = sorted(os.listdir(wm_dir))[:limit]
    for name in names:
        stem = os.path.splitext(name)[0]
        wm = cv2.cvtColor(cv2.imread(os.path.join(wm_dir, name)),
                          cv2.COLOR_BGR2RGB)
        cl = cv2.cvtColor(cv2.imread(os.path.join(cl_dir, name)),
                          cv2.COLOR_BGR2RGB)
        mk = cv2.imread(os.path.join(mk_dir, stem + ".png"),
                        cv2.IMREAD_GRAYSCALE)
        if wm.shape[0] != img_size:
            wm = cv2.resize(wm, (img_size, img_size))
            cl = cv2.resize(cl, (img_size, img_size))
            mk = cv2.resize(mk, (img_size, img_size),
                            interpolation=cv2.INTER_NEAREST)
        yield name, wm, cl, mk


# ---------------------------------------------------------------------------
# segmentation eval
# ---------------------------------------------------------------------------

def _cv2_optimize_watermark_mask(mask01: np.ndarray) -> np.ndarray:
    """Host cv2 mirror of maskproc.optimize_watermark_mask (the device
    chain is cv2-parity-tested, tests/test_maskproc.py): open(3) →
    close(7)x3 → close(11)x2 → dilate(9)x2 → largest-component rule →
    Gaussian(3, 0.5) + re-threshold. Used here so the quality table does
    not need the long-compile vmapped CC graph on device — the numbers
    are the same pipeline by construction."""
    import cv2

    def k(n):
        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (n, n))

    x = (mask01 > 0.5).astype(np.uint8)
    x = cv2.morphologyEx(x, cv2.MORPH_OPEN, k(3), iterations=1)
    x = cv2.morphologyEx(x, cv2.MORPH_CLOSE, k(7), iterations=3)
    x = cv2.morphologyEx(x, cv2.MORPH_CLOSE, k(11), iterations=2)
    x = cv2.dilate(x, k(9), iterations=2)
    nl, labels, stats, _ = cv2.connectedComponentsWithStats(x, 8)
    if nl > 1:
        areas = stats[1:, cv2.CC_STAT_AREA]
        imax = 1 + int(np.argmax(areas))
        if areas[imax - 1] >= 500:
            x = (labels == imax).astype(np.uint8)
        else:
            x = np.isin(labels, [i for i, a in enumerate(areas, 1)
                                 if a > 200]).astype(np.uint8)
    x = cv2.GaussianBlur(x.astype(np.float32), (3, 3), 0.5)
    return (x > 0.5).astype(np.uint8)


def _cv2_optimize_watermark_mask_tight(mask01: np.ndarray) -> np.ndarray:
    """Host cv2 mirror of maskproc.optimize_watermark_mask_tight
    (PREDICT.MASK_MODE="tight"): open(3) → close(5) → dilate(3) →
    keep components with area > 64 → Gaussian(3, 0.5) + re-threshold.
    Parity with the device chain is tested in tests/test_maskproc.py."""
    import cv2

    def k(n):
        return cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (n, n))

    x = (mask01 > 0.5).astype(np.uint8)
    x = cv2.morphologyEx(x, cv2.MORPH_OPEN, k(3), iterations=1)
    x = cv2.morphologyEx(x, cv2.MORPH_CLOSE, k(5), iterations=1)
    x = cv2.dilate(x, k(3), iterations=1)
    nl, labels, stats, _ = cv2.connectedComponentsWithStats(x, 8)
    keep = [i for i in range(1, nl) if stats[i, cv2.CC_STAT_AREA] > 64]
    x = np.isin(labels, keep).astype(np.uint8)
    x = cv2.GaussianBlur(x.astype(np.float32), (3, 3), 0.5)
    return (x > 0.5).astype(np.uint8)


def eval_segmentation(root: str, limit: int, batch: int = 8,
                      weights: Optional[str] = None,
                      model_name: Optional[str] = None,
                      encoder: Optional[str] = None,
                      img_size: int = IMG_SIZE,
                      quant: bool = False) -> Dict:
    """Raw-network and pipeline mask quality for one seg checkpoint.
    With quant=True the forward runs the int8 PTQ tier (ops/quant.py)
    using the checkpoint's calibrated .quant.json sidecar — the quality
    qualification for the bench's int8 numbers."""
    import jax
    import jax.numpy as jnp

    from ..configs import get_cfg_defaults
    from ..models import create_model_from_config, init_model
    from ..ops.augment import IMAGENET_MEAN, IMAGENET_STD
    from ..utils.shipping import load_variables, resolve

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = img_size
    if model_name:
        cfg.MODEL.NAME = model_name
    if encoder:
        cfg.MODEL.ENCODER_NAME = encoder
    model = create_model_from_config(cfg)
    variables = init_model(model, img_size, seed=0)
    path = resolve("seg", cfg=cfg, explicit=weights)
    if not path or not os.path.exists(path):
        return {"error": f"no weights resolve for {cfg.MODEL.NAME}/"
                         f"{cfg.MODEL.ENCODER_NAME}"}
    variables = load_variables(path, variables)
    thr = cfg.PREDICT.THRESHOLD

    quant_scales = None
    if quant:
        from ..ops import quant as quant_ops
        from .calibrate_quant import quant_sidecar_path

        sidecar = quant_sidecar_path(path)
        if not os.path.exists(sidecar):
            return {"error": f"no calibration sidecar at {sidecar}"}
        quant_scales = quant_ops.load_scales(sidecar)

    def apply_model(norm):
        if quant_scales:
            from ..ops.quant import quant_int8
            with quant_int8(quant_scales):
                return model.apply(variables, norm, train=False)
        return model.apply(variables, norm, train=False)

    @jax.jit
    def fwd(x01):
        norm = (x01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        logits = apply_model(norm)
        probs = jax.nn.sigmoid(logits[..., 0])
        return (probs > thr).astype(jnp.float32)

    tp = fp = fn = 0.0
    tp_o = fp_o = fn_o = 0.0
    tp_t = fp_t = fn_t = 0.0
    buf_img, buf_msk = [], []

    def flush():
        nonlocal tp, fp, fn, tp_o, fp_o, fn_o, tp_t, fp_t, fn_t
        if not buf_img:
            return
        x = jnp.asarray(np.stack(buf_img), jnp.float32) / 255.0
        raw = np.asarray(fwd(x))
        opt = np.stack([_cv2_optimize_watermark_mask(r) for r in raw])
        tight = np.stack([_cv2_optimize_watermark_mask_tight(r)
                          for r in raw])
        gt = np.stack(buf_msk) > 127
        for pred, acc in ((raw > 0.5, "raw"), (opt > 0.5, "opt"),
                          (tight > 0.5, "tight")):
            t = float(np.sum(pred & gt))
            f_p = float(np.sum(pred & ~gt))
            f_n = float(np.sum(~pred & gt))
            if acc == "raw":
                tp, fp, fn = tp + t, fp + f_p, fn + f_n
            elif acc == "opt":
                tp_o, fp_o, fn_o = tp_o + t, fp_o + f_p, fn_o + f_n
            else:
                tp_t, fp_t, fn_t = tp_t + t, fp_t + f_p, fn_t + f_n
        buf_img.clear()
        buf_msk.clear()

    n = 0
    for _, wm, _, mk in _load_triads(root, limit, img_size):
        buf_img.append(wm)
        buf_msk.append(mk)
        n += 1
        if len(buf_img) == batch:
            flush()
    flush()

    def stats(t, f_p, f_n):
        iou = t / max(t + f_p + f_n, 1e-7)
        prec = t / max(t + f_p, 1e-7)
        rec = t / max(t + f_n, 1e-7)
        f1 = 2 * prec * rec / max(prec + rec, 1e-7)
        return {"iou": round(iou, 4), "f1": round(f1, 4),
                "precision": round(prec, 4), "recall": round(rec, 4)}

    return {"weights": path, "model": cfg.MODEL.NAME,
            "encoder": cfg.MODEL.ENCODER_NAME, "n_images": n,
            "quant": bool(quant_scales),
            "raw": stats(tp, fp, fn), "pipeline": stats(tp_o, fp_o, fn_o),
            "pipeline_tight": stats(tp_t, fp_t, fn_t)}


# ---------------------------------------------------------------------------
# inpaint + e2e eval
# ---------------------------------------------------------------------------

def eval_inpaint_engines(workdir: str, limit: int,
                         engines: List[str],
                         textured: bool = False) -> Dict:
    """Hole-quality per engine on the frozen clean images (the
    inpaint_quality protocol, pinned to this report's frozen corpus)."""
    from .inpaint_quality import evaluate_engines

    clean_src = os.path.join(workdir,
                             "clean_src_tex" if textured else "clean_src")
    return evaluate_engines(
        clean_src, engines, img_size=256, batch_size=8,
        limit=min(limit, 32),
        seed=TEX_CLEAN_SEED if textured else CLEAN_SEED)


def eval_e2e_repair(root: str, limit: int, batch: int = 16,
                    seg_weights: Optional[str] = None,
                    img_size: int = IMG_SIZE,
                    mask_mode: str = "parity") -> Dict:
    """Watermarked -> fused detect->optimize->inpaint -> PSNR to clean,
    for each available fill engine, vs the no-op floor. mask_mode
    selects the optimization chain (PREDICT.MASK_MODE) — on textured
    content the parity chain's over-coverage repaints clean texture, so
    the tight chain is measured alongside."""
    import jax.numpy as jnp

    from ..configs import get_cfg_defaults
    from ..inference.predict import WatermarkPredictor

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = img_size
    cfg.PREDICT.MASK_MODE = mask_mode
    predictor = WatermarkPredictor(model_path=seg_weights, config=cfg)

    names, wms, cls, mks = [], [], [], []
    for name, wm, cl, mk in _load_triads(root, limit, img_size):
        names.append(name)
        wms.append(wm)
        cls.append(cl)
        mks.append(mk)
    wm01 = np.stack(wms).astype(np.float32) / 255.0
    cl01 = np.stack(cls).astype(np.float32) / 255.0
    gt = (np.stack(mks) > 127).astype(np.float32)[..., None]

    out: Dict = {"n_images": len(names)}
    # no-op floor: how wrong the watermarked image already is
    out["floor"] = {
        "psnr_to_clean_db": _mean_psnr(wm01, cl01),
        "region_psnr_db": _mean_psnr(wm01, cl01, gt),
    }
    for engine in ("pushpull", "lama"):
        fused = predictor.make_fused_repair_fn(inpaint_engine=engine)
        rep = []
        for i in range(0, len(names), batch):
            rep.append(np.asarray(fused(jnp.asarray(wm01[i:i + batch]))))
        rep01 = np.concatenate(rep)
        out[engine] = {
            "engine_used": fused.engine_used,
            "psnr_to_clean_db": _mean_psnr(rep01, cl01),
            "region_psnr_db": _mean_psnr(rep01, cl01, gt),
        }
    return out


def _mean_psnr(a: np.ndarray, b: np.ndarray,
               region: Optional[np.ndarray] = None) -> float:
    if region is None:
        se = ((a - b) ** 2).mean(axis=(1, 2, 3))
    else:
        w = np.broadcast_to(region, a.shape)
        se = (((a - b) ** 2) * w).sum(axis=(1, 2, 3)) / np.maximum(
            w.sum(axis=(1, 2, 3)), 1.0)
    return round(float(np.mean(10.0 * np.log10(1.0 / np.maximum(
        se, 1e-10)))), 2)


# ---------------------------------------------------------------------------
# report
# ---------------------------------------------------------------------------

def build_report(workdir: str, limit: int = 64,
                 seg_configs: Optional[List[Dict]] = None,
                 img_size: int = IMG_SIZE,
                 tiers: Optional[List[str]] = None) -> Dict:
    if seg_configs is None:
        seg_configs = [
            {"model_name": "UnetPlusPlus", "encoder": "resnet34"},
            {"model_name": "Unet", "encoder": "resnet34"},
            # int8 PTQ tiers ride along automatically when a calibrated
            # sidecar ships next to the weights (scripts/calibrate_quant.py)
            {"model_name": "UnetPlusPlus", "encoder": "resnet34",
             "quant": True},
            {"model_name": "Unet", "encoder": "resnet34", "quant": True},
        ]
        # UnetTPU lane-aligned tier rows once its weights ship (round 5)
        from ..utils.shipping import weights_dir
        if os.path.exists(os.path.join(weights_dir(),
                                       "seg_unettpu_resnet34.npz")):
            seg_configs += [
                {"model_name": "UnetTPU", "encoder": "resnet34"},
                {"model_name": "UnetTPU", "encoder": "resnet34",
                 "quant": True},
            ]
    tiers = tiers or ["smooth", "textured"]
    report: Dict = {
        "protocol": {"clean_seed": CLEAN_SEED, "compose_seed": COMPOSE_SEED,
                     "tex_clean_seed": TEX_CLEAN_SEED,
                     "tex_compose_seed": TEX_COMPOSE_SEED,
                     "img_size": img_size, "n_images": limit,
                     "tiers": tiers},
    }
    from ..utils.shipping import resolve
    engines = ["pushpull", "lama"]
    if resolve("diffusion"):
        engines.append("diffusion")
    for tier in tiers:
        textured = tier == "textured"
        root = ensure_frozen_set(workdir, n=limit, img_size=img_size,
                                 textured=textured)
        tr: Dict = {"segmentation": {}}
        # int8 rows on BOTH tiers (round 5): with mixed-corpus weights
        # the PTQ qualification must hold the textured tier too — the
        # round-4 headline was only "quality-qualified" on smooth
        for sc in seg_configs:
            key = f"{sc['model_name'].lower()}_{sc['encoder']}"
            if sc.get("quant"):
                key += "_int8"
            logger.info("[%s] seg eval: %s", tier, key)
            res = eval_segmentation(
                root, limit, weights=sc.get("weights"),
                model_name=sc["model_name"], encoder=sc["encoder"],
                img_size=img_size, quant=sc.get("quant", False))
            if sc.get("quant") and "error" in res:
                logger.info("skipping %s: %s", key, res["error"])
                continue
            tr["segmentation"][key] = res
        logger.info("[%s] inpaint engine eval", tier)
        tr["inpaint"] = eval_inpaint_engines(workdir, limit, engines,
                                             textured=textured)
        logger.info("[%s] e2e repair eval", tier)
        tr["e2e_repair"] = eval_e2e_repair(root, limit, img_size=img_size)
        # tight-mode e2e on BOTH tiers (round 5): the pair of tables is
        # what qualifies PREDICT.MASK_MODE="auto"'s repair-path default
        logger.info("[%s] e2e repair eval (tight mask mode)", tier)
        tr["e2e_repair_tight"] = eval_e2e_repair(
            root, limit, img_size=img_size, mask_mode="tight")
        report[tier] = tr
    # backwards-compatible aliases (round-3 consumers read the flat keys)
    if "smooth" in report:
        report.update({k: report["smooth"][k]
                       for k in ("segmentation", "inpaint", "e2e_repair")})
    return report


def _render_tier(tier_report: Dict, heading_suffix: str = "") -> List[str]:
    lines: List[str] = []
    lines.append(f"### Segmentation (held-out masks){heading_suffix}")
    lines.append("")
    lines.append("| config | raw IoU | raw F1 | pipeline IoU | "
                 "tight IoU | tight recall | precision | recall |")
    lines.append("|---|---|---|---|---|---|---|---|")
    for key, s in tier_report["segmentation"].items():
        if "error" in s:
            lines.append(f"| {key} | — | — | — | — | — | — | — | "
                         f"({s['error']}) ")
            continue
        t = s.get("pipeline_tight")
        t_iou = f"{t['iou']:.3f}" if t else "—"
        t_rec = f"{t['recall']:.3f}" if t else "—"
        lines.append(
            f"| {key} | {s['raw']['iou']:.3f} | {s['raw']['f1']:.3f} | "
            f"{s['pipeline']['iou']:.3f} | {t_iou} | {t_rec} | "
            f"{s['raw']['precision']:.3f} | "
            f"{s['raw']['recall']:.3f} |")
    lines.append("")
    lines.append("### Inpainting (LaMa-protocol random holes, 256²)"
                 f"{heading_suffix}")
    lines.append("")
    lines.append("| engine | hole PSNR (dB) | SSIM |")
    lines.append("|---|---|---|")
    for k, v in tier_report["inpaint"].items():
        if not isinstance(v, dict):
            continue
        lines.append(f"| {k} | {v['hole_psnr_db']} | {v['ssim']} |")
    lines.append("")
    lines.append("### End-to-end repair (fused detect→optimize→inpaint)"
                 f"{heading_suffix}")
    lines.append("")
    lines.append("| path | PSNR to clean (dB) | watermark-region PSNR |")
    lines.append("|---|---|---|")
    e = tier_report["e2e_repair"]
    lines.append(f"| no-op floor (watermarked) | "
                 f"{e['floor']['psnr_to_clean_db']} | "
                 f"{e['floor']['region_psnr_db']} |")
    for k in ("pushpull", "lama"):
        v = e.get(k)
        if v:
            lines.append(f"| {k} [{v['engine_used']}] | "
                         f"{v['psnr_to_clean_db']} | {v['region_psnr_db']} |")
    et = tier_report.get("e2e_repair_tight")
    if et:
        for k in ("pushpull", "lama"):
            v = et.get(k)
            if v:
                lines.append(
                    f"| {k} [{v['engine_used']}], tight mask | "
                    f"{v['psnr_to_clean_db']} | {v['region_psnr_db']} |")
    return lines


def render_markdown(report: Dict) -> str:
    lines = []
    p = report["protocol"]
    lines.append(f"Protocol: {p['n_images']} held-out 512² triads per tier. "
                 f"Smooth tier seeds {p['clean_seed']}/{p['compose_seed']}; "
                 f"textured tier seeds {p.get('tex_clean_seed', '—')}/"
                 f"{p.get('tex_compose_seed', '—')} (all reserved; disjoint "
                 f"from every training seed).")
    lines.append("")
    if "smooth" in report:
        lines.append("## Smooth tier (round-1-3 protocol corpus)")
        lines.append("")
        lines.extend(_render_tier(report["smooth"]))
        if "textured" in report:
            lines.append("")
            lines.append("## Textured tier (natural-statistics corpus, "
                         "round 4)")
            lines.append("")
            lines.extend(_render_tier(report["textured"]))
    else:
        lines.extend(_render_tier(report))
    return "\n".join(lines)


AUTOGEN_BEGIN = "<!-- AUTOGEN:quality_report BEGIN -->"
AUTOGEN_END = "<!-- AUTOGEN:quality_report END -->"


def update_docs(report: Dict, docs_path: str) -> None:
    block = f"{AUTOGEN_BEGIN}\n{render_markdown(report)}\n{AUTOGEN_END}"
    if os.path.exists(docs_path):
        text = open(docs_path).read()
        if AUTOGEN_BEGIN in text:
            head = text.split(AUTOGEN_BEGIN)[0]
            tail = text.split(AUTOGEN_END)[-1]
            text = head + block + tail
        else:
            text += "\n" + block + "\n"
    else:
        text = ("# Quality record\n\nRegenerated per round by "
                "`python -m unet_watermark_tpu.scripts.quality_report "
                "--docs`.\n\n" + block + "\n")
    with open(docs_path, "w") as f:
        f.write(text)


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache

    logging.basicConfig(level=logging.INFO, force=True)
    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--workdir", default="workspace/quality")
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--img-size", type=int, default=IMG_SIZE)
    ap.add_argument("--docs", action="store_true",
                    help="refresh docs/QUALITY.md AUTOGEN block")
    ap.add_argument("--tiers", nargs="+", default=["smooth", "textured"],
                    choices=["smooth", "textured"])
    args = ap.parse_args(argv)
    report = build_report(args.workdir, args.limit,
                          img_size=args.img_size, tiers=args.tiers)
    os.makedirs(args.workdir, exist_ok=True)
    out = os.path.join(args.workdir, "quality_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))
    if args.docs:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        update_docs(report, os.path.join(repo, "docs", "QUALITY.md"))


if __name__ == "__main__":
    main()
