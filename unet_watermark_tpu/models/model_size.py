"""Model size reporting — analog of
/root/reference/src/models/{check_model_size,compare_model_sizes}.py.

Parameter counts + fp32/bf16 size estimates per architecture/encoder, with
a sweep mode comparing combinations (compare_model_sizes.py:9 analog)."""
from __future__ import annotations

import argparse
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def get_model_size(model_name: str = "UnetPlusPlus",
                   encoder_name: str = "resnet34",
                   decoder_channels: Sequence[int] = (256, 128, 64, 32, 16),
                   img_size: int = 64) -> Dict:
    """Param count + size; img_size only affects init cost, not params."""
    from .factory import SMPModelFactory, count_parameters, init_model

    model = SMPModelFactory.create_model(
        model_name=model_name, encoder_name=encoder_name,
        decoder_channels=decoder_channels, dtype=jnp.float32)
    variables = init_model(model, img_size)
    params = count_parameters(variables)
    return {
        "model": model_name,
        "encoder": encoder_name,
        "parameters": params,
        "fp32_mb": params * 4 / 1e6,
        "bf16_mb": params * 2 / 1e6,
    }


def compare_model_sizes(models: Optional[Sequence[str]] = None,
                        encoders: Optional[Sequence[str]] = None,
                        img_size: int = 64,
                        print_table: bool = True) -> List[Dict]:
    models = list(models or ["Unet", "UnetPlusPlus", "FPN", "Linknet"])
    encoders = list(encoders or ["resnet18", "resnet34", "resnet50",
                                 "efficientnet-b0", "efficientnet-b3"])
    rows = []
    for m in models:
        for e in encoders:
            try:
                rows.append(get_model_size(m, e, img_size=img_size))
            except Exception as ex:  # noqa: BLE001
                rows.append({"model": m, "encoder": e, "error": str(ex)})
    if print_table:
        print(f"{'model':<16}{'encoder':<18}{'params':>12}{'fp32 MB':>10}")
        print("-" * 56)
        for r in rows:
            if "error" in r:
                print(f"{r['model']:<16}{r['encoder']:<18}  error")
            else:
                print(f"{r['model']:<16}{r['encoder']:<18}"
                      f"{r['parameters']:>12,}{r['fp32_mb']:>10.1f}")
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description="model size tools")
    p.add_argument("--model", default=None)
    p.add_argument("--encoder", default=None)
    p.add_argument("--sweep", action="store_true")
    args = p.parse_args(argv)
    if args.sweep:
        compare_model_sizes()
    else:
        print(get_model_size(args.model or "UnetPlusPlus",
                             args.encoder or "resnet34"))


if __name__ == "__main__":
    main()
