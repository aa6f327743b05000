from . import augment, components, inpaint, losses, metrics, morphology, quant

__all__ = ["augment", "components", "inpaint", "losses", "metrics",
           "morphology", "quant"]
