from . import augment, components, inpaint, losses, metrics, morphology

__all__ = ["augment", "components", "inpaint", "losses", "metrics",
           "morphology"]
