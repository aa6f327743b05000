from . import components, losses, metrics, morphology

__all__ = ["components", "losses", "metrics", "morphology"]
