from .pipeline import FeatureJobSpec, build, run

__all__ = ["FeatureJobSpec", "build", "run"]
