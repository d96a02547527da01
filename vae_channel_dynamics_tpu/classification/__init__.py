from .classifier import RegionClassifier
