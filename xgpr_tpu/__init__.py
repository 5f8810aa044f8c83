"""xgpr_tpu: a TPU-native approximate Gaussian-process engine.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
jlparkI/xGPR: SORF random-feature kernels (fixed-vector, sequence and graph
convolution), preconditioned-CG fitting, randomized-Nystrom preconditioners
and NMLL-based hyperparameter tuning -- designed for SPMD execution over TPU
meshes rather than ported from the reference's CPU/CUDA code.
"""
__version__ = "0.1.0"

from .kernels import KERNEL_NAME_TO_CLASS

__all__ = ["KERNEL_NAME_TO_CLASS"]


def __getattr__(name):
    # Lazy imports keep `import xgpr_tpu` cheap and avoid circular imports
    # while the package is under construction.
    if name in ("GPRegression", "xGPRegression"):
        from .models.regression import GPRegression
        return GPRegression
    if name in ("GPClassification", "xGPClassification"):
        from .models.classification import GPClassification
        return GPClassification
    if name == "KernelFGen":
        from .models.kernel_fgen import KernelFGen
        return KernelFGen
    if name == "FastConv1d":
        from .models.static_layers import FastConv1d
        return FastConv1d
    if name in ("build_regression_dataset", "build_classification_dataset",
                "build_offline_np_dataset"):
        from .data import builders
        return getattr(builders, name)
    if name == "DatasetBaseclass":
        from .data.dataset import DatasetBaseclass
        return DatasetBaseclass
    if name in ("KernelPCA", "KernelKMeans"):
        from .models import clustering
        return getattr(clustering, name)
    if name in ("save_model", "load_model"):
        from .models import serialization
        return getattr(serialization, name)
    raise AttributeError(f"module 'xgpr_tpu' has no attribute {name!r}")
